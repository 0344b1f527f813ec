"""Pluggable storage for small state files (KB-sized, metadata-class).

Three pieces of engine state live OUTSIDE lake-table commits: the replay
checkpoint (plans/checkpoint.py), the stream's per-segment ledger
(streaming/stream.py), and the export watermark (plans/export.py). At the
100 TB design point these live on HDFS/S3, not a driver-local disk — the
same portability problem the commit got solved by ``lake.catalog``. This
module is the equivalent seam for plain state files: the engine talks to a
``StateStore``; only the store implementation changes per deployment.

The interface is deliberately tiny and object-store-honest:

- ``write_text`` is an atomic whole-file replace (tmp+fsync+rename on
  POSIX; a single PUT on an object store — both are all-or-nothing).
- ``append_line``/``read_lines`` model an append-only record log. POSIX
  appends with fsync; an object store CANNOT append, so a production S3
  store writes one object per record under the path as a prefix and
  lists it back in order — which is why the interface speaks in records,
  not byte offsets, and why readers must tolerate per-record granularity.

``LocalStateStore`` (default) preserves the engine's existing on-disk
layout byte-for-byte. ``MemoryStateStore`` is the test stub proving the
engine never touches the filesystem behind the seam's back.

Reference analogue: DBImport keeps all of this state in its MySQL config
database (configSchema.py:686-766 watermark columns,
export_operations.py:1058-1079 export watermarks); the seam plays the
config-database role without requiring one.
"""

from __future__ import annotations

import os
import threading


class StateStore:
    def read_text(self, path: str) -> str | None:
        """Whole-file read; None when the path does not exist."""
        raise NotImplementedError

    def write_text(self, path: str, text: str) -> None:
        """Atomic whole-file replace, durable before returning."""
        raise NotImplementedError

    def append_line(self, path: str, line: str) -> None:
        """Durably append one record (newline-terminated)."""
        raise NotImplementedError

    def read_lines(self, path: str) -> list[str]:
        """All appended records, in append order; [] when absent."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        """Remove the path; no-op when absent."""
        raise NotImplementedError


class LocalStateStore(StateStore):
    """POSIX files — the default, byte-compatible with the engine's
    historical on-disk state layout."""

    def read_text(self, path: str) -> str | None:
        if not os.path.isfile(path):
            return None
        with open(path) as fh:
            return fh.read()

    def write_text(self, path: str, text: str) -> None:
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        # pid AND thread id: two threads of one driver writing the same
        # path must not interleave into one tmp and publish garbage
        import threading

        tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}"
        with open(tmp, "w") as fh:
            fh.write(text)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)

    def append_line(self, path: str, line: str) -> None:
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(path, "a") as fh:
            fh.write(line.rstrip("\n") + "\n")
            fh.flush()
            os.fsync(fh.fileno())

    def read_lines(self, path: str) -> list[str]:
        if not os.path.isfile(path):
            return []
        with open(path) as fh:
            return [ln.rstrip("\n") for ln in fh if ln.strip()]

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass


class MemoryStateStore(StateStore):
    """Dict-backed stub (thread-safe) modeling an object store: whole-value
    puts, per-record appends as separate entries, no filesystem."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._blobs: dict[str, str] = {}
        self._logs: dict[str, list[str]] = {}

    def read_text(self, path: str) -> str | None:
        with self._lock:
            return self._blobs.get(path)

    def write_text(self, path: str, text: str) -> None:
        with self._lock:
            self._blobs[path] = text

    def append_line(self, path: str, line: str) -> None:
        with self._lock:
            self._logs.setdefault(path, []).append(line.rstrip("\n"))

    def read_lines(self, path: str) -> list[str]:
        with self._lock:
            return list(self._logs.get(path, []))

    def exists(self, path: str) -> bool:
        with self._lock:
            return path in self._blobs or path in self._logs

    def delete(self, path: str) -> None:
        with self._lock:
            self._blobs.pop(path, None)
            self._logs.pop(path, None)


class ObjectStateStore(StateStore):
    """Object-store-shaped implementation, emulated over a local prefix
    directory — the production S3/GCS layout the module docstring designs,
    with every operation restricted to what an object store can actually
    do (whole-object PUT/GET/DELETE and ordered LIST of a prefix; never
    append, never partial read):

    - a blob path maps to one object (``<root>/<path>/_object``); a
      ``write_text`` is one whole-object PUT (the local ``os.replace``
      stands in for the PUT's all-or-nothing visibility);
    - ``append_line`` PUTs ONE NEW OBJECT PER RECORD under the path as a
      prefix (``<path>/records/<seq>-<uniq>``), because object stores
      cannot append. The sequence number is zero-padded so the reader's
      ordered LIST (lexicographic, exactly S3 ``list_objects_v2``
      semantics) returns records in append order; the uniq suffix keeps
      two writers at the same seq from overwriting each other (both
      records survive, order between them is arbitrary — the same
      guarantee two un-coordinated S3 appenders would get);
    - ``read_lines`` is LIST + one GET per record — which is why the
      StateStore interface speaks in records, not byte offsets.

    Swap the two private ``_put``/``_list`` helpers for boto3 calls and
    this class runs unchanged against S3; nothing else in the engine
    knows the difference. Reference analogue: DBImport's MySQL config
    database plays this role (configSchema.py:686-766); the seam plays it
    without requiring one.
    """

    def __init__(self, root: str) -> None:
        self.root = root
        # per-record-prefix next-sequence cache (see append_line)
        self._next_seq: dict[str, int] = {}

    # -- object primitives (the boto3 seam) ---------------------------------

    def _obj(self, path: str) -> str:
        # logical paths are absolute POSIX-ish strings; key them under the
        # store root the way an S3 key would be (no meaning attached to
        # the local directory layout beyond prefix-listing)
        return os.path.join(self.root, path.lstrip("/"))

    def _put(self, key: str, text: str) -> None:
        os.makedirs(os.path.dirname(key), exist_ok=True)
        tmp = f"{key}.tmp-{os.getpid()}-{threading.get_ident()}"
        with open(tmp, "w") as fh:
            fh.write(text)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, key)  # local stand-in for atomic PUT visibility

    def _get(self, key: str) -> str | None:
        if not os.path.isfile(key):
            return None
        with open(key) as fh:
            return fh.read()

    def _list(self, prefix_dir: str) -> list[str]:
        if not os.path.isdir(prefix_dir):
            return []
        # in-flight temp files are NOT objects: an S3 PUT is invisible
        # until complete, so the emulation's LIST must never surface a
        # half-written local file (a reader racing _put, or the orphan a
        # crash mid-PUT leaves behind — on real S3 an aborted PUT leaves
        # nothing; here the orphan stays on disk but stays invisible)
        return sorted(
            n
            for n in os.listdir(prefix_dir)
            if not n.endswith("_object") and ".tmp-" not in n
        )

    # -- StateStore interface ------------------------------------------------

    def read_text(self, path: str) -> str | None:
        return self._get(os.path.join(self._obj(path), "_object"))

    def write_text(self, path: str, text: str) -> None:
        self._put(os.path.join(self._obj(path), "_object"), text)

    def append_line(self, path: str, line: str) -> None:
        rec_dir = os.path.join(self._obj(path), "records")
        # next sequence = LIST + 1 (what an S3 appender does), with the
        # last-issued seq cached per path after the first LIST: the
        # ledger is single-writer by its own contract, so appends are
        # O(1) instead of a full prefix LIST each (O(n^2) over a
        # stream's lifetime). The uniq suffix still makes a same-seq
        # race (two writers violating the contract) lose no records.
        seq = self._next_seq.get(rec_dir)
        if seq is None:
            existing = self._list(rec_dir)
            seq = (
                int(existing[-1].split("-", 1)[0]) + 1 if existing else 0
            )
        import uuid

        name = f"{seq:020d}-{uuid.uuid4().hex[:8]}"
        self._put(os.path.join(rec_dir, name), line.rstrip("\n"))
        self._next_seq[rec_dir] = seq + 1

    def read_lines(self, path: str) -> list[str]:
        rec_dir = os.path.join(self._obj(path), "records")
        out = []
        for name in self._list(rec_dir):
            text = self._get(os.path.join(rec_dir, name))
            if text is not None and text.strip():
                out.append(text.rstrip("\n"))
        return out

    def exists(self, path: str) -> bool:
        base = self._obj(path)
        return os.path.isfile(os.path.join(base, "_object")) or bool(
            self._list(os.path.join(base, "records"))
        )

    def delete(self, path: str) -> None:
        # an object store deletes by key; a "path" here owns at most the
        # blob object and its record prefix — delete both
        import shutil

        base = self._obj(path)
        shutil.rmtree(base, ignore_errors=True)


DEFAULT_STORE = LocalStateStore()
