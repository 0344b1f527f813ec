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
        tmp = f"{path}.tmp-{os.getpid()}"
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


DEFAULT_STORE = LocalStateStore()
