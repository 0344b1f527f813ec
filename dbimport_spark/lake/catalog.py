"""Commit arbitration for the lake format: who wins snapshot version N.

Everything else in the table format is storage-agnostic (immutable data
files, immutable metadata JSONs, advisory version hint) — only ONE
decision needs an atomic primitive: "am I the writer that publishes
version N?". This module isolates that decision behind ``Catalog`` so the
format survives the move from POSIX to an object store:

- ``FileCatalog`` (default): O_CREAT|O_EXCL on the snapshot file — the
  exclusive create either fully succeeds or fully fails, giving a
  single-writer lock on POSIX/HDFS/NFS-v4 filesystems.
- ``CASCatalog``: a compare-and-swap on the table's current-version
  pointer, the shape an S3/GCS deployment uses because object stores have
  no exclusive create — the reference gets the same guarantee from the
  Hive metastore / Iceberg catalog (import_operations.py:1117-1146). Here
  the CAS is an in-process pointer table (test stub); a production
  implementation would point at DynamoDB/ZooKeeper/a REST catalog, and
  ONLY this class changes. The metadata file write itself needs no
  atomicity: the CAS has already arbitrated the winner, and the pointer is
  only advanced after the file is durably written, so readers never see a
  version the pointer advertises but the store lacks.

A losing writer always surfaces as ``CommitConflict`` before any of its
metadata becomes visible — its data files are orphans the caller/GC
removes — so a lost race can never produce partial table state.
"""

from __future__ import annotations

import json
import os
import threading


class CommitConflict(Exception):
    """Another writer committed this version first."""


class Catalog:
    def commit_version(self, meta_dir: str, version: int, payload: dict) -> None:
        """Durably publish snapshot ``version`` (file ``v{version}.json``
        under ``meta_dir``), all-or-nothing. Raises ``CommitConflict`` if
        another writer already owns this version; on conflict NOTHING of
        this writer's metadata may be visible."""
        raise NotImplementedError

    @staticmethod
    def _meta_path(meta_dir: str, version: int) -> str:
        return os.path.join(meta_dir, f"v{version}.json")

    @staticmethod
    def _fsync_dir(path: str) -> None:
        fd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)


class FileCatalog(Catalog):
    """Exclusive-create arbitration (POSIX/HDFS). Stateless — every
    LakeTable may share the module default instance."""

    def commit_version(self, meta_dir: str, version: int, payload: dict) -> None:
        path = self._meta_path(meta_dir, version)
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
        except FileExistsError as e:
            raise CommitConflict(f"version v{version} already committed") from e
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump(payload, fh)
                fh.flush()
                os.fsync(fh.fileno())
        except BaseException:
            os.unlink(path)
            raise
        # make the commit durable before the caller advertises it
        self._fsync_dir(meta_dir)


class CASCatalog(Catalog):
    """Compare-and-swap arbitration (object-store shape).

    Holds a per-table current-version pointer; ``commit_version`` atomically
    checks ``pointer == version - 1`` and advances it. The check happens
    BEFORE any write, so a losing writer leaves zero metadata behind. A
    table first seen mid-life initializes its pointer from the metadata
    already on disk (a real catalog would already know the table).
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._versions: dict[str, int] = {}

    def _disk_version(self, meta_dir: str) -> int:
        latest = -1
        if os.path.isdir(meta_dir):
            for name in os.listdir(meta_dir):
                if name.startswith("v") and name.endswith(".json"):
                    latest = max(latest, int(name[1:-5]))
        return latest

    def commit_version(self, meta_dir: str, version: int, payload: dict) -> None:
        key = os.path.abspath(meta_dir)
        with self._lock:
            cur = self._versions.get(key)
            if cur is None:
                cur = self._disk_version(meta_dir)
            if version != cur + 1:
                raise CommitConflict(
                    f"CAS failed: expected current v{version - 1}, found v{cur}"
                )
            # winner decided; write (tmp+rename keeps concurrent READERS off
            # a half-written file — no exclusivity needed, we already won)
            path = self._meta_path(meta_dir, version)
            tmp = path + f".tmp-{os.getpid()}-{threading.get_ident()}"
            with open(tmp, "w") as fh:
                json.dump(payload, fh)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, path)
            self._fsync_dir(meta_dir)
            # advance the pointer only after the file is durable
            self._versions[key] = version
