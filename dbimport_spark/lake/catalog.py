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

    @staticmethod
    def _disk_version(meta_dir: str) -> int:
        """Highest committed version already on disk, -1 for none — used to
        adopt a table the catalog is seeing for the first time mid-life."""
        latest = -1
        if os.path.isdir(meta_dir):
            for name in os.listdir(meta_dir):
                if name.startswith("v") and name.endswith(".json"):
                    try:
                        latest = max(latest, int(name[1:-5]))
                    except ValueError:
                        continue  # stray file; fsck reports it
        return latest


class FileCatalog(Catalog):
    """Exclusive-create arbitration (POSIX/HDFS). Stateless — every
    LakeTable may share the module default instance."""

    def commit_version(self, meta_dir: str, version: int, payload: dict) -> None:
        # write-then-link, not write-in-place: vN.json must NEVER exist
        # half-written. A reader's forward probe (LakeTable.current)
        # adopts vN.json the instant it appears, and a SIGKILL mid-dump
        # of an in-place write would leave a durable truncated vN.json
        # that wedges every later read AND every later commit. The tmp
        # carries the full fsynced bytes; os.link publishes them
        # atomically and keeps O_EXCL's arbitration (EEXIST = lost race).
        path = self._meta_path(meta_dir, version)
        tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}"
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError as e:
            raise CommitConflict(f"version v{version} already committed") from e
        finally:
            os.unlink(tmp)
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

    def commit_version(self, meta_dir: str, version: int, payload: dict) -> None:
        key = os.path.abspath(meta_dir)
        with self._lock:
            # Pointer first; reconcile against disk when (a) the catalog
            # has never seen this table, (b) the CAS would fail, or (c)
            # the CAS would SUCCEED but the target version already exists
            # durably — the stale-pointer crash window (exception after
            # the metadata rename, before the pointer advance): without
            # (c) a second writer would satisfy the CAS and CLOBBER the
            # dead writer's published, possibly already-read snapshot.
            # Happy path cost: one existence stat (HEAD on an object
            # store), never a per-commit LIST.
            cur = self._versions.get(key)
            if (
                cur is None
                or version != cur + 1
                or os.path.exists(self._meta_path(meta_dir, version))
            ):
                cur = max(
                    cur if cur is not None else -1,
                    self._disk_version(meta_dir),
                )
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


class SqliteCatalog(Catalog):
    """Durable cross-process CAS arbitration (sqlite-backed pointer).

    The production shape of ``CASCatalog``: the per-table current-version
    pointer lives in a sqlite database (WAL journal, synchronous=FULL), so
    it survives process death and arbitrates across OS processes — sqlite
    serializes writers with a database write lock (``BEGIN IMMEDIATE``),
    the same role the reference's metastore/catalog plays for Iceberg
    commits (import_operations.py:1117-1146). Swapping this class for a
    DynamoDB/ZooKeeper/REST-catalog client is the only change an
    object-store deployment needs.

    Commit protocol, all under the database write lock:

    1. CAS check: pointer (or, for a table the catalog first sees
       mid-life, the highest version on disk) must equal ``version - 1``;
       otherwise ``CommitConflict`` with ZERO writes — a losing writer
       leaves nothing behind but its orphaned data files, which
       ``maintenance.remove_orphan_files`` sweeps.
    2. Write the metadata file durably (tmp + fsync + rename + dir fsync)
       — all-or-nothing for readers, who resolve the current version from
       the metadata files themselves.
    3. Advance the pointer and commit the transaction.

    Crash windows: dying before (2) completes leaves the pointer
    unchanged and at most a ``.tmp-*`` turd (never a visible version);
    dying between (2) and (3) leaves durable, complete metadata one ahead
    of the pointer — the CAS check bases itself on max(pointer, disk), so
    the next committer ADOPTS the dead writer's published version (it is
    fsynced and all-or-nothing, hence as committed as any other) and
    continues the chain. Partial state is impossible in every window, and
    a stale pointer can never wedge the table.

    ``db_path=None`` (default) keeps one database per table inside its
    metadata dir (``<meta_dir>/catalog.db`` — the ``v*.json`` listing
    ignores it); pass a shared path to arbitrate a whole deployment's
    tables from one catalog database.
    """

    def __init__(self, db_path: str | None = None, busy_timeout_s: float = 180.0):
        # 180s default: the lock is held across an fsync-heavy metadata
        # write, and on a box whose disks are saturated (e.g. a full test
        # suite plus a bench run) 30s busy waits have been observed to
        # expire — turning a clean CommitConflict loss into a spurious
        # OperationalError. A waiter that outlasts the stall costs nothing
        # when the box is idle.
        self.db_path = db_path
        self.busy_timeout_s = busy_timeout_s

    def _connect(self, db_path: str):
        import sqlite3

        con = sqlite3.connect(db_path, timeout=self.busy_timeout_s)
        con.execute("PRAGMA journal_mode=WAL")
        con.execute("PRAGMA synchronous=FULL")
        con.execute(
            "CREATE TABLE IF NOT EXISTS table_pointer ("
            "  key TEXT PRIMARY KEY,"
            "  version INTEGER NOT NULL)"
        )
        con.commit()
        return con

    def commit_version(self, meta_dir: str, version: int, payload: dict) -> None:
        key = os.path.abspath(meta_dir)
        db_path = self.db_path or os.path.join(meta_dir, "catalog.db")
        con = self._connect(db_path)
        try:
            con.execute("BEGIN IMMEDIATE")  # database write lock: one committer
            row = con.execute(
                "SELECT version FROM table_pointer WHERE key = ?", (key,)
            ).fetchone()
            # the CAS base is max(pointer, disk): a writer that died between
            # the metadata rename and the pointer advance leaves the pointer
            # ONE BEHIND durable on-disk metadata — readers (and the next
            # committer's expected_version) resolve from disk, so trusting
            # the stale pointer alone would refuse every future commit
            # forever. The dead writer's vN.json is complete and fsynced
            # (all-or-nothing), so adopting it is correct, same as the
            # mid-life adoption case.
            cur = max(
                row[0] if row is not None else -1,
                self._disk_version(meta_dir),
            )
            if version != cur + 1:
                raise CommitConflict(
                    f"CAS failed: expected current v{version - 1}, found v{cur}"
                )
            path = self._meta_path(meta_dir, version)
            tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}"
            with open(tmp, "w") as fh:
                json.dump(payload, fh)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, path)
            self._fsync_dir(meta_dir)
            con.execute(
                "INSERT INTO table_pointer(key, version) VALUES(?, ?) "
                "ON CONFLICT(key) DO UPDATE SET version = excluded.version",
                (key, version),
            )
            con.commit()
        except BaseException:
            try:
                con.rollback()
            except Exception:
                pass
            raise
        finally:
            con.close()
