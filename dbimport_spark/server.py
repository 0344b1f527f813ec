"""Read-only monitoring HTTP server over the table registry.

Reference parity: ``bin/Server/restServer.py`` exposes the config
database and operational status over REST (``GET /status``
restServer.py:231, connection/table listings 366-632, plus OAuth2 and
config CRUD). This analogue is deliberately READ-ONLY and auth-free:
every mutation goes through the CLI/API where it is validated and
CAS-arbitrated by the table commit, so the server never needs write
credentials; what operators actually poll — status, config, lag — is
served from committed metadata alone. Built on stdlib ``http.server``
(no web framework in the sandbox, and none needed for GETs); the lag
module is explicitly designed for this kind of polling (plans/lag.py).

Endpoints (all JSON):

- ``GET /status`` — server + registry summary (table count, enabled
  count, registry path)
- ``GET /tables`` — registry entries as stored (the config database
  read, reference ``/import/table``)
- ``GET /tables/<name>`` — entry config + live table metadata
  (version, committed watermark, file/byte totals, properties)
- ``GET /tables/<name>/lineage`` — per-commit lineage records
- ``GET /lag`` — follower lag/freshness over the whole registry
  (source-vs-log, mirror/view/export/history-vs-source)
- ``GET /lag/<name>`` — one table's lag record
- ``GET /sync-points`` — named cross-table freezes
- ``GET /metrics`` — the same health surface as Prometheus text
  exposition (watermarks, rows/bytes, log + follower lag, quarantine
  depth) for scrape-based monitoring; per-table failure isolation via
  ``dbimport_table_scrape_error``

No Spark session exists in this process — every handler reads snapshot
JSON / parquet footers / state JSON, so the server runs safely beside
any number of jobs at any table size.
"""

from __future__ import annotations

import json
from dataclasses import asdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote, urlparse

from dbimport_spark.plans.registry import TableRegistry

__all__ = ["make_server", "serve"]


_REDACTED = "***redacted***"


def _redact_entry(rec: dict) -> dict:
    """The registry holds secrets (the anonymization salt; JDBC URLs and
    properties, which is where user/password live). The reference server
    sits behind OAuth2; this one is auth-free BECAUSE it never serves a
    credential — redaction here is what makes 'read-only so no auth' an
    honest trade."""
    if rec.get("anonymize_salt"):
        rec["anonymize_salt"] = _REDACTED
    for x in rec.get("cdc_exports") or []:
        if x.get("url"):
            x["url"] = _REDACTED
        if x.get("properties"):
            x["properties"] = _REDACTED
    return rec


def _table_status(entry) -> dict:
    from dbimport_spark.lake.table import LakeTable
    from dbimport_spark.plans.lineage import table_totals

    table = LakeTable.load(entry.table_root)
    out = table_totals(table)
    out["properties"] = dict(table.current().properties)
    return out


def _quarantine_status(entry) -> dict:
    """Dead-letter inventory for one table, Spark-free: parked windows
    (row counts from parquet footers) plus the drained-archive count —
    the fleet operator's 'is anything stuck in quarantine' probe."""
    import os

    from dbimport_spark.plans.engine import list_quarantine_dir

    qdir = entry.quarantine_dir
    if not qdir:
        return {"configured": False, "parked": [], "drained_windows": 0}
    parked = list_quarantine_dir(qdir)
    for rec in parked:
        rows = 0
        d = os.path.join(qdir, rec["dir"])
        try:
            import pyarrow.parquet as pq

            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    rows += pq.ParquetFile(
                        os.path.join(d, f)
                    ).metadata.num_rows
            rec["rows"] = rows
        except Exception:
            rec["rows"] = None  # unreadable footer: parked-but-unsized
    drained = (
        sum(
            1
            for n in os.listdir(qdir)
            if n.startswith("drained-batch-")
        )
        if os.path.isdir(qdir)
        else 0
    )
    return {"configured": True, "parked": parked, "drained_windows": drained}


def _routes(registry: TableRegistry):
    """path-prefix routing table: callable(parts) -> (code, payload)."""

    def status(_):
        entries = registry.load()
        return 200, {
            "status": "ok",
            "registry": registry.path,
            "tables": len(entries),
            "enabled": sum(1 for e in entries.values() if e.enabled),
        }

    def tables(parts):
        entries = registry.load()
        if not parts:
            return 200, {
                n: _redact_entry(asdict(e)) for n, e in sorted(entries.items())
            }
        name = parts[0]
        if name not in entries:
            return 404, {"error": f"not registered: {name}"}
        e = entries[name]
        if len(parts) == 1:
            return 200, {"entry": _redact_entry(asdict(e)),
                         "table": _table_status(e)}
        if parts[1] == "lineage":
            from dbimport_spark.lake.table import LakeTable
            from dbimport_spark.plans.lineage import lineage_history

            return 200, list(lineage_history(LakeTable.load(e.table_root)))
        if parts[1] == "quarantine":
            return 200, _quarantine_status(e)
        return 404, {"error": f"unknown subresource: {parts[1]}"}

    def lag(parts):
        from dbimport_spark.plans.lag import follower_lag

        # do_GET already unquoted the segments; follower_lag raises
        # KeyError for unknown names itself (no second registry read,
        # no TOCTOU window against concurrent registry edits)
        only = [parts[0]] if parts else None
        try:
            report = follower_lag(registry, only=only)
        except KeyError as exc:
            return 404, {"error": str(exc)}
        return 200, report[only[0]] if only else report

    def syncpoints(_):
        from dbimport_spark.plans.registry import sync_points

        return 200, sync_points(registry)

    def metrics(_):
        return 200, _prometheus_metrics(registry)

    return {
        "status": status,
        "tables": tables,
        "lag": lag,
        "sync-points": syncpoints,
        "metrics": metrics,
    }


def _prom_label(v: str) -> str:
    return str(v).replace("\\", r"\\").replace('"', r"\"").replace("\n", r"\n")


def _prometheus_metrics(registry: TableRegistry) -> str:
    """``GET /metrics`` — the fleet's health as Prometheus text
    exposition (the pull-model twin of the push-style stats sink; the
    reference ships per-import statistics to external monitoring via
    Kafka/REST, import_stage.py:592-826). Spark-free like every other
    endpoint: snapshot JSON + parquet footers + state JSON only. One
    table failing to load must not blank the whole scrape — it reports
    ``dbimport_table_scrape_error`` and the rest keep their series."""
    from dbimport_spark.plans.lag import follower_lag

    lines: list[str] = []

    def emit(name: str, labels: dict, value) -> None:
        if value is None:
            return
        lab = ",".join(
            f'{k}="{_prom_label(v)}"' for k, v in labels.items()
        )
        lines.append(f"dbimport_{name}{{{lab}}} {value}")

    def head(name: str, help_: str, typ: str = "gauge") -> None:
        lines.append(f"# HELP dbimport_{name} {help_}")
        lines.append(f"# TYPE dbimport_{name} {typ}")

    entries = registry.load()
    head("table_enabled", "1 when the registry entry is enabled")
    head("table_version", "committed snapshot version")
    head("table_watermark_lsn", "committed change-log watermark")
    head("table_rows", "live rows from file metadata")
    head("table_bytes", "data bytes from file metadata")
    head("table_files", "data file count")
    head("log_lsn_behind", "log tail LSN minus committed watermark")
    head("quarantine_parked_rows", "dead-letter rows awaiting a drain")
    head("quarantine_parked_windows", "parked windows awaiting a drain")
    head("quarantine_drained_windows", "archived (drained) windows")
    head(
        "follower_versions_behind",
        "source versions a follower has not applied (labels: kind, root)",
    )
    head("follower_lsn_behind", "source LSNs a follower has not applied")
    head(
        "follower_seconds_behind",
        "commit-time age of the follower's applied version",
    )
    head("table_scrape_error", "1 when this table failed to load")
    for name, e in sorted(entries.items()):
        lab = {"table": name}
        try:
            t = _table_status(e)
            emit("table_enabled", lab, int(e.enabled))
            emit("table_version", lab, t["version"])
            emit("table_watermark_lsn", lab, t["last_lsn"])
            emit("table_rows", lab, t["rows"])
            emit("table_bytes", lab, t["bytes"])
            emit("table_files", lab, t["files"])
            q = _quarantine_status(e)
            if q.get("configured"):
                # an unreadable footer sizes its window as None: count it
                # in parked_windows (visible) but not in parked_rows
                emit(
                    "quarantine_parked_rows", lab,
                    sum(r.get("rows") or 0 for r in q["parked"]),
                )
                emit("quarantine_parked_windows", lab, len(q["parked"]))
                emit("quarantine_drained_windows", lab, q["drained_windows"])
            # one follower_lag call carries the source lag too — the log
            # footer scan (source_lag) runs once per table per scrape,
            # and the preloaded entries skip N registry re-reads
            rec = follower_lag(registry, only=[name], entries=entries)[name]
            emit("log_lsn_behind", lab, rec["source"].get("log_lsn_behind"))
            for f in rec["followers"]:
                flab = {"table": name, "kind": f["kind"]}
                if f.get("root"):
                    flab["root"] = f["root"]
                if f.get("target"):  # cdc_export: the TABLE name only
                    flab["target"] = f["target"]  # (URL is a credential)
                emit(
                    "follower_versions_behind", flab,
                    f.get("versions_behind"),
                )
                emit("follower_lsn_behind", flab, f.get("lsn_behind"))
                emit(
                    "follower_seconds_behind", flab,
                    f.get("seconds_behind"),
                )
        except Exception:
            emit("table_scrape_error", lab, 1)
    return "\n".join(lines) + "\n"


class _Handler(BaseHTTPRequestHandler):
    # set by make_server
    routes: dict = {}
    quiet: bool = True

    def log_message(self, fmt, *args):  # stdlib logs to stderr per request
        if not self.quiet:
            super().log_message(fmt, *args)

    def do_GET(self):  # noqa: N802 (stdlib handler name)
        parts = [p for p in urlparse(self.path).path.split("/") if p]
        handler = self.routes.get(parts[0]) if parts else None
        if handler is None:
            code, payload = 404, {
                "error": "unknown endpoint",
                "endpoints": sorted(f"/{k}" for k in self.routes),
            }
        else:
            try:
                code, payload = handler([unquote(p) for p in parts[1:]])
            except Exception as exc:  # surface, never crash the server
                code = 500
                payload = {"error": f"{type(exc).__name__}: {exc}"}
        if isinstance(payload, str):
            # Prometheus text exposition (the /metrics endpoint)
            body = payload.encode()
            ctype = "text/plain; version=0.0.4; charset=utf-8"
        else:
            body = json.dumps(payload, indent=2, default=str).encode()
            ctype = "application/json"
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def make_server(
    registry_path: str, host: str = "127.0.0.1", port: int = 0,
    store=None, quiet: bool = True,
) -> ThreadingHTTPServer:
    """Build (don't start) the server; ``port=0`` picks a free port
    (``server.server_address[1]`` reports it). Call ``serve_forever()``
    or drive it from a thread; ``shutdown()`` stops it."""
    registry = TableRegistry(registry_path, store=store)
    handler = type("Handler", (_Handler,), {
        "routes": _routes(registry), "quiet": quiet,
    })
    return ThreadingHTTPServer((host, port), handler)


def serve(registry_path: str, host: str = "127.0.0.1", port: int = 8085,
          store=None) -> None:
    """Blocking entrypoint (CLI ``serve``)."""
    srv = make_server(registry_path, host, port, store=store, quiet=False)
    print(json.dumps({
        "serving": f"http://{srv.server_address[0]}:{srv.server_address[1]}",
        "registry": registry_path,
    }), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
