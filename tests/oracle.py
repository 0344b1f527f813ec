"""Independent pure-Python oracle: last-writer-wins fold over a change log.

Used to pin engine convergence (FIXTURES.md §4). Deliberately written
without Spark: collect the log, sort by LSN, fold a dict.
"""

from __future__ import annotations


def lww_fold(events: list[dict], key: str = "doc_id") -> dict[str, dict]:
    """events: list of row dicts with lsn/op/key/payload. Returns final state."""
    state: dict[str, dict] = {}
    for ev in sorted(events, key=lambda e: e["lsn"]):
        k = ev[key]
        if ev["op"] == "D":
            state.pop(k, None)
        else:
            row = {c: v for c, v in ev.items() if c not in ("lsn", "op", "commit_ts")}
            if row.get("tokens") is not None:
                row["n_tok"] = len(row["tokens"])
            state[k] = row
    return state


def as_tuple_set(rows: list[dict], cols: list[str]) -> set[tuple]:
    out = set()
    for r in rows:
        vals = []
        for c in cols:
            v = r.get(c)
            if isinstance(v, list):
                v = tuple(v)
            vals.append(v)
        out.add(tuple(vals))
    return out
