"""Replay checkpoint: the batch plan plus progress, as atomic JSON.

The *authoritative* exactly-once state is the ``last_lsn`` property stamped
inside each lake-table commit (analogue of the reference promoting pending
watermarks only at the final stage, import_config.py:1086-1108). The
checkpoint here is the resumable *plan* — LSN ranges still to apply — so a
restarted driver re-plans identically and skips whatever the table already
absorbed. Crash between table-commit and checkpoint-write is safe: on
resume the stale checkpoint's next range is already ≤ the table watermark
and is skipped (idempotent re-apply).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class ReplayPlan:
    ranges: list[tuple[int, int]]  # (lo_exclusive, hi_inclusive]
    completed: int = 0
    meta: dict = field(default_factory=dict)

    def to_json(self) -> dict:
        return {"ranges": [list(r) for r in self.ranges], "completed": self.completed, "meta": self.meta}

    @staticmethod
    def from_json(d: dict) -> "ReplayPlan":
        return ReplayPlan(
            ranges=[tuple(r) for r in d["ranges"]],
            completed=d.get("completed", 0),
            meta=d.get("meta", {}),
        )


def save_plan(path: str, plan: ReplayPlan, store=None) -> None:
    """Atomic write through the pluggable state store (lake/statestore.py);
    default LocalStateStore keeps the historical tmp+fsync+rename layout."""
    from dbimport_spark.lake.statestore import DEFAULT_STORE

    (store or DEFAULT_STORE).write_text(path, json.dumps(plan.to_json()))


def load_plan(path: str, store=None) -> ReplayPlan | None:
    from dbimport_spark.lake.statestore import DEFAULT_STORE

    text = (store or DEFAULT_STORE).read_text(path)
    if text is None:
        return None
    return ReplayPlan.from_json(json.loads(text))
