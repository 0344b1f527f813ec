"""Benchmark harness — prints ONE JSON line for the driver.

Headline: CDC apply throughput. A deterministic change log sized to the
scale factor (20M events/SF ⇒ 2M at sf0.1) is written to parquet, then
replayed through the full engine (LWW dedup → bucketed MERGE → watermark
commits) into a fresh lake table: full replay + an incremental tail batch.
Plus the non-CDC headline operators at the same SF (LWW dedup scan,
MinHash-LSH dedup, embedding similarity).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EVENTS_PER_SF = 20_000_000
KEYS_PER_SF = 2_000_000


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    n_events = max(int(EVENTS_PER_SF * sf), 10_000)
    n_keys = max(int(KEYS_PER_SF * sf), 1_000)

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from dbimport_spark.plans.engine import CDCEngine
    from dbimport_spark.session import get_spark
    from dbimport_spark.sources.loggen import generate_changes, write_changes

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = get_spark(
        app_name="dbimport-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.io.compression.codec": "zstd",
            "spark.sql.parquet.compression.codec": "zstd",
            **(
                {"spark.local.dir": tempfile.mkdtemp(prefix="bench-sl-", dir=shm)}
                if shm
                else {}
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="cdc-bench-")
    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # -- materialize the change log (not counted in apply throughput) -------
    full = int(n_events * 0.9)
    log_path = os.path.join(work, "log")
    timed(
        "loggen_write",
        lambda: write_changes(
            generate_changes(
                spark, n_events, n_keys=n_keys, seed=42, tokens_min=32, tokens_max=128
            ),
            log_path,
            n_files=max(cpus * 2, 16),
        ),
    )
    changes = spark.read.parquet(log_path)
    head = changes.filter(F.col("lsn") <= full)
    tail = changes.filter(F.col("lsn") > full)

    # -- full replay (4 batches) into a fresh table --------------------------
    table = CDCEngine.create_table(
        os.path.join(work, "table"), num_buckets=max(cpus * 2, 32)
    )
    eng = CDCEngine(spark, table, checkpoint_dir=os.path.join(work, "ckpt"))
    timed("cdc_replay_full", lambda: eng.replay(head, num_batches=2))

    # -- steady-state incremental batch (10% tail) ---------------------------
    timed("cdc_apply_incr", lambda: eng.apply_batch(tail, full, n_events))

    replay_sec = timings["cdc_replay_full"] + timings["cdc_apply_incr"]
    eps = n_events / replay_sec if replay_sec > 0 else 0.0

    # -- headline operator queries at the SF dir -----------------------------
    timed("lww_dedup", lambda: entry.q_lww_dedup(spark, sf_dir).count())
    timed("minhash_lsh", lambda: entry.q_minhash_lsh(spark, sf_dir).count())
    timed("embedding_sim", lambda: entry.q_embedding_sim(spark, sf_dir).count())
    timed("token_count", lambda: entry.q_token_count(spark, sf_dir).count())
    timed(
        "token_fingerprints",
        lambda: entry.q_token_fingerprints(spark, sf_dir).count(),
    )

    shutil.rmtree(work, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "cdc_bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "events": n_events,
                "keys": n_keys,
                "cdc_apply_events_per_sec": round(eps, 1),
                "parallelism": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
