"""Benchmark harness — prints ONE JSON line for the driver.

Headline: CDC apply throughput. A deterministic change log sized to the
scale factor (20M events/SF ⇒ 2M at sf0.1) is written to parquet, then
replayed through the full engine (LWW dedup → bucketed MERGE → watermark
commits) into a fresh lake table: full replay + an incremental tail batch.
Plus the non-CDC headline operators at the same SF (LWW dedup scan,
MinHash-LSH dedup, embedding similarity).

Noise protocol (round 3): the sandbox VM shows ±2.4× run-to-run noise on
identical code (BENCH/BASELINE.md), so every timed query is repeated
``SPARK_GRAFT_BENCH_REPEATS`` times (default 5 as of round 5) INTERLEAVED — pass 1 runs
every query once, then pass 2, then pass 3 — so a host-noise burst hits at
most one sample of each query instead of all samples of one query. The
reported per-query number is the best (min) wall time — the noise-robust
capability estimate — and ALL samples are recorded in ``runs`` so the
spread is auditable. Replay repeats each get a fresh lake table +
checkpoint dir; the incremental-apply repeat runs against the table its
own pass just replayed, preserving the full→incr dependency per pass.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_REPEATS (default 5).
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
    repeats = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5")), 1)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    n_events = max(int(EVENTS_PER_SF * sf), 10_000)
    n_keys = max(int(KEYS_PER_SF * sf), 1_000)

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from dbimport_spark.lake.table import LakeTable
    from dbimport_spark.plans.engine import CDCEngine
    from dbimport_spark.session import get_spark
    from dbimport_spark.sources.loggen import generate_changes, write_changes

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    shm_dir = tempfile.mkdtemp(prefix="bench-sl-", dir=shm) if shm else None
    spark = get_spark(
        app_name="dbimport-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.io.compression.codec": "zstd",
            "spark.sql.parquet.compression.codec": "zstd",
            **({"spark.local.dir": shm_dir} if shm_dir else {}),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="cdc-bench-")
    # crash-safe cleanup: a RAM-backed spark.local.dir left behind by an
    # interrupted run pins shuffle/spill files in tmpfs (host MEMORY)
    # across attempts — exactly the external-load noise the calibration
    # bracket exists to detect
    import atexit

    atexit.register(shutil.rmtree, work, ignore_errors=True)
    if shm_dir:
        atexit.register(shutil.rmtree, shm_dir, ignore_errors=True)
    runs: dict[str, list[float]] = {}
    minmax_rescans: list[int] = []  # groups rescanned per incr mm sync

    def calibrate() -> float:
        """Fixed pure-CPU probe pricing the host's external load at this
        moment (quiet box: ~0.2-0.5s warm at 32 threads; the r4->r5
        regression postmortem in BENCH/BASELINE.md saw 7-10x swings).
        Reported alongside the samples so every record carries the noise
        it was taken under."""
        t0 = time.time()
        spark.range(1_000_000_000).select(F.sum(F.col("id") % 7)).collect()
        return round(time.time() - t0, 3)

    def sample(name, fn):
        t0 = time.time()
        out = fn()
        runs.setdefault(name, []).append(round(time.time() - t0, 3))
        return out

    # untimed JVM warmup: loggen is sampled ONCE, and as the process's
    # first job it would otherwise absorb all codegen/classload/first-
    # shuffle cost — observed 9s vs 60s bimodality for identical work.
    # A small generate+write exercises the same code paths first, and a
    # small replay warms the MERGE path's codegen (stats agg, LWW dedup,
    # bucketed join, parquet sink, commit) — round 4's first replay
    # sample ran 2x its third (19.4s vs 9.4s) because the first big merge
    # was also the JVM's first.
    warm_path = os.path.join(work, "warmup")
    write_changes(
        generate_changes(spark, 50_000, n_keys=5_000, seed=1,
                         tokens_min=32, tokens_max=128, num_partitions=8),
        warm_path, presorted=True,
    )
    warm_tdir = os.path.join(work, "warmup-table")
    warm_eng = CDCEngine(
        spark, CDCEngine.create_table(warm_tdir, num_buckets=8)
    )
    warm_eng.replay(spark.read.parquet(warm_path), num_batches=2)
    shutil.rmtree(warm_tdir, ignore_errors=True)
    shutil.rmtree(warm_path, ignore_errors=True)

    # -- materialize the change log (setup; timed once, not repeated — so
    # its sample can't be min-ed; the calibration bracket prices the load
    # it ran under (r5 postmortem: a 4s loggen read 111-175s inside three
    # externally-loaded windows while later passes were quiet) -----------
    host_calib = [calibrate()]
    full = int(n_events * 0.9)
    log_path = os.path.join(work, "log")
    sample(
        "loggen_write",
        lambda: write_changes(
            generate_changes(
                spark,
                n_events,
                n_keys=n_keys,
                seed=42,
                tokens_min=32,
                tokens_max=128,
                num_partitions=max(cpus * 2, 16),
            ),
            log_path,
            presorted=True,  # spark.range partitions are contiguous lsn ranges
        ),
    )
    changes = spark.read.parquet(log_path)
    head = changes.filter(F.col("lsn") <= full)
    tail = changes.filter(F.col("lsn") > full)

    def replay_pass(i: int) -> None:
        """Fresh table per repeat; incr applies to this pass's own table."""
        tdir = os.path.join(work, f"table-{i}")
        cdir = os.path.join(work, f"ckpt-{i}")
        table = CDCEngine.create_table(tdir, num_buckets=max(cpus * 2, 32))
        eng = CDCEngine(spark, table, checkpoint_dir=cdir)
        sample("cdc_replay_full", lambda: eng.replay(head, num_batches=2))
        # min/max view bootstrapped at the HEAD version (untimed; same
        # fold shape as matview_sync below) so its timed sync covers only
        # the incremental window — candidate folding plus group-scoped
        # rescans where the tail removed a stored extremum
        from dbimport_spark.plans.matview import AggSpec, create_view, sync_view

        mm_spec = AggSpec(
            group_cols=["source"], sum_cols=["n_tok"],
            min_cols=["n_tok"], max_cols=["n_tok"],
        )
        mmdir = os.path.join(work, f"mmview-{i}")
        mmeng = CDCEngine(
            spark, create_view(mmdir, table, mm_spec, num_buckets=8)
        )
        sync_view(spark, table, mmeng, mm_spec)
        # snapshot the pre-incremental table (untimed file copy) so the
        # merge-on-read apply below starts from the SAME state the CoW
        # apply consumes — the pair isolates write mode, nothing else
        mdir = os.path.join(work, f"table-mor-{i}")
        shutil.copytree(tdir, mdir)
        sample("cdc_apply_incr", lambda: eng.apply_batch(tail, full, n_events))
        # same batch, merge-on-read: delta/delete files appended, touched
        # buckets scanned only for the column-pruned audit probe — the
        # steady-state write path for small batches against big buckets
        meng = CDCEngine(
            spark, LakeTable.load(mdir), write_mode="mor"
        )
        sample("mor_apply_incr", lambda: meng.apply_batch(tail, full, n_events))
        shutil.rmtree(mdir, ignore_errors=True)
        mm_bs = sample(
            "matview_incr_minmax",
            lambda: sync_view(spark, table, mmeng, mm_spec),
        )
        minmax_rescans.append(mm_bs.rescanned_groups)
        shutil.rmtree(mmdir, ignore_errors=True)
        # change data feed over the incremental window just applied:
        # snapshot-diff changelog, shared files pruned from the scan
        from dbimport_spark.lake.cdf import table_changes

        v_incr = table.current().version
        sample(
            "cdf_net",
            lambda: table_changes(spark, table, v_incr - 1, v_incr).count(),
        )
        # matview bootstrap: the heaviest sync (v0 feed = whole table as
        # inserts folded into per-source count/sum totals)
        spec = AggSpec(group_cols=["source"], sum_cols=["n_tok"])
        vdir = os.path.join(work, f"view-{i}")
        veng = CDCEngine(spark, create_view(vdir, table, spec, num_buckets=8))
        sample("matview_sync", lambda: sync_view(spark, table, veng, spec))
        shutil.rmtree(vdir, ignore_errors=True)
        shutil.rmtree(tdir, ignore_errors=True)
        shutil.rmtree(cdir, ignore_errors=True)

    operator_queries = [
        ("lww_dedup", lambda: entry.q_lww_dedup(spark, sf_dir).count()),
        ("minhash_lsh", lambda: entry.q_minhash_lsh(spark, sf_dir).count()),
        ("embedding_sim", lambda: entry.q_embedding_sim(spark, sf_dir).count()),
        ("token_count", lambda: entry.q_token_count(spark, sf_dir).count()),
        (
            "token_fingerprints",
            lambda: entry.q_token_fingerprints(spark, sf_dir).count(),
        ),
    ]

    # -- interleaved best-of-N: pass i runs every query once ------------------
    for i in range(repeats):
        host_calib.append(calibrate())
        replay_pass(i)
        for name, fn in operator_queries:
            sample(name, fn)
    host_calib.append(calibrate())

    shutil.rmtree(work, ignore_errors=True)

    best = {name: min(samples) for name, samples in runs.items()}
    spread = {
        name: round(max(s) / min(s), 2) if min(s) > 0 else None
        for name, s in runs.items()
    }
    replay_sec = best["cdc_replay_full"] + best["cdc_apply_incr"]
    eps = n_events / replay_sec if replay_sec > 0 else 0.0

    total = round(sum(best.values()), 3)
    print(
        json.dumps(
            {
                "metric": "cdc_bench_total",
                "value": total,
                "unit": "sec",
                "queries": best,
                "runs": runs,
                "spread_max_over_min": spread,
                "repeats": repeats,
                "protocol": "interleaved best-of-N (min per query; all samples in 'runs')",
                "sf": sf,
                "events": n_events,
                "keys": n_keys,
                "cdc_apply_events_per_sec": round(eps, 1),
                "matview_minmax_rescans_per_sync": minmax_rescans,
                "host_calibration_sec": host_calib,
                "parallelism": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
