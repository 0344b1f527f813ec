"""SparkSession factory with cluster-honest defaults.

Local testing runs on local[N]; on a real cluster the same settings apply
(AQE, Arrow, sensible shuffle partition counts). Nothing here assumes
single-JVM execution.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dbimport_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    master defaults to local[$SPARK_GRAFT_CPUS] (32 in the sandbox); on a
    real deployment pass master=None and let spark-submit decide.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism; AQE coalesces down when partitions are tiny
        n = master[len("local[") : -1] if master.startswith("local[") else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # token-array rows make sort spill expensive; shuffled-hash join
        # beats sort-merge for the engine's co-partitioned merges
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # the engine co-partitions merge inputs by _bucket (a strict subset
        # of the join keys); allow that partitioning to satisfy the join
        # instead of forcing a re-exchange on all keys
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # INT64 micros instead of legacy INT96: parquet footers then carry
        # min/max statistics for timestamp columns, which the lake records
        # per data file (DataFile.stats) and the incremental exporter uses
        # to prune untouched buckets from metadata alone. INT96 files from
        # older commits stay readable; they simply carry no stats.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
