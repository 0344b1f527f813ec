"""Partitioned JDBC scan builder (SURVEY.md S1/S2).

Re-expresses the reference's parallel JDBC read — split-by column min/max
boundary query + numPartitions (reference import_operations.py:1357-1378,
bounds from import_config.py:3042-3099) — as ``spark.read.format("jdbc")``
options. Session sizing follows the reference's mapper formula
(last_size / block_size, clamped — import_config.py:1990-2071).

No JDBC driver ships in this sandbox, so ``build()`` returns the reader
(plan construction is testable); ``load()`` is the only call that needs a
live database.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrameReader, SparkSession


def plan_sessions(
    last_import_bytes: int,
    block_size: int = 128 * 1024 * 1024,
    max_sessions: int = 32,
    global_max: int = 64,
) -> int:
    """#parallel sessions = bytes / block_size, clamped to [1, min(maxes)]
    — the reference's calculateJobMappers (import_config.py:1990-2071)."""
    n = max(1, last_import_bytes // block_size)
    return int(min(n, max_sessions, global_max))


@dataclass
class JdbcScan:
    url: str
    table: str  # table name or "(subquery) alias"
    user: str | None = None
    password: str | None = None
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int = 1
    fetch_size: int = 10_000  # reference single-session default
    where: str | None = None  # sqoop_sql_where_addition analogue (P4)

    def build(self, spark: SparkSession) -> DataFrameReader:
        dbtable = self.table
        if self.where:
            dbtable = f"(SELECT * FROM {self.table} WHERE {self.where}) src"
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", dbtable)
            .option("fetchsize", str(self.fetch_size))
        )
        if self.user is not None:
            reader = reader.option("user", self.user)
        if self.password is not None:
            reader = reader.option("password", self.password)
        if self.num_partitions > 1 and not self.partition_column:
            # loud, like the missing-bounds case below: silently running
            # a 32-session plan as ONE serial query is the worst failure
            # mode a large import can have
            raise ValueError(
                f"num_partitions={self.num_partitions} needs a "
                "partition_column — without one the scan would silently "
                "run single-session"
            )
        if self.partition_column and self.num_partitions > 1:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError("partitioned scan needs lower/upper bounds")
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("lowerBound", str(self.lower_bound))
                .option("upperBound", str(self.upper_bound))
                .option("numPartitions", str(self.num_partitions))
            )
        return reader

    def load(self, spark: SparkSession):
        return self.build(spark).load()
