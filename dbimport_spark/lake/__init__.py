from dbimport_spark.lake.table import LakeTable, Snapshot  # noqa: F401
from dbimport_spark.lake.cdf import (  # noqa: F401
    table_changes,
    table_changes_per_commit,
)
