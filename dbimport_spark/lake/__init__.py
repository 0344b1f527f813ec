from dbimport_spark.lake.table import LakeTable, Snapshot  # noqa: F401
