import base64

from pyspark.sql import types as T

from dbimport_spark.functions.schema_normalize import (
    normalize_dataframe,
    normalize_type,
)


def test_normalize_type_rules():
    nested = T.StructType(
        [
            T.StructField("b", T.BinaryType()),
            T.StructField(
                "arr", T.ArrayType(T.StructType([T.StructField("x", T.BinaryType())]))
            ),
            T.StructField("m", T.MapType(T.StringType(), T.BinaryType())),
            T.StructField("n", T.NullType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("i", T.IntegerType()),
        ]
    )
    out = normalize_type(nested, dates_to_string=True)
    assert out["b"].dataType == T.StringType()
    assert out["arr"].dataType.elementType["x"].dataType == T.StringType()
    assert out["m"].dataType.valueType == T.StringType()
    assert out["n"].dataType == T.StringType()
    assert out["ts"].dataType == T.StringType()
    assert out["i"].dataType == T.IntegerType()


def test_normalize_dataframe(spark):
    import datetime as dt

    schema = T.StructType(
        [
            T.StructField("doc", T.StructType([T.StructField("blob", T.BinaryType())])),
            T.StructField("blobs", T.ArrayType(T.BinaryType())),
            T.StructField("ts", T.TimestampType()),
            T.StructField("i", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame(
        [((b"\x01\x02",), [b"ab"], dt.datetime(2024, 1, 2, 3, 4, 5), 7)], schema
    )
    out = normalize_dataframe(df, dates_to_string=True)
    row = out.first()
    assert out.schema["doc"].dataType["blob"].dataType == T.StringType()
    assert row["doc"]["blob"] == base64.b64encode(b"\x01\x02").decode()
    assert row["blobs"] == [base64.b64encode(b"ab").decode()]
    assert row["ts"] == "2024-01-02 03:04:05"
    assert row["i"] == 7


def test_null_struct_stays_null(spark):
    from dbimport_spark.functions.schema_normalize import normalize_dataframe

    schema = T.StructType(
        [T.StructField("doc", T.StructType([T.StructField("blob", T.BinaryType())]))]
    )
    df = spark.createDataFrame([((b"x",),), (None,)], schema)
    rows = normalize_dataframe(df).collect()
    vals = [r["doc"] for r in rows]
    assert sum(v is None for v in vals) == 1  # NULL subdocument preserved
    assert sum(v is not None for v in vals) == 1
