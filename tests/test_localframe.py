"""local_frame: value/schema parity with classic createDataFrame and
the plan guarantee the optimization exists for (no Python-evaluated
LogicalRDD for driver-local rows — OPTIMIZATION_r14.md Finding 1)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from pandabase_spark.localframe import local_frame


@pytest.fixture(scope="module")
def spark():
    from pandabase_spark.session import get_spark

    return get_spark("test_localframe")


MIXED_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("l", T.LongType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BinaryType()),
        T.StructField("arr", T.ArrayType(T.DoubleType())),
        T.StructField("ts", T.TimestampType()),
        T.StructField("bool", T.BooleanType()),
    ]
)

MIXED_ROWS = [
    (
        1,
        2**40,
        0.1 + 0.2,  # non-representable double: must round-trip exactly
        "héllo",
        b"\x00\xff",
        [1.5, float("inf")],
        datetime.datetime(2020, 6, 1, 12, 30, 15, 123456),
        True,
    ),
    (None, None, None, None, None, None, None, None),
]


def _optimized_head(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString().splitlines()[0]


def test_values_and_schema_match_classic(spark):
    fast = local_frame(spark, MIXED_ROWS, MIXED_SCHEMA)
    slow = spark.createDataFrame(MIXED_ROWS, MIXED_SCHEMA)
    assert fast.schema == slow.schema
    assert fast.collect() == slow.collect()


def test_plans_as_local_relation_not_python_rdd(spark):
    fast = local_frame(spark, MIXED_ROWS, MIXED_SCHEMA)
    assert "LocalRelation" in _optimized_head(fast)
    # and the classic path really is the LogicalRDD this replaces
    slow = spark.createDataFrame(MIXED_ROWS, MIXED_SCHEMA)
    assert "LogicalRDD" in _optimized_head(slow)


def test_ddl_string_schema(spark):
    df = local_frame(
        spark, [(0, [0.5, 0.25])], "cell int, avec array<double>"
    )
    assert df.schema == T.StructType.fromDDL(
        "cell int, avec array<double>"
    )
    assert df.collect() == [Row(cell=0, avec=[0.5, 0.25])]


def test_double_bit_exactness(spark):
    import struct as st

    vals = [0.1 + 0.2, 1e-308, -0.0, 3.141592653589793]
    df = local_frame(
        spark, [(v,) for v in vals], "x double"
    )
    got = [r["x"] for r in df.collect()]
    assert [st.pack("d", v) for v in vals] == [
        st.pack("d", v) for v in got
    ]


def test_empty_rows_jvm_only(spark):
    df = local_frame(spark, [], MIXED_SCHEMA)
    assert df.count() == 0
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in MIXED_SCHEMA.fields
    ]
    head = _optimized_head(df)
    assert "LogicalRDD" not in head


def test_row_objects_and_nested_struct(spark):
    sch = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField(
                "st",
                T.StructType([T.StructField("x", T.IntegerType())]),
            ),
        ]
    )
    rows = [Row(k="a", st=Row(x=1)), Row(k="b", st=None)]
    fast = local_frame(spark, rows, sch)
    slow = spark.createDataFrame(rows, sch)
    assert fast.collect() == slow.collect()
