"""Typed extraction over JSON string columns (``events.props``).

``from_json`` with an explicit schema — parsed once per row inside the
JVM (Jackson), pushed into the same codegen stage as downstream
predicates. ``get_json_object`` is used for ad-hoc single-path pulls.

The reference stores such columns as opaque strings (SURVEY.md §2 Table
B: json functions ABSENT); this module is the extension surface for the
driver's ``events`` table.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_TYPES: Mapping[str, T.DataType] = {
    "int": T.LongType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
}


def extract_json_fields(
    df: DataFrame, json_col: str, fields: Mapping[str, str], *, drop: bool = False
) -> DataFrame:
    """Project typed top-level fields out of a JSON string column.

    ``fields`` maps field name → logical type name (int/long/double/
    string/boolean/timestamp). Invalid JSON or missing fields yield
    NULL (PERMISSIVE mode) — the lenient semantics a pipeline over
    dirty web data needs.
    """
    schema = T.StructType(
        [T.StructField(name, _TYPES[t], True) for name, t in fields.items()]
    )
    parsed = F.from_json(F.col(json_col), schema)
    out = df
    for name in fields:
        out = out.withColumn(name, parsed[name])
    return out.drop(json_col) if drop else out


def events_enriched(
    events: DataFrame,
    *,
    json_col: str = "props",
    fields: Mapping[str, str] | None = None,
) -> DataFrame:
    """The driver's ``events`` table with its ``props`` JSON lifted to
    typed columns (default: the integer field ``k``)."""
    return extract_json_fields(events, json_col, fields or {"k": "long"})


def events_hourly_rollup(
    events: DataFrame, *, ts_col: str = "ts", type_col: str = "event_type"
) -> DataFrame:
    """Tumbling-hour counts and value sums per event type — the batch
    twin of the streaming windowed aggregation in
    :mod:`pandabase_spark.streaming`. One partial-aggregated shuffle on
    (hour, type)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
            F.col(type_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
    )
