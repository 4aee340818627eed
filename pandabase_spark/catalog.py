"""Catalog utilities — thin functional wrappers over KeyedCatalog.

Mirrors the reference's util module surface
(reference:pandabase/util.py:5-80, reference:pandabase/helpers.py:175-182):
has_table / drop_table / table_names / column_names / describe_database,
each with the reference's ``schema=`` namespace kwarg
(reference:pandabase/util.py:5,23,31,45) mapping to a warehouse
sub-directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pandabase_spark.io import KeyedCatalog


def has_table(
    cat: KeyedCatalog, table_name: str, schema: str | None = None
) -> bool:
    return cat.has_table(table_name, schema=schema)


def drop_db_table(
    cat: KeyedCatalog, table_name: str, schema: str | None = None
) -> None:
    cat.drop_table(table_name, schema=schema)


def get_db_table_names(
    cat: KeyedCatalog, schema: str | None = None
) -> list[str]:
    return cat.table_names(schema=schema)


def get_table_column_names(
    cat: KeyedCatalog, table_name: str, schema: str | None = None
) -> list[str]:
    return cat.column_names(table_name, schema=schema)


def describe_database(
    cat: KeyedCatalog,
    table_name: str | None = None,
    schema: str | None = None,
) -> DataFrame:
    return cat.describe(table_name, schema=schema)
