"""Catalog utilities — thin functional wrappers over KeyedCatalog.

Mirrors the reference's util module surface
(reference:pandabase/util.py:5-80, reference:pandabase/helpers.py:175-182):
has_table / drop_table / table_names / column_names / describe_database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pandabase_spark.io import KeyedCatalog


def has_table(cat: KeyedCatalog, table_name: str) -> bool:
    return cat.has_table(table_name)


def drop_db_table(cat: KeyedCatalog, table_name: str) -> None:
    cat.drop_table(table_name)


def get_db_table_names(cat: KeyedCatalog) -> list[str]:
    return cat.table_names()


def get_table_column_names(cat: KeyedCatalog, table_name: str) -> list[str]:
    return cat.column_names(table_name)


def describe_database(cat: KeyedCatalog, table_name: str | None = None) -> DataFrame:
    return cat.describe(table_name)
