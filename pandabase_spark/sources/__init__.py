"""Ingestion sources beyond parquet.

The reference's only file ingestion is zipped CSVs loaded through
pandas in its test fixtures (reference:tests/conftest.py:117-130).
Parity surface:

- :func:`read_csv` — distributed CSV scan (Spark reader: header,
  schema inference, multi-file globs) + this engine's identifier
  hygiene (clean_name) and optional value-narrowing pass;
- :func:`read_zipped_csv` — the reference's .zip fixture shape; zip is
  not a splittable/distributed format (no Hadoop codec), so this is an
  explicit driver-side convenience for small fixture files, documented
  as such — at scale, land data as parquet/csv.gz instead.
"""

from __future__ import annotations

import io
import zipfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from pandabase_spark.names import clean_name


def read_csv(
    spark: SparkSession,
    path: str,
    *,
    header: bool = True,
    infer_schema: bool = True,
    schema=None,
    narrow: bool = False,
    **options: str,
) -> DataFrame:
    """Distributed CSV read with cleaned column names.

    Pass ``schema`` (StructType) to skip inference — the at-scale
    contract: inference is an extra full pass over the files and
    widens every integer to int64.

    ``narrow=True`` additionally applies the engine's value-narrowing
    rules (0/1 int columns → boolean, all-zero ints → double, all-null
    → dropped) in one aggregation pass — the same semantics the keyed
    write path applies (reference:pandabase/helpers.py:35-64,105-115).
    """
    reader = spark.read.option("header", str(header).lower()).options(
        **options
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", str(infer_schema).lower())
    df = reader.csv(path)
    renames = {c: clean_name(c) for c in df.columns}
    df = df.selectExpr(
        *[f"`{old}` AS `{new}`" for old, new in renames.items()]
    )
    if narrow:
        from pandabase_spark.types import narrow_spark_schema

        df = narrow_spark_schema(df, keys=[])
    return df


def read_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema=None,
    narrow: bool = False,
    **options: str,
) -> DataFrame:
    """Distributed JSON-lines scan with cleaned column names.

    Without an explicit ``schema`` Spark samples the files to infer one
    and sorts fields alphabetically — pass ``schema`` (or reselect) when
    column order matters downstream. At scale ALWAYS pass ``schema``:
    inference is a full extra pass over 100 TB of text.
    """
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    df = df.selectExpr(
        *[f"`{c}` AS `{clean_name(c)}`" for c in df.columns]
    )
    if narrow:
        from pandabase_spark.types import narrow_spark_schema

        df = narrow_spark_schema(df, keys=[])
    return df


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line, Spark-partitioned files).

    Doubles serialize in shortest-roundtrip form, so a write→read cycle
    is value-exact; field order inside each object follows the
    DataFrame schema.
    """
    df.write.mode(mode).json(path)


def read_orc(
    spark: SparkSession, path: str, *, narrow: bool = False, **options: str
) -> DataFrame:
    """Distributed ORC scan with cleaned column names — columnar,
    splittable, predicate-pushdown-capable (same scan contract as the
    parquet path: pushed filters + pruned columns reach the reader)."""
    df = spark.read.options(**options).orc(path)
    df = df.selectExpr(
        *[f"`{c}` AS `{clean_name(c)}`" for c in df.columns]
    )
    if narrow:
        from pandabase_spark.types import narrow_spark_schema

        df = narrow_spark_schema(df, keys=[])
    return df


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """ORC sink (schema-preserving, type-exact roundtrip)."""
    df.write.mode(mode).orc(path)


def write_csv(
    df: DataFrame, path: str, *, mode: str = "overwrite", header: bool = True,
    **options: str,
) -> None:
    """CSV sink (header row, Spark-partitioned files, splittable on
    read). CSV is typeless — pair with an explicit ``schema=`` on
    :func:`read_csv` for an exact roundtrip; doubles serialize in
    shortest-roundtrip form."""
    df.write.mode(mode).option("header", str(header).lower()).options(
        **options
    ).csv(path)


def read_zipped_csv(
    spark: SparkSession, path: str, *, member: str | None = None, **read_csv_kwargs
) -> DataFrame:
    """Load a .csv inside a .zip (reference fixture shape).

    Driver-side: zip has no Hadoop input codec, so the archive is read
    locally and parallelized from pandas — correct for fixture-sized
    files, NOT a path for large data (use parquet or csv.gz, which
    Spark splits/streams natively).
    """
    with zipfile.ZipFile(path) as zf:
        name = member or next(
            n for n in zf.namelist() if n.lower().endswith(".csv")
        )
        with zf.open(name) as f:
            pdf = pd.read_csv(io.TextIOWrapper(f, encoding="utf-8"))
    pdf.columns = [clean_name(c) for c in pdf.columns]
    return spark.createDataFrame(pdf)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str],
    mode: str = "overwrite",
    colocate: bool = True,
) -> None:
    """Hive-layout partitioned parquet sink (``path/col=value/...``).

    ``colocate=True`` repartitions by the partition columns first so
    each partition value's rows land in one task — without it every
    task writes a file per value it happens to hold, and a 1000-task
    job over a 50-value column scatters up to 50,000 small files.
    Colocation caps the file count at one per value (per shuffle
    partition for skewed values) — the difference between a healthy
    and a pathological layout at 100 TB. Use only low-cardinality
    columns as partition keys; high-cardinality partitioning is the
    classic small-files anti-pattern.
    """
    out = df.repartition(*partition_by) if colocate else df
    out.write.mode(mode).partitionBy(*partition_by).parquet(path)


def read_partitioned_parquet(
    spark: SparkSession, path: str, **options: str
) -> DataFrame:
    """Scan a hive-partitioned parquet layout. Filters on partition
    columns prune whole directories before any file is opened
    (PartitionFilters in the scan node — see plans.plan_audit);
    filters on data columns still push into the parquet readers."""
    return spark.read.options(**options).parquet(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw media ingestion: Spark's ``binaryFile`` source — one row per
    file with (path, modificationTime, length, content BINARY) — the
    entry point of the multimodal pipeline (payload bytes stay
    JVM-side; decode happens later at the explicit
    ``operators/multimodal.py`` mapInPandas seam).

    ``glob`` filters by filename pattern (``pathGlobFilter``, e.g.
    ``"*.png"``); ``max_bytes`` guards against a stray huge file
    becoming one giant row (filter pushed as a LENGTH predicate, so
    oversized files are skipped from the listing, not read). At scale,
    pair with ``spark.sql.files.maxPartitionBytes`` so the scan packs
    many small media files per task — the small-file problem is the
    listing's, not this reader's.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= max_bytes)
    return df
