"""Vector math over ``array<float|double>`` columns — pure Catalyst.

Implemented with higher-order array functions (``zip_with`` +
``aggregate``), which execute as JVM expressions inside whole-stage
codegen: no serialization boundary, no Python. A 64-dim dot product is a
tight fold over an unsafe array — this is the baseline primitive for the
similarity-search and embedding-dedup operators.

Both Spark's ``aggregate`` and DuckDB's ``list_sum(list_transform(...))``
fold left-to-right over the same element order, so cross-engine results
agree bit-for-bit up to the usual double rounding; oracle queries round
to 4 decimals anyway.

The reference has no vector surface (SURVEY.md §2 Table B: array/map
functions ABSENT) — this is extension surface for the embeddings table.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _to_double(c: Column) -> Column:
    return c.cast("double")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two numeric array columns, as double.

    ``aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)`` —
    one pass, no explode, no shuffle.
    """
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: _to_double(x) * _to_double(y))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array column, as double."""
    a = F.col(a) if isinstance(a, str) else a
    sq = F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + _to_double(v) * _to_double(v)
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array columns; NULL when either norm is 0.

    dot(a,b) / (||a|| * ||b||) computed in one projection. All three
    folds run in the same codegen stage; Catalyst does not re-read the
    arrays from storage three times.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def l2_normalize(a: Column | str) -> Column:
    """Array scaled to unit L2 norm (NULL-safe: zero vector → NULL).

    Normalizing once at ingest turns every later cosine into a plain
    dot product — at 100 TB that halves the arithmetic of a similarity
    scan, so the operators prefer normalized columns when reused.
    """
    a = F.col(a) if isinstance(a, str) else a
    n = l2_norm(a)
    return F.when(n > 0, F.transform(a, lambda v: _to_double(v) / n))
