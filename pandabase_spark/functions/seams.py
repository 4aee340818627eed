"""The complete Python-boundary surface, each form next to its
Catalyst twin.

The engine's rule is that Python runs only at sanctioned seams —
``mapInPandas`` for opaque codecs (operators/multimodal.py),
``applyInPandasWithState`` for custom streaming state (streaming/).
This module rounds out the remaining two API forms Spark offers so
the boundary is demonstrated end to end, with each one paired to the
built-in expression that should replace it in a hot path:

- **UDAF** — an Arrow-batched grouped-aggregate ``pandas_udf``
  (weighted mean) vs its exact Catalyst twin ``sum(v*w)/sum(w)``;
- **UDTF** — a Python table function (sentence splitting with
  positions) vs its exact twin ``posexplode(split(...))``.

Parity between each seam and its twin is asserted in
tests/test_operators.py; neither seam appears in any gate query's hot
path. The reference has no registered DB functions at all
(SURVEY.md §2 Table B, "UDF/UDAF/UDTF surface: ABSENT") — this is
extension surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F


def weighted_mean_udaf() -> "callable":
    """Grouped-aggregate pandas UDAF: weighted mean of (value, weight)
    per group, one Arrow batch per group partition. Use in
    ``df.groupBy(g).agg(weighted_mean_udaf()(v, w))``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _wmean(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    return _wmean


def weighted_mean_builtin(v: str, w: str) -> Column:
    """The Catalyst twin — whole-stage-codegen'd, partial-aggregating,
    the production form of :func:`weighted_mean_udaf`."""
    return (F.sum(F.col(v) * F.col(w)) / F.sum(F.col(w))).alias("wmean")


def sentence_udtf():
    """Python UDTF: one input string → (pos, sentence) rows. Register
    with ``spark.udtf.register(name, sentence_udtf())`` and call in
    SQL via ``LATERAL``."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, sentence STRING")
    class SentenceSplitter:
        def eval(self, text: str):
            if text is None:
                return
            pieces = (p.strip() for p in text.split("."))
            for i, s in enumerate(p for p in pieces if p):
                yield i, s

    return SentenceSplitter


def sentences_builtin(text: str) -> list[Column]:
    """The Catalyst twin of :func:`sentence_udtf` for use under
    ``select(..., *sentences_builtin(c))`` with a lateral view:
    posexplode over a filtered/trimmed split — same rows, zero Python.
    """
    parts = F.filter(
        F.transform(F.split(F.col(text), r"\."), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    return [F.posexplode(parts).alias("pos", "sentence")]
