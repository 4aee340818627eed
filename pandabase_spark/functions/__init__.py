"""Column-expression helpers — all JVM-side Catalyst expressions.

Everything in this package returns :class:`pyspark.sql.Column` built from
built-in functions (higher-order array functions, hash functions, regexp)
so it participates in whole-stage codegen; there are NO Python UDFs here.
That is the engine's core performance rule (see repo README): the hot
path stays inside Tungsten.

The reference (notsambeck/pandabase) has no expression surface at all —
its only scalar logic is host-language pandas (reference:pandabase/
helpers.py:185-196 clean_name, reference:pandabase/companda.py:129-147
tolerance math). These modules are the extension surface a 100 TB
training-data pipeline needs (dedup, similarity, text quality), built as
reusable column functions so the operators in
:mod:`pandabase_spark.operators` stay thin.
"""

from pandabase_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
)
from pandabase_spark.functions.text import (
    char_ngrams,
    content_hash,
    lang_best_guess,
    normalize_text,
    quality_score,
    simhash64,
    stopword_ratio,
    token_count,
    tokenize,
    word_ngrams,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "l2_normalize",
    "char_ngrams",
    "content_hash",
    "lang_best_guess",
    "normalize_text",
    "quality_score",
    "simhash64",
    "stopword_ratio",
    "token_count",
    "tokenize",
    "word_ngrams",
]
