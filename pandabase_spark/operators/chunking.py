"""Context-window chunking: split documents into fixed-token chunks
with overlap — the tokenize-and-pack stage of a training pipeline.

One operator, :func:`chunk_documents`: each document becomes
``max(ceil((n_tokens - overlap) / stride), 1)`` chunks of up to
``chunk_tokens`` whitespace tokens, consecutive chunks sharing
``overlap`` tokens (``stride = chunk_tokens - overlap``). The final
chunk may be short; a document shorter than a chunk yields exactly one
chunk. Chunk ids are 0-based and deterministic.

Plan shape: tokenize (codegen'd ``split``), build the chunk-index array
with ``sequence``, ``posexplode`` it, and ``slice`` the token array per
chunk — a narrow one-to-many projection with NO shuffle and NO Python.
At 100 TB the output is ~(1 + overlap/stride)× the corpus in bytes;
the explode multiplies rows before any downstream shuffle, so filters
on chunk properties (e.g. min length) belong HERE, map-side, not after
a later groupBy. Mirrors the guidance in
pandabase_spark/operators/dedup.py about Generate pushdown: we explode
a ``sequence`` whose length Catalyst cannot misjudge, so no
``explode_outer`` workaround is needed.

The reference has no text surface (SURVEY.md §2 Table B); chunking
semantics follow standard context-window packing practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """(id, chunk_id, n_chunk_tokens, chunk_text) rows, 0-based ids."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    from pandabase_spark.functions.text import tokenize

    stride = chunk_tokens - overlap
    toks = tokenize(text_col)
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - F.lit(overlap)) / F.lit(stride)),
        F.lit(1),
    )
    staged = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")).alias("_idx"),
    )
    chunk = F.slice(
        F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return (
        staged.select(
            F.col(id_col),
            F.explode(F.col("_idx")).alias("chunk_id"),
            F.col("_toks"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )
