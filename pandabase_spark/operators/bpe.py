"""Byte-pair-encoding tokenizer TRAINING and application, Spark-first.

The reference has no tokenizer learning (its text surface is storage
only); this is extension surface for the training-data-pipeline brief —
the "learn a vocabulary from the corpus" stage that precedes token
counting/packing. The design follows the classic Sennrich et al. 2016
trainer, arranged for scale:

- the corpus is FIRST compacted to the distinct-word frequency frame
  (one shuffle over the corpus, after which every training iteration
  touches only |vocab| rows — at 100 TB the word-frequency dict is
  tiny compared to the corpus, exactly why the classic trainer works
  on it);
- each merge iteration is ONE aggregation on that frame (adjacent-pair
  explode → sum of word counts) plus a JVM-side higher-order fold that
  rewrites the symbol sequences — no Python UDF anywhere; the driver
  holds only the argmax pair per iteration (a 1-row collect, the same
  bounded-driver contract as ivf_centroids);
- ties break deterministically (count desc, pair lexicographic asc),
  so training is reproducible run to run and engine to engine.

Application (:func:`apply_bpe_merges`) is a chain of plain string
``replace`` calls over a space-delimited symbol string — semantics
identical in Spark and ANSI SQL (left-to-right, non-overlapping), which
is what lets the driver gate check the applied tokenization
value-exactly against DuckDB while the trainer itself (a genuinely
iterative algorithm) carries the declared rows-only contract plus an
exact pytest pin against a hand-computed reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _words_with_counts(
    docs: DataFrame, text_col: str
) -> DataFrame:
    """Distinct lowercase whitespace words with corpus frequencies —
    the word-frequency dict all training iterations run on."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("w")
        )
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_fold(seq: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbol
    pairs in one aggregate fold: walking the sequence, an element that
    equals ``right`` while the accumulator's last element equals
    ``left`` replaces that last element with the merged symbol —
    standard BPE single-pass semantics ('aaa' + (a,a) → ['aa','a'])."""
    merged = left + right
    return F.aggregate(
        seq,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn_merges(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 8,
    min_count: int = 2,
    checkpoint_every: int = 16,
) -> "list[dict]":
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge table as dicts with keys ``rank, left, right,
    merged, pair_count`` — a driver-side index artifact (like
    ``ivf_centroids``'s list), bounded by ``n_merges``.

    Cost shape: one corpus shuffle (word-frequency compaction), then
    per merge ONE aggregation over the |vocab|-row frame. Within a
    window the frame is re-derived functionally (each iteration's
    sequences are the previous iteration's folded through
    :func:`_merge_fold` — a narrow column expression), and every
    ``checkpoint_every`` merges the re-segmented frame is
    MATERIALIZED (``localCheckpoint``, the GraphX/ALS iterative
    pattern) so the fold nesting — and with it both Catalyst
    analysis depth and per-iteration re-evaluation work — stays
    bounded by the window instead of growing O(merges²) toward a
    production 32k-merge vocabulary (r11 verdict watch-item #1).
    Stops early when the best pair's corpus count drops below
    ``min_count``."""
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    words = _words_with_counts(docs, text_col).select(
        "n",
        F.expr(
            "filter(split(w, ''), s -> s <> '')"
        ).alias("seq"),
    ).persist()
    merges: "list[dict]" = []
    try:
        seq_col = F.col("seq")
        for rank in range(n_merges):
            staged = words.select("n", seq_col.alias("seq"))
            pairs = (
                staged.where(F.size("seq") >= 2)
                .select(
                    "n",
                    F.explode(
                        F.zip_with(
                            F.slice("seq", 1, F.size("seq") - 1),
                            F.slice("seq", 2, F.size("seq") - 1),
                            lambda a, b: F.struct(
                                a.alias("l"), b.alias("r")
                            ),
                        )
                    ).alias("p"),
                )
                .groupBy("p")
                .agg(F.sum("n").alias("c"))
                .orderBy(
                    F.col("c").desc(), F.col("p.l").asc(),
                    F.col("p.r").asc(),
                )
                .limit(1)
                .collect()
            )
            if not pairs or int(pairs[0]["c"]) < min_count:
                break
            best = pairs[0]
            left, right = best["p"]["l"], best["p"]["r"]
            merges.append(
                {
                    "rank": rank,
                    "left": left,
                    "right": right,
                    "merged": left + right,
                    "pair_count": int(best["c"]),
                }
            )
            seq_col = _merge_fold(seq_col, left, right)
            if (rank + 1) % checkpoint_every == 0 and rank + 1 < n_merges:
                # (the second clause skips a boundary-aligned FINAL
                # iteration: materializing a frame no later iteration
                # reads is a full wasted job — r12 review)
                # truncate lineage: fold the window's merges into the
                # stored sequences once, so the NEXT window's pair
                # aggregation evaluates a flat scan + one bounded fold
                # chain instead of every merge learned so far
                folded = words.select(
                    "n", seq_col.alias("seq")
                ).localCheckpoint(eager=True)
                words.unpersist()
                words = folded
                seq_col = F.col("seq")
    finally:
        words.unpersist()
    return merges


def apply_bpe_merges(
    docs: DataFrame,
    merges: "list[tuple[str, str]] | list[dict]",
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a FIXED merge list: each word becomes
    a symbol string with DOUBLE-space separators, and the merges apply
    in rank order as plain ``replace(s, ' l  r ', ' lr ')`` calls —
    the pattern consumes only the INNER half of each two-space
    boundary, so adjacent merge sites never fight over a shared
    separator character and the replace pass is exactly the standard
    greedy left-to-right BPE merge (identical to the trainer's
    :func:`_merge_fold`; pinned against it in pytest, including the
    'banana'-with-(a,n) adjacency case a single-space representation
    gets wrong because ``replace`` cannot re-use a consumed boundary).
    Left-to-right non-overlapping semantics agree between Spark and
    ANSI SQL, which is what makes the result value-exact
    oracle-checkable. Returns ``(doc_col, n_words, n_chars,
    n_tokens)`` per document: ``n_chars`` is the pre-merge symbol
    count and ``n_tokens`` the post-merge count — the compression the
    vocabulary buys. The whole pipeline is Catalyst expressions
    (explode + regexp + nested replace + aggregation); nothing
    crosses into Python."""
    pairs = [
        (m["left"], m["right"]) if isinstance(m, dict) else (m[0], m[1])
        for m in merges
    ]
    for left, right in pairs:
        if " " in left or " " in right:
            raise ValueError("BPE symbols may not contain spaces")
    # '  a  b  c  ': every symbol carries one space on each side, so
    # boundaries between symbols are two spaces wide
    s: Column = F.concat(
        F.lit(" "),
        F.regexp_replace(F.col("w"), "(.)", " $1 "),
        F.lit(" "),
    )
    padded = s
    for left, right in pairs:
        padded = F.replace(
            padded,
            F.lit(f" {left}  {right} "),
            F.lit(f" {left}{right} "),
        )
    exploded = (
        docs.select(
            F.col(doc_col),
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("w"),
        )
        .where(F.length("w") > 0)
        .select(
            doc_col,
            F.length("w").alias("n_chars_w"),
            (
                F.size(F.split(F.trim(padded), " +"))
            ).alias("n_tokens_w"),
        )
    )
    return exploded.groupBy(doc_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_chars_w").cast("long").alias("n_chars"),
        F.sum("n_tokens_w").cast("long").alias("n_tokens"),
    )
