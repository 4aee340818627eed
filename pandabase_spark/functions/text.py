"""Text-analysis column functions — pure Catalyst (no Python UDFs).

Language-ID, quality scoring, token counting, shingling, content hashes
and SimHash, all as built-in-function expressions so a 100 TB document
scan stays inside whole-stage codegen. Shingle/token arrays are built
with ``split``/``transform``/``sequence`` higher-order functions and
consumed by the dedup operators without ever leaving the JVM.

The reference has no text surface (SURVEY.md §2 Table B: string
functions PARTIAL, host-language only) — this is the extension surface
for the ``documents`` table.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, functions as F

# Tiny per-language marker vocabularies for the n-gram/stopword
# language-ID heuristic. Deterministic and intentionally small: real
# pipelines would plug a model here; the operator contract (argmax of
# marker hits, fixed tie order) is what matters.
LANG_MARKERS: Mapping[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es": ("el", "la", "los", "y", "es", "que", "un"),
    "fr": ("le", "la", "les", "et", "est", "que", "un"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"),
}
LANG_ORDER: tuple[str, ...] = ("en", "de", "es", "fr", "zh")

# Stopwords for the quality heuristic (English-biased on purpose — the
# score is a filter signal, not a classifier).
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "and", "or", "is", "are", "to", "in", "on",
    "for", "with", "at", "by", "from",
)


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_text(text: Column | str) -> Column:
    """Lowercase, trim, collapse runs of whitespace to single spaces."""
    return F.regexp_replace(F.trim(F.lower(_c(text))), r"\s+", " ")


def tokenize(text: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(text), " ")


def token_count(text: Column | str) -> Column:
    """Number of whitespace tokens; 0 for empty/blank text."""
    t = normalize_text(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, " ")))


def char_ngrams(text: Column | str, n: int = 5) -> Column:
    """Character n-gram shingles (array<string>), stride 1.

    A text shorter than ``n`` yields one (short) shingle, so every
    non-empty document has at least one — keeps Jaccard well-defined.
    """
    t = normalize_text(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: t.substr(i, F.lit(n)))


def word_ngrams(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>), space-joined."""
    toks = tokenize(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, n), " ")
    )


def content_hash(text: Column | str) -> Column:
    """md5 hex digest of the normalized text (exact-dup fingerprint).

    md5-of-utf8 so the DuckDB oracle (``md5(text)``) produces the same
    hex string.
    """
    return F.md5(normalize_text(text).cast("binary"))


def content_hash_fast(text: Column | str) -> Column:
    """xxhash64 of the normalized text — the production twin of
    :func:`content_hash`. Native 64-bit hash inside whole-stage
    codegen (no digest allocation, no hex encoding), ~10× cheaper per
    row; exact-dup grouping only needs determinism, not a replayable
    digest, so collisions aside (2⁻⁶⁴-scale, same birthday math that
    makes 16-byte md5 acceptable) the duplicate groups are identical —
    pinned by the md5-vs-xxhash parity test."""
    return F.xxhash64(normalize_text(text))


def stopword_ratio(
    text: Column | str, stopwords: Sequence[str] = STOPWORDS
) -> Column:
    """Fraction of tokens that are stopwords, as double (0 when empty)."""
    toks = tokenize(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(list(stopwords))))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def alpha_ratio(text: Column | str) -> Column:
    """Fraction of characters that are ascii letters or spaces."""
    t = normalize_text(text)
    keep = F.length(F.regexp_replace(t, r"[^a-z ]", ""))
    return F.when(F.length(t) > 0, keep.cast("double") / F.length(t)).otherwise(
        F.lit(0.0)
    )


def quality_score(text: Column | str) -> Column:
    """Deterministic document-quality score in [0, 1].

    Four equally-weighted signals (length band, mean token length band,
    stopword presence, alphabetic ratio) — the standard cheap pre-filter
    shape for LLM training corpora (C4-style heuristics). Each signal is
    expressible in ANSI SQL, so the DuckDB oracle can replay it exactly.
    """
    t = normalize_text(text)
    ntok = token_count(t).cast("double")
    mean_len = F.when(
        ntok > 0, (F.length(t) - (ntok - 1)) / ntok
    ).otherwise(F.lit(0.0))
    s_len = (ntok >= 5) & (ntok <= 5000)
    s_tok = (mean_len >= 2.0) & (mean_len <= 12.0)
    s_stop = stopword_ratio(t) >= 0.01
    s_alpha = alpha_ratio(t) >= 0.6
    return (
        s_len.cast("double") * 0.25
        + s_tok.cast("double") * 0.25
        + s_stop.cast("double") * 0.25
        + s_alpha.cast("double") * 0.25
    )


def lang_hits(text: Column | str, lang: str) -> Column:
    """Count of tokens that are marker words for ``lang``."""
    toks = tokenize(text)
    return F.size(F.filter(toks, lambda t: t.isin(list(LANG_MARKERS[lang]))))


def lang_best_guess(text: Column | str) -> Column:
    """Language-ID: argmax of marker-word hits, ties broken by
    LANG_ORDER precedence; 'und' (undetermined) when no marker hits.

    One pass over the token array per language — five codegen'd array
    filters, no shuffle, no UDF.
    """
    t = normalize_text(text)
    hits = {lang: lang_hits(t, lang) for lang in LANG_ORDER}
    best = F.greatest(*[hits[lang] for lang in LANG_ORDER])
    expr = F.lit("und")
    # build the CASE from lowest to highest precedence so earlier
    # languages in LANG_ORDER win ties
    for lang in reversed(LANG_ORDER):
        expr = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def _token_hash60(tok: Column) -> Column:
    """Deterministic 60-bit integer hash of a token via md5 — chosen over
    xxhash64 so the DuckDB oracle can reproduce it from ``md5()``."""
    return F.conv(F.substring(F.md5(tok.cast("binary")), 1, 15), 16, 10).cast("long")


def simhash64(text: Column | str, bits: int = 60) -> Column:
    """SimHash fingerprint of the token set (60-bit, as long).

    Classic Charikar construction: per token a 60-bit hash; per bit
    position sum +1/-1 over tokens; fingerprint bit = sign. Near-dup
    pairs have small Hamming distance (use ``F.bit_count(a.bitwiseXOR
    (b))``). Entirely higher-order-function arithmetic — no UDF, no
    shuffle; cost is O(tokens × bits) per row in codegen.
    """
    toks = tokenize(text)
    hashes = F.transform(toks, _token_hash60)
    # bit positions unrolled as Python constants: each bit's +1/-1 sum is
    # one codegen'd fold over the token-hash array; the fingerprint is the
    # sum of sign-selected powers of two. Static expression tree, no UDF.
    def bit_sum(b: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + (F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("int") * 2 - 1),
        )

    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(bit_sum(b) > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def min_fingerprint(text: Column | str, n: int = 8) -> Column:
    """Cheap document fingerprint: minimum 60-bit hash over character
    n-gram shingles (a 1-permutation MinHash). Two documents sharing
    most shingles collide with probability ≈ their Jaccard similarity.
    """
    return F.array_min(F.transform(char_ngrams(text, n), _token_hash60))


# GPT-2-style pre-tokenizer pattern, restricted to an RE2-safe subset
# (no lookahead) so the DuckDB oracle compiles the identical pattern:
# contractions, letter runs, digit runs, other-symbol runs, each with an
# optional leading space. Applied to normalized (lowercased,
# space-collapsed) text, so \p{L}/\p{N} reduce to [a-z]/[0-9].
BPE_SPLIT_PATTERN: str = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"


def bpe_token_count(text: Column | str) -> Column:
    """Token count under a BPE-style pre-tokenizer split (the GPT-2
    regex family) — the unit LLM data work is budgeted in, vs the
    whitespace count of :func:`token_count`. Pure Catalyst:
    ``regexp_extract_all`` + ``size``; alternation order is
    leftmost-first in both Java regex and RE2, so the DuckDB oracle
    reproduces the count exactly."""
    t = normalize_text(text)
    return F.size(F.regexp_extract_all(t, F.lit(BPE_SPLIT_PATTERN), 0))


# NOTE: winnowed (rolling-hash) document fingerprints live in
# pandabase_spark.operators.dedup.winnow_fingerprints as a DataFrame
# operator, NOT as a Column function: the window-min step must slide
# over a STAGED hash-array column. As a single nested expression,
# slice(hashes, i, w) inside the window transform re-evaluates the
# entire md5-per-ngram subtree once per window — O(len²) hashes per
# document (measured: hangs at 500 docs).
