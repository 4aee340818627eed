"""PII detection and redaction — pure Catalyst regex expressions.

The standard pre-training cleanup pass (mask emails / IP addresses /
phone numbers before a corpus is assembled). Three shapes:

- :data:`PII_PATTERNS` — the regexes, chosen to mean the same thing in
  Java regex (Spark) and RE2 (DuckDB/the SQL oracles): no lookaround,
  no backreferences, ASCII word boundaries only.
- :func:`pii_counts` / :func:`redact_pii` — column functions
  (``regexp_count`` / chained ``regexp_replace``), codegen'd JVM-side.
- :func:`pii_scan` / :func:`pii_redact` — DataFrame operators: the
  per-document audit report and the masked corpus.

Scale notes: a single projection over the document scan — no shuffle,
no UDF, no Python. At 100 TB this is the cheapest kind of operator
Spark has (narrow map inside whole-stage codegen); the only design
decision that matters is keeping the regexes linear-time (RE2-safe
patterns are by construction — no catastrophic backtracking even on
Java's backtracking engine, since they contain no nested quantifiers).

Redaction order is fixed (email, then ipv4, then phone) so the output
is deterministic; the patterns are mutually exclusive on well-formed
text (an email's TLD is alphabetic, so its host never parses as an
IPv4), making the order a tie-break, not a semantic choice.

The reference has no text surface (SURVEY.md §2 Table B); semantics
follow the published pipeline practice (e.g. BigScience/ROOTS PII
masking) reduced to the regex-expressible core.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Kind -> (pattern, replacement token). Dict order IS redaction order.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "phone": (r"(\(\d{3}\)\s?|\b\d{3}[-.])\d{3}[-.]\d{4}\b", "<PHONE>"),
}


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind match counts, ``{kind: Column<int>}``."""
    t = _c(text)
    return {
        kind: F.regexp_count(t, F.lit(pat)).alias(f"n_{kind}")
        for kind, (pat, _) in PII_PATTERNS.items()
    }


def redact_pii(text: Column | str, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace every PII match with its ``<KIND>`` token.

    ``kinds`` restricts which patterns run (default: all, in
    :data:`PII_PATTERNS` order).
    """
    out = _c(text)
    for kind, (pat, token) in PII_PATTERNS.items():
        if kinds is None or kind in kinds:
            out = F.regexp_replace(out, pat, token)
    return out


def pii_scan(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII audit: (id, n_email, n_ipv4, n_phone,
    has_pii) — the flag/drop list a pipeline acts on."""
    counts = pii_counts(text_col)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *counts.values(),
        (total > 0).alias("has_pii"),
    )


def pii_redact(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """The corpus with ``text_col`` masked in place."""
    return df.withColumn(text_col, redact_pii(text_col))
