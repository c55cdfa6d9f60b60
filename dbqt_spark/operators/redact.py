"""PII scanning and redaction for training-data pipelines.

Beyond the reference surface (BASELINE.json north star): before text
lands in a training corpus, emails / URLs / IP literals / long digit
runs (phone- and account-number-shaped strings) are counted and masked.
All patterns are pure ``regexp_extract_all`` / ``regexp_replace``
expressions — JVM-side, whole-stage codegen, no UDFs — so scanning and
redacting 100 TB is a single map over the corpus scan with zero
shuffle.

Pattern dialect note: every regex here is written in the common subset
of Java regex (Spark) and RE2 (DuckDB/Go) — no backreferences, no
lookaround — so the DuckDB oracle reproduces counts and redacted text
bit-for-bit. Redaction order is fixed (email, url, ipv4, digit-run):
later patterns cannot un-mask earlier replacements because the
placeholder tokens contain no pattern-matchable characters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters and is part of the contract (see module docstring).
PII_PATTERNS: "list[tuple[str, str, str]]" = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("digit_run", r"[0-9]{7,}", "<NUM>"),
]


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def redacted_text_col(text_col: str = "text") -> Column:
    """The masked text as a Column — patterns applied in PII_PATTERNS
    order over coalesce(text, '')."""
    out = F.coalesce(F.col(text_col), F.lit(""))
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc PII hit counts + the redacted length — one narrow
    projection (counts are computed on the raw text; the masked text
    itself comes from :func:`redact_pii`)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        _count(text, pattern).cast("long").alias(f"n_{name}")
        for name, pattern, _ in PII_PATTERNS
    ]
    return df.select(
        F.col(id_col),
        *counts,
        F.length(redacted_text_col(text_col))
        .cast("long")
        .alias("redacted_len"),
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "redacted_text",
) -> DataFrame:
    """All columns of ``df`` plus ``out_col`` holding the masked text."""
    return df.withColumn(out_col, redacted_text_col(text_col))
