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


def blocklist_scan(
    df: DataFrame,
    phrases: "list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "token",
) -> DataFrame:
    """(id_col, n_blocked) for every doc matching the blocklist — the
    C4 "bad words" gate (Raffel et al. 2020 drop any page containing a
    listed word) and the brand/compliance phrase screens curation
    pipelines run. Matching is case-insensitive on whitespace-token
    boundaries: 'ass' does not match 'class' (the classic blocklist
    false-positive), and multi-word phrases match token-adjacent
    sequences.

    Two executions by list size, same semantics:

    - ``mode='token'`` (single words, scales to 100k+ lists): the
      corpus explodes to lowercased tokens, the phrase list BROADCASTS
      into an equi-join, hit counts aggregate per doc — the corpus
      never shuffles (contamination_check's shape). Multi-word phrases
      are rejected here (token equality cannot see adjacency).
    - ``mode='phrase'`` (multi-word, bounded lists <= ~500): each
      phrase becomes one position-search on the space-padded
      normalized text (`` `` + lower(text w/ collapsed whitespace) +
      `` ``), counted via occurrence splitting — pure codegen string
      expressions, no explode, no shuffle, engine-portable (no regex
      metacharacter hazard: phrases are matched literally).

    Docs with no match are absent (this is a scan); ``blocklist_drop``
    anti-joins it for the gate."""
    if not phrases:
        raise ValueError("phrases must be a non-empty list")
    norm = [" ".join(p.lower().split()) for p in phrases]
    if any(not p for p in norm):
        raise ValueError("blank phrase in blocklist")
    if mode == "token":
        multi = [p for p in norm if " " in p]
        if multi:
            raise ValueError(
                f"multi-word phrases {multi[:3]!r} need mode='phrase' "
                "(token equality cannot see adjacency)"
            )
        toks = F.expr(
            f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"
        )
        words = df.sparkSession.createDataFrame(
            [(p,) for p in sorted(set(norm))], ["__w"]
        )
        return (
            df.select(F.col(id_col), F.explode(toks).alias("__w"))
            .join(F.broadcast(words), "__w")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_blocked"))
        )
    if mode != "phrase":
        raise ValueError(f"mode must be 'token' or 'phrase', got {mode!r}")
    if len(norm) > 500:
        raise ValueError(
            f"{len(norm)} phrases is past the phrase-mode expression "
            "bound (500); single words scale via mode='token'"
        )
    padded = F.concat(
        F.lit(" "),
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
        ),
        F.lit(" "),
    )
    if any("\\E" in p for p in norm):
        raise ValueError(r"phrases may not contain the \E sequence")
    # occurrences of ' p ' = size(split(padded, quoted-literal)) - 1.
    # Split occurrences are NON-OVERLAPPING in both engines, so two
    # adjacent repeats sharing one boundary space count once — the
    # count is a consistent cross-engine lower bound and the gate
    # semantics (n_blocked > 0) are exact.
    counts = [
        (
            F.size(
                # split by the QUOTED literal — no regex surprises
                F.split(padded, "\\Q " + p + " \\E")
            )
            - 1
        ).cast("long")
        for p in sorted(set(norm))
    ]
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return (
        df.select(F.col(id_col), total.alias("n_blocked"))
        .filter(F.col("n_blocked") > 0)
    )


def blocklist_drop(
    df: DataFrame,
    phrases: "list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "token",
) -> DataFrame:
    """Corpus rows with every blocklist-matching doc REMOVED (the C4
    gate shape: anti-join against the scan's flagged id set)."""
    hits = blocklist_scan(df, phrases, text_col, id_col, mode)
    return df.join(F.broadcast(hits.select(id_col)), id_col, "left_anti")
