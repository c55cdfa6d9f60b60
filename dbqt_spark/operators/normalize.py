"""Text normalization — the canonical pre-dedup / pre-tokenize step.

Beyond the reference surface (north star). Every exact-match stage
(line dedup, fingerprints, n-gram decontamination) treats byte-distinct
strings as distinct, so visually-identical texts that differ only in
Unicode composition ("é" as U+00E9 vs e+U+0301), compatibility forms
(the "ﬁ" ligature), case, or whitespace runs silently evade it. The
standard fix normalizes FIRST: Unicode normal form, casefold,
whitespace collapse — in that order.

Scale shape: only the Unicode normalization needs Python (Spark has no
built-in normalizer) and it runs as ONE Arrow ``pandas_udf`` batch map
— no shuffle, no per-row Python. Case folding and whitespace collapse
stay JVM-side (``F.lower`` / ``regexp_replace``, whole-stage codegen).
A fast path skips the UDF entirely when ``form=None``.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    form: "str | None" = "NFC",
    lower: bool = True,
    collapse_whitespace: bool = True,
    out_col: "str | None" = None,
) -> DataFrame:
    """Return ``df`` with ``text_col`` (or ``out_col``) normalized:
    Unicode ``form`` (NFC/NFKC/NFD/NFKD, or None to skip the Arrow
    step), then lowercase, then whitespace runs collapsed to single
    spaces with ends trimmed. NULL texts stay NULL. Application order
    matters and is fixed: compatibility decomposition can CREATE case
    and whitespace (NFKC turns the ﬁ ligature into "fi"), so the
    JVM-side steps run after the Unicode step."""
    if form is not None and form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS} or None, got {form}")
    col = F.col(text_col)
    if form is not None:
        nf = form  # bind for the closure

        @F.pandas_udf("string")
        def unorm(s: pd.Series) -> pd.Series:
            return s.map(
                lambda t: None if t is None else unicodedata.normalize(nf, t)
            )

        col = unorm(col)
    if lower:
        col = F.lower(col)
    if collapse_whitespace:
        col = F.trim(F.regexp_replace(col, r"\s+", " "))
    return df.withColumn(out_col or text_col, col)


# entity -> replacement, applied AFTER tag removal in a FIXED order
# (numeric first so '&#38;' cannot re-introduce a matchable '&amp;';
# '&amp;' LAST so the '&' it produces cannot reactivate any earlier
# entity pattern — the same ordering discipline as redact_pii).
# The ampersand placeholder is U+FFFF, a Unicode NONCHARACTER that is
# invalid in interchange text — unlike an ASCII sentinel string it
# cannot legitimately occur in input, and strip_markup removes any
# stray occurrence up front so a hostile document cannot inject it
# (ADVICE r10: '&REF_AMP;' was valid input text and got corrupted).
_AMP_SENTINEL = "￿"
_HTML_ENTITIES: "list[tuple[str, str]]" = [
    (r"&#39;", "'"),
    (r"&#38;", _AMP_SENTINEL),  # placeholder, resolved at the end
    (r"&nbsp;", " "),
    (r"&quot;", '"'),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&amp;", _AMP_SENTINEL),
    (_AMP_SENTINEL, "&"),
]


def strip_markup(
    df: DataFrame,
    text_col: str = "text",
    out_col: "str | None" = None,
) -> DataFrame:
    """HTML/markup removal — the boilerplate-stripping step web-corpus
    pipelines (C4, RefinedWeb's fallback path) run before any text
    analysis: tags ``<...>`` (including ``<br/>`` and attributes)
    drop, the common entities decode, whitespace collapses. NOT a
    browser-grade extractor (no script/style content awareness — a
    real crawl pipeline runs a DOM extractor upstream); it is the
    deterministic, engine-portable cleanup for text that still carries
    residual markup.

    Pure ``regexp_replace`` chain in the Java-regex/RE2 common dialect
    (``<[^>]*>`` never backtracks pathologically), zero UDF/shuffle.
    Entity decoding is ORDERED so one replacement's output can never
    re-activate an earlier pattern — ``&amp;lt;`` decodes to the
    literal ``&lt;`` text, not to ``<`` (the double-escape trap)."""
    col = F.coalesce(F.col(text_col), F.lit(""))
    # drop stray U+FFFF noncharacters BEFORE the sentinel round-trip:
    # they are invalid in interchange text, and removing them is what
    # makes the sentinel collision-free by construction
    col = F.regexp_replace(col, _AMP_SENTINEL, "")
    col = F.regexp_replace(col, r"<[^>]*>", " ")
    for pat, rep in _HTML_ENTITIES:
        col = F.regexp_replace(col, pat, rep)
    col = F.trim(F.regexp_replace(col, r"\s+", " "))
    return df.withColumn(out_col or text_col, col)
