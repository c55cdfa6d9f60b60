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


def _block_text(b):
    """Tag-stripped, whitespace-collapsed text of one block — staged
    ONCE into a struct by the caller (duplicated regexp trees
    re-evaluate per use site; codegen CSE does not collapse them)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(b, r"<[^>]*>", " "), r"\s+", " "
        )
    )


# block-level HTML elements whose tags delimit text-density blocks —
# the jusText/trafilatura segmentation unit (inline tags like <a>/<b>
# do NOT split a paragraph)
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|dl|dt|dd|h1|h2|h3|h4|h5|h6|table|thead|tbody|"
    "tr|td|th|blockquote|pre|section|article|aside|header|footer|nav|"
    "form|fieldset|figure|figcaption|main|hr|center|title"
)


def extract_main_content(
    df: DataFrame,
    text_col: str = "text",
    out_col: "str | None" = None,
    min_text_chars: int = 25,
    max_link_density: float = 0.5,
    block_sep: str = "\n",
    with_stats: bool = False,
) -> DataFrame:
    """MAIN-CONTENT extraction — the boilerplate-removal stage between
    raw HTML and the quality gates (the trafilatura/jusText position;
    ``strip_markup`` deliberately is NOT this — it strips residual
    tags but keeps nav/footer text). Line/block text-density
    classification, the core heuristic those extractors share:

    1. script/style/comment CONTENT drops entirely (their text is
       code, not prose);
    2. the document splits into BLOCKS at block-level tag boundaries
       (``_BLOCK_TAGS``) and newlines — inline markup never splits a
       paragraph;
    3. each block keeps iff its tag-stripped text has at least
       ``min_text_chars`` characters AND its LINK DENSITY (anchor-text
       chars / text chars) is at most ``max_link_density`` — short
       and/or link-dominated blocks are menus, breadcrumbs, footers,
       cookie banners;
    4. kept blocks' texts (entities decoded by the ``strip_markup``
       ordered chain) join with ``block_sep``.

    DETERMINISTIC + engine-portable by construction: the density
    compare is integer arithmetic (``link_chars * 1000 <= text_chars
    * round(max_link_density*1000)``) — no float boundary to diverge
    on — and every regex stays in the Java-regex/RE2 common dialect
    (no backreferences, bounded ``[^>]*`` / lazy ``.*?`` forms), so a
    DuckDB twin reproduces the extraction bit-for-bit.

    Scale shape: one pure-codegen projection per row — regexp chain +
    split + ONE ``transform`` staging each block's (text, link_chars)
    struct (evaluated once, the regexp-staging house rule) + filter +
    array_join. No UDF, no shuffle, no state; 100 TB is a map.

    ``with_stats=True`` appends ``n_blocks_total`` / ``n_blocks_kept``
    for drop accounting."""
    from ..utils import spread_small_scan

    df = spread_small_scan(df)  # heavy narrow map; no-op at scale
    thr_mil = int(round(float(max_link_density) * 1000))
    raw = F.coalesce(F.col(text_col), F.lit(""))
    # 1. drop script/style/comment content (separate patterns: RE2 has
    # no backreferences, so one <(script|style)>.*?</\1> is off-limits)
    cleaned = raw
    for pat in (
        r"(?is)<script[^>]*>.*?</script\s*>",
        r"(?is)<style[^>]*>.*?</style\s*>",
        r"(?s)<!--.*?-->",
    ):
        cleaned = F.regexp_replace(cleaned, pat, " ")
    # 2. block segmentation: block-level tags become newlines
    boundary = F.regexp_replace(
        cleaned, rf"(?i)</?({_BLOCK_TAGS})\b[^>]*>", "\n"
    )
    blocks = F.split(boundary, "\n")
    # 3. stage (text, link_chars) per block ONCE
    stats = F.transform(
        blocks,
        lambda b: F.struct(
            _block_text(b).alias("t"),
            F.aggregate(
                F.transform(
                    # \b after the tag name: without it the pattern
                    # also opens at <abbr>/<address>/<audio>..., counts
                    # their prose as link text, and sinks real blocks
                    F.regexp_extract_all(
                        b, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"), F.lit(1)
                    ),
                    lambda a: F.length(_block_text(a)),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("lk"),
        ),
    )
    # STAGE the per-block struct array as a named column (the
    # script_stats discipline): the whole regexp+transform tree feeds
    # content and (optionally) both stats columns, and CollapseProject
    # keeps a non-cheap multi-consumer alias in its own projection —
    # the tree evaluates exactly once per row
    staged = df.withColumn("__mc_stats", stats)
    sc = F.col("__mc_stats")

    def _keep(s):
        return (F.length(s["t"]) >= F.lit(int(min_text_chars))) & (
            s["lk"] * F.lit(1000) <= F.length(s["t"]) * F.lit(thr_mil)
        )

    content = F.array_join(
        F.transform(F.filter(sc, _keep), lambda s: s["t"]), block_sep
    )
    # 4. entity decode (the strip_markup ordered chain, same sentinel
    # discipline) on the assembled content
    content = F.regexp_replace(content, _AMP_SENTINEL, "")
    for pat, rep in _HTML_ENTITIES:
        content = F.regexp_replace(content, pat, rep)
    out = staged.withColumn(out_col or text_col, content)
    if with_stats:
        out = out.withColumn(
            "n_blocks_total",
            F.size(
                F.filter(sc, lambda s: F.length(s["t"]) > 0)
            ).cast("long"),
        ).withColumn(
            "n_blocks_kept", F.size(F.filter(sc, _keep)).cast("long")
        )
    return out.drop("__mc_stats")
