"""Exact LINE-level deduplication — the C4 / RefinedWeb / MassiveText
curation stage the document-level tiers don't cover.

Beyond the reference surface (north star). Web corpora repeat whole
LINES across documents (navigation chrome, cookie banners, boilerplate
footers) far more than they repeat whole documents; the standard fix is
exact line dedup across the corpus: C4 discards repeated spans,
MassiveText/RefinedWeb drop duplicate lines, keeping one occurrence.
Both policies are here:

- ``mode="keep_first"`` (MassiveText): every line keeps exactly its
  FIRST occurrence in (id, position) order; later occurrences are
  removed from their documents.
- ``mode="drop_frequent"`` (C4-style): every occurrence of a line
  whose corpus-wide count reaches ``min_count`` is removed (including
  the first — boilerplate is poison wherever it appears).

Scale shape: ONE posexplode (narrow, no shuffle) -> ONE hash shuffle
keyed by the line text for the per-line aggregate (count + first
occurrence, map-side combinable) -> verdicts join back on the line key
(the only corpus-sized shuffle; AQE picks the strategy) -> per-doc
reassembly is a groupBy on the id (second bounded shuffle) with an
array_sort on (position, line) so the rebuilt text is deterministic
under any partitioning. Empty-line runs are preserved exactly: lines
are split on ``\\n`` and rejoined on ``\\n``, and a document whose
every line is removed survives as an empty string (dropping it is the
downstream quality gate's decision, not the dedup's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MODES = ("keep_first", "drop_frequent")


def line_level_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "keep_first",
    min_count: int = 3,
) -> DataFrame:
    """Rebuild ``text_col`` with duplicate lines removed corpus-wide.
    Returns the input columns with ``text_col`` replaced and an
    ``n_removed_lines`` count per document (observability: silent text
    surgery is unauditable).
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    other_cols = [c for c in df.columns if c not in (id_col, text_col)]
    lines = df.select(
        F.col(id_col).alias("__id"),
        *[F.col(c) for c in other_cols],
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias(
            "__pos", "__line"
        ),
    )
    if mode == "keep_first":
        # first occurrence in (id, pos) order; min over the packed
        # struct is map-side combinable (no window over the corpus)
        firsts = lines.groupBy("__line").agg(
            F.min(F.struct("__id", "__pos")).alias("__first")
        )
        joined = lines.join(firsts, "__line")
        kept = joined.withColumn(
            "__keep",
            (F.col("__first.__id") == F.col("__id"))
            & (F.col("__first.__pos") == F.col("__pos")),
        )
    else:
        counts = lines.groupBy("__line").agg(
            F.count(F.lit(1)).alias("__cnt")
        )
        kept = lines.join(counts, "__line").withColumn(
            "__keep", F.col("__cnt") < F.lit(min_count)
        )
    rebuilt = (
        kept.groupBy("__id", *other_cols)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__keep"),
                                F.struct("__pos", "__line"),
                            )
                        )
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias(text_col),
            F.count(F.when(~F.col("__keep"), F.lit(1)))
            .cast("long")
            .alias("n_removed_lines"),
        )
        .withColumnRenamed("__id", id_col)
    )
    return rebuilt.select(id_col, text_col, *other_cols, "n_removed_lines")


def duplicate_span_removal(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicated-SPAN removal — the substring dedup of Lee et
    al. 2022 ("Deduplicating Training Data Makes Language Models
    Better", ExactSubstr): any ``k``-token span that occurs at least
    ``min_count`` times ANYWHERE in the corpus (other documents or the
    same one) is removed from every document, and every token covered
    by such a span goes with it. Line dedup catches whole repeated
    lines; this catches the boilerplate that flows across line breaks
    (license blocks, templated paragraphs, quoted chain-mail) — the
    single highest-impact dedup intervention measured in that paper.

    Token-level surgery: the text is whitespace-tokenized and rebuilt
    as the space-joined surviving tokens (original inter-token
    whitespace is not preserved — the same contract every token-level
    ExactSubstr implementation makes). Documents with fewer than ``k``
    tokens (or NULL text) pass through untouched. Returns the input
    columns with ``text_col`` replaced plus ``n_removed_tokens``.

    Scale shape: ONE corpus scan. posexplode tokens -> per-doc window
    ``lead`` builds the k-gram at each start (stays in codegen, same
    trick as ``dedup.shingle_rows``) -> map-side-combined
    ``groupBy(gram)`` count (a hot gram collapses to one partial per
    partition — never a per-gram window) -> duplicated grams (a few
    percent of starts in real corpora) semi-join back against the
    starts on the gram key (the one potentially skewed join; AQE's
    skew split handles a pathologically hot gram, and the build side is
    one row per gram) -> covered tokens via a per-doc ROWS window over
    the last k-1 start flags -> per-doc reassembly with deterministic
    (pos, token) ordering. All remaining shuffles are doc-keyed
    (bounded by document length). The gram key ships as the string so
    the DuckDB oracle is bit-for-bit; at extreme scale ship
    ``xxhash64(gram)`` instead — same plan, narrower shuffle.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
        ).alias("__pos", "__tok"),
    )
    w = Window.partitionBy("__id").orderBy("__pos")
    parts = [F.col("__tok")] + [
        F.lead("__tok", i).over(w) for i in range(1, k)
    ]
    with_gram = toks.select(
        "__id",
        "__pos",
        "__tok",
        F.when(
            parts[-1].isNotNull() if k > 1 else F.lit(True),
            F.concat_ws(" ", *parts),
        ).alias("__gram"),
    )
    dup_grams = (
        with_gram.filter(F.col("__gram").isNotNull())
        .groupBy("__gram")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select("__gram", F.lit(1).alias("__dup_start"))
    )
    # ONE left join marks duplicated starts directly on the token rows
    # (a semi-join + (doc,pos) join-back would consume the exploded
    # window subtree a third time — one full extra corpus pass)
    flagged = with_gram.join(dup_grams, "__gram", "left").select(
        "__id", "__pos", "__tok", "__dup_start"
    )
    w_cov = (
        Window.partitionBy("__id")
        .orderBy("__pos")
        .rowsBetween(-(k - 1), 0)
    )
    covered = F.max("__dup_start").over(w_cov)
    rebuilt = (
        flagged.withColumn("__cov", covered)
        .groupBy("__id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__cov").isNull(),
                                F.struct("__pos", "__tok"),
                            )
                        )
                    ),
                    lambda x: x["__tok"],
                ),
            ).alias("__clean"),
            F.count(F.when(F.col("__cov").isNotNull(), 1))
            .cast("long")
            .alias("n_removed_tokens"),
        )
    )
    new_text = (
        # token-less docs (absent from rebuilt) pass through untouched
        F.when(rebuilt["__id"].isNull(), F.col(text_col))
        .otherwise(F.col("__clean"))
        .alias(text_col)
    )
    return df.join(
        rebuilt, F.col(id_col) == rebuilt["__id"], "left"
    ).select(
        *[new_text if c == text_col else F.col(c) for c in df.columns],
        F.coalesce("n_removed_tokens", F.lit(0))
        .cast("long")
        .alias("n_removed_tokens"),
    )
