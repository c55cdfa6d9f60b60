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
