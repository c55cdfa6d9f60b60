"""Row-level and checksum-level table comparison — migration
validation beyond the reference's count-and-column-set checks.

The reference's dbstats compares row COUNTS between source and target
(dbqt/tools/dbstats.py:203-213) and colcompare compares column SETS;
neither says WHICH rows differ or whether values drifted. These
operators complete that story:

- ``table_diff``: keyed full-outer row diff — added / removed /
  changed / identical per row, with the changed column list.
- ``diff_summary``: the aggregate view — status counts plus per-column
  change counts (the datacompy-style report, distributed).
- ``agg_compare``: per-column checksum compare (count / nulls / min /
  max / sum) — the O(1)-output validator you run FIRST at 100 TB; a
  mismatch then justifies the keyed diff's shuffle.

Scale shape: ``table_diff`` is one sort-merge join (one shuffle per
side, keyed on the join key — co-partitioned, AQE-sized); every column
comparison is codegen'd null-safe equality, no UDFs. ``agg_compare``
is two single-pass map-side-combined aggregates joined on a constant —
the cheapest possible full-table validation (one scan per side, O(cols)
output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _compare_cols(
    source: DataFrame, target: DataFrame, key_cols: list[str],
    compare_cols: list[str] | None,
) -> list[str]:
    if compare_cols is not None:
        return list(compare_cols)
    shared = [c for c in source.columns if c in set(target.columns)]
    return [c for c in shared if c not in set(key_cols)]


def table_diff(
    source: DataFrame,
    target: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed row-level diff. Output: the key columns, ``diff_status``
    ('added' | 'removed' | 'changed' | 'identical'), and
    ``changed_columns`` (sorted array, empty unless 'changed').

    Comparison is null-safe per column (NULL == NULL holds, NULL vs
    value is a change). Keys are assumed unique per side — the standard
    migration-validation contract (run keyfinder first if unsure);
    duplicate keys produce a row per pairing, as in any SQL join.
    """
    if not key_cols:
        raise ValueError("table_diff needs at least one key column")
    cols = _compare_cols(source, target, key_cols, compare_cols)
    s = source.select(
        *[F.col(k).alias(f"__sk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__s_{c}") for c in cols],
        F.lit(True).alias("__in_s"),
    )
    t = target.select(
        *[F.col(k).alias(f"__tk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__t_{c}") for c in cols],
        F.lit(True).alias("__in_t"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"__sk_{k}") == F.col(f"__tk_{k}")
        cond = c if cond is None else (cond & c)
    j = s.join(t, cond, "full_outer")
    changed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__s_{c}").eqNullSafe(F.col(f"__t_{c}")),
                        F.lit(c),
                    )
                    for c in cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    status = (
        F.when(F.col("__in_s").isNull(), F.lit("added"))
        .when(F.col("__in_t").isNull(), F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("identical"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"__sk_{k}"), F.col(f"__tk_{k}")).alias(k)
            for k in key_cols
        ],
        status.alias("diff_status"),
        F.when(
            F.col("__in_s").isNotNull() & F.col("__in_t").isNotNull(),
            changed,
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_columns"),
    )


def diff_summary(
    source: DataFrame,
    target: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Aggregate diff report: one row per status ('added', 'removed',
    'changed', 'identical') with its row count, then one row per
    compared column that changed anywhere ('column:<name>') with the
    count of rows where it changed. Statuses with zero rows are
    omitted (keeps the report schema stable across table sizes)."""
    cols = _compare_cols(source, target, key_cols, compare_cols)
    d = table_diff(source, target, key_cols, compare_cols=cols)
    by_status = d.groupBy(
        F.col("diff_status").alias("item")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    per_col = (
        d.select(F.explode("changed_columns").alias("c"))
        .groupBy(F.concat(F.lit("column:"), F.col("c")).alias("item"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    return by_status.unionByName(per_col).orderBy("item")


def agg_compare(
    source: DataFrame,
    target: DataFrame,
    cols: list[str],
    sum_scale: int = 6,
) -> DataFrame:
    """Per-column checksum compare: for each named numeric column emit
    (column_name, metric, source_value, target_value, is_match) for
    metrics n_rows / n_null / min / max / sum. Sums run in
    DECIMAL(38, sum_scale) so they are exact and order-independent —
    a float sum would make is_match depend on partitioning. Values are
    emitted as doubles (counts and decimal sums convert exactly within
    the profiled ranges).

    One scan per side (all metrics fused into a single aggregate row,
    map-side combined), then a 5xN-row constant join: run this FIRST
    at 100 TB; only a mismatch justifies table_diff's keyed shuffle.
    """
    if not cols:
        raise ValueError("agg_compare needs at least one column")

    def one_side(df: DataFrame) -> DataFrame:
        aggs = []
        for c in cols:
            dec = F.col(c).cast(f"decimal(38,{sum_scale})")
            aggs += [
                F.count(F.lit(1)).cast("double").alias(f"{c}__n_rows"),
                F.count(F.when(F.col(c).isNull(), 1))
                .cast("double")
                .alias(f"{c}__n_null"),
                F.min(F.col(c)).cast("double").alias(f"{c}__min"),
                F.max(F.col(c)).cast("double").alias(f"{c}__max"),
                F.sum(dec).cast("double").alias(f"{c}__sum"),
            ]
        return df.groupBy().agg(*aggs)

    metrics = ["n_rows", "n_null", "min", "max", "sum"]
    s, t = one_side(source), one_side(target)
    pairs = s.join(t.select(*[F.col(x).alias(f"t_{x}") for x in t.columns]))
    rows = []
    for c in cols:
        for m in metrics:
            rows.append(
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.lit(m).alias("metric"),
                    F.col(f"{c}__{m}").alias("source_value"),
                    F.col(f"t_{c}__{m}").alias("target_value"),
                    F.col(f"{c}__{m}")
                    .eqNullSafe(F.col(f"t_{c}__{m}"))
                    .alias("is_match"),
                )
            )
    return (
        pairs.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("column_name", "metric")
    )


def psi_drift(
    source: DataFrame,
    target: DataFrame,
    col: str,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index per bin — distribution drift between
    two snapshots of a numeric column (the standard ML-ops drift gate:
    PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 action). Completes the
    validation ladder: ``agg_compare`` (checksums) -> ``psi_drift``
    (distribution) -> ``table_diff`` (row level), in increasing cost.

    Bin edges are equi-width over the SOURCE min/max (the reference
    distribution defines the binning, the standard PSI convention);
    target values outside that range clamp into the edge bins, NULLs
    are excluded on both sides. Zero-count bins substitute ``eps``
    before the log ratio (the usual clamping). Output: one row per
    bin with range, per-side fractions, and the PSI contribution
    (total PSI = SUM(psi_contrib)).

    Scale shape: one scalar min/max aggregate over the source
    (broadcast back as a 1-row frame), then one map-side-combined
    bucket-count aggregate per side — bin cardinality output, two
    scans total, no row-level shuffle.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    v = F.col(col)
    bounds = source.filter(v.isNotNull()).groupBy().agg(
        F.min(v).cast("double").alias("__lo"),
        F.max(v).cast("double").alias("__hi"),
    )

    def binned(df: DataFrame) -> DataFrame:
        b = F.when(
            F.col("__hi") > F.col("__lo"),
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (v.cast("double") - F.col("__lo"))
                        / ((F.col("__hi") - F.col("__lo")) / bins)
                    ).cast("int"),
                ),
            ),
        ).otherwise(F.lit(0))
        return (
            df.filter(v.isNotNull())
            .join(F.broadcast(bounds))
            .select(b.alias("bin_idx"))
            .groupBy("bin_idx")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    s, t = binned(source), binned(target)
    # dense bin frame so empty bins appear with zero counts
    all_bins = (
        source.sparkSession.range(bins)
        .select(F.col("id").cast("int").alias("bin_idx"))
        .join(F.broadcast(bounds))
        .select(
            "bin_idx",
            (
                F.col("__lo")
                + F.col("bin_idx") * (F.col("__hi") - F.col("__lo")) / bins
            ).alias("bin_lo"),
            (
                F.col("__lo")
                + (F.col("bin_idx") + 1)
                * (F.col("__hi") - F.col("__lo"))
                / bins
            ).alias("bin_hi"),
        )
    )
    joined = (
        all_bins.join(s.withColumnRenamed("n", "__sn"), "bin_idx", "left")
        .join(t.withColumnRenamed("n", "__tn"), "bin_idx", "left")
        .select(
            "bin_idx",
            "bin_lo",
            "bin_hi",
            F.coalesce("__sn", F.lit(0)).alias("__sn"),
            F.coalesce("__tn", F.lit(0)).alias("__tn"),
        )
    )
    stot = F.sum("__sn").over(Window.partitionBy())
    ttot = F.sum("__tn").over(Window.partitionBy())
    p = F.greatest(F.col("__sn").cast("double") / stot, F.lit(eps))
    q = F.greatest(F.col("__tn").cast("double") / ttot, F.lit(eps))
    return (
        joined.select(
            "bin_idx",
            F.round("bin_lo", 6).alias("bin_lo"),
            F.round("bin_hi", 6).alias("bin_hi"),
            F.col("__sn").alias("n_source"),
            F.col("__tn").alias("n_target"),
            F.round(p - q, 6).alias("frac_diff"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
        )
        .orderBy("bin_idx")
    )


def psi_drift_categorical(
    source: DataFrame,
    target: DataFrame,
    col: str,
    top_k: int = 20,
    eps: float = 1e-6,
) -> DataFrame:
    """Categorical PSI: drift over a discrete column's value
    distribution. The source's ``top_k`` most frequent values (ties
    broken by value — a total order, so the cut is deterministic)
    become the categories; everything else, including NULL, folds into
    ``__other__`` — the standard guard against unbounded category
    domains blowing up the report (and, at 100 TB, against a
    high-cardinality column turning a drift check into a giant
    shuffle: the aggregate is map-side combined and the output is
    O(top_k)).
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    v = F.coalesce(F.col(col).cast("string"), F.lit("__null__"))
    top = (
        source.select(v.alias("__v"))
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.col("__n").desc(), F.col("__v").asc())
        .limit(top_k)
        .select("__v")
    )

    def counted(df: DataFrame) -> DataFrame:
        # left join against the (tiny, broadcast) top-k set; misses
        # fold into __other__
        return (
            df.select(v.alias("__v"))
            .join(
                F.broadcast(top.withColumn("__keep", F.lit(True))),
                "__v",
                "left",
            )
            .select(
                F.when(F.col("__keep"), F.col("__v"))
                .otherwise(F.lit("__other__"))
                .alias("category")
            )
            .groupBy("category")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    s = counted(source).withColumnRenamed("n", "__sn")
    t = counted(target).withColumnRenamed("n", "__tn")
    joined = (
        s.join(t, "category", "full_outer")
        .select(
            "category",
            F.coalesce("__sn", F.lit(0)).alias("__sn"),
            F.coalesce("__tn", F.lit(0)).alias("__tn"),
        )
    )
    stot = F.sum("__sn").over(Window.partitionBy())
    ttot = F.sum("__tn").over(Window.partitionBy())
    p = F.greatest(F.col("__sn").cast("double") / stot, F.lit(eps))
    q = F.greatest(F.col("__tn").cast("double") / ttot, F.lit(eps))
    return joined.select(
        "category",
        F.col("__sn").alias("n_source"),
        F.col("__tn").alias("n_target"),
        F.round(p - q, 6).alias("frac_diff"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
    ).orderBy("category")
