"""Data repair — the fix-it half of the quality tooling.

Beyond the reference surface: dbqt DETECTS problems (null columns,
low-distinct, type mismatches, failed checks) and stops there. The
pipelines that consume those reports then need the standard repairs,
each as a deterministic single-scan DataFrame program:

- ``impute_nulls`` — fill NULLs with a per-group (or global) statistic;
- ``clip_outliers`` — winsorize numeric columns at exact quantiles
  (the repair twin of ``profile.zscore_outliers``' detection);
- ``safe_cast`` / ``cast_report`` — lossy-type migration via
  ``try_cast`` with per-column failure accounting (the repair twin of
  colcompare's Different Types verdicts).

Scale shape: every statistic comes from ONE bounded aggregate (exact
percentile/mean over the stats job; at 100 TB switch strategy="mean"
or pre-aggregate with approx_percentile — the profile family shows
both arms), folded back as plan literals or a broadcast per-group
frame; the repair itself is a narrow projection. Nothing here shuffles
the corpus.

Determinism: means use the DECIMAL-sum trick (order-independent),
medians the same linear-interpolation ``percentile`` the SLA report
uses (Spark percentile == DuckDB quantile_cont), so a DuckDB oracle
reproduces every repaired value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STRATEGIES = ("median", "mean", "constant")


def _spark_round(spark, vals: "list[float | None]", round_to: int):
    """Round driver-held doubles with SPARK's round (HALF_UP over the
    shortest-decimal form) via one local-relation job — Python's
    round() is banker's and diverges at .5 boundaries, which would
    break the bit-for-bit routing contract."""
    idx = [i for i, v in enumerate(vals) if v is not None]
    if not idx:
        return list(vals)
    row = (
        spark.range(1)
        .select(
            *[
                F.round(F.lit(vals[i]), round_to).alias(f"c{i}")
                for i in idx
            ]
        )
        .collect()[0]
    )
    out = list(vals)
    for i in idx:
        out[i] = row[f"c{i}"]
    return out


def _group_quantile_stats(
    df: DataFrame,
    cols: "list[str]",
    group_col: str,
    qs: "list[float]",
    aliases,
    round_to: int,
) -> DataFrame:
    """Per-group exact quantiles for several columns via the
    bounded-memory grouped refinement engine, shaped like the buffering
    ``groupBy().agg()`` frame: one row per group ``__g`` with
    ``aliases(col, q)``-named, Spark-rounded stat columns. Groups where
    a column is all-NULL simply lack that column's rows — the outer
    assembly leaves NULL, matching the buffering aggregate."""
    from .profile import scalable_group_percentiles

    stats = None
    for c in cols:
        part = scalable_group_percentiles(df, c, group_col, qs=qs)
        wide = None
        for q in qs:
            one = part.filter(F.col("q") == F.lit(float(q))).select(
                F.col(group_col).alias("__g"),
                F.round(F.col("value"), round_to).alias(aliases(c, q)),
            )
            wide = one if wide is None else wide.join(
                one.withColumnRenamed("__g", "__g_r"),
                F.col("__g").eqNullSafe(F.col("__g_r")),
                "full",
            ).select(
                F.coalesce(F.col("__g"), F.col("__g_r")).alias("__g"),
                *[
                    x
                    for x in (wide.columns + one.columns)
                    if x not in ("__g", "__g_r")
                ],
            )
        stats = wide if stats is None else stats.join(
            wide.withColumnRenamed("__g", "__g_r"),
            F.col("__g").eqNullSafe(F.col("__g_r")),
            "full",
        ).select(
            F.coalesce(F.col("__g"), F.col("__g_r")).alias("__g"),
            *[
                x
                for x in (stats.columns + wide.columns)
                if x not in ("__g", "__g_r")
            ],
        )
    return stats


def _require_numeric(df: DataFrame, cols: "list[str]") -> None:
    """Fail on the driver with the real reason instead of letting
    ``percentile``/decimal sums surface an opaque analysis error mid-
    job when a string column slips into a numeric repair."""
    from pyspark.sql.types import NumericType

    types = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if c not in types:
            raise ValueError(f"column {c!r} not found")
        if not isinstance(types[c], NumericType):
            raise ValueError(
                f"column {c!r} is {types[c].simpleString()}; numeric "
                "repair needs a numeric column (cast first — "
                "safe_cast/cast_report are the migration tools)"
            )


def impute_nulls(
    df: DataFrame,
    cols: "list[str]",
    strategy: str = "median",
    group_col: "str | None" = None,
    fill_value: "float | None" = None,
    round_to: int = 6,
    percentile_mode: str = "auto",
) -> DataFrame:
    """Replace NULLs in numeric ``cols`` with the column's statistic —
    per ``group_col`` value when given (a NULL group is its own group),
    global otherwise. ``strategy="constant"`` uses ``fill_value``. A
    group whose statistic is itself NULL (all-NULL column in that
    group) leaves its NULLs in place — inventing a value there would
    be fabrication, not repair.

    Medians are SIZE-GATED (``percentile_mode``, ``profile.
    route_percentiles_scalable``): above the plan-size bound the
    buffering ``percentile`` swaps for the bounded-memory refinement
    engine — bit-identical values, so the repair output is the same
    either way."""
    if strategy not in _STRATEGIES:
        raise ValueError(
            f"strategy must be one of {_STRATEGIES}, got {strategy!r}"
        )
    _require_numeric(df, cols)
    from .profile import route_percentiles_scalable

    scalable = strategy == "median" and route_percentiles_scalable(
        df, percentile_mode
    )
    if strategy == "constant":
        if fill_value is None:
            raise ValueError("strategy='constant' needs fill_value")
        out = df
        for c in cols:
            out = out.withColumn(
                c, F.coalesce(F.col(c), F.lit(float(fill_value)))
            )
        return out

    def _stat(c: str):
        if strategy == "mean":
            return F.round(
                F.sum(F.round(F.col(c).cast("double"), 7).cast(
                    "decimal(25,8)"
                )).cast("double")
                / F.count(F.col(c)),
                round_to,
            )
        return F.round(F.expr(f"percentile({c}, 0.5)"), round_to)

    aggs = [_stat(c).alias(f"__fill_{c}") for c in cols]
    if group_col is None:
        if scalable:
            from .profile import scalable_percentiles

            raw = [
                scalable_percentiles(df, c, qs=(0.5,)).collect()[0][
                    "value"
                ]
                for c in cols
            ]
            fills = _spark_round(df.sparkSession, raw, round_to)
        else:
            row = df.agg(*aggs).collect()[0]
            fills = [row[f"__fill_{c}"] for c in cols]
        out = df
        for c, fill in zip(cols, fills):
            if fill is not None:
                out = out.withColumn(
                    c, F.coalesce(F.col(c), F.lit(float(fill)))
                )
        return out
    # no broadcast hint: group stats are one row per group, usually
    # tiny, but a high-cardinality group column must not become a
    # forced driver-side broadcast — AQE picks from the measured size
    if scalable:
        stats = _group_quantile_stats(
            df, cols, group_col, [0.5],
            lambda c, q: f"__fill_{c}", round_to,
        )
    else:
        stats = df.groupBy(F.col(group_col).alias("__g")).agg(*aggs)
    joined = df.join(
        stats, F.col(group_col).eqNullSafe(F.col("__g")), "left"
    )
    out_cols = []
    for c in df.columns:
        if c in cols:
            out_cols.append(
                F.coalesce(F.col(c), F.col(f"__fill_{c}")).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def clip_outliers(
    df: DataFrame,
    cols: "list[str]",
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    group_col: "str | None" = None,
    round_to: int = 6,
    percentile_mode: str = "auto",
) -> DataFrame:
    """Winsorize: cap each column at its exact [lower_q, upper_q]
    quantiles (per group when ``group_col`` is given) — the standard
    heavy-tail repair before aggregation/training. NULLs stay NULL
    (clipping is not imputation). Quantiles are SIZE-GATED exactly
    like ``impute_nulls`` — the big arm never buffers a column."""
    if not 0.0 <= lower_q < upper_q <= 1.0:
        raise ValueError(
            f"need 0 <= lower_q < upper_q <= 1, got {lower_q}/{upper_q}"
        )
    _require_numeric(df, cols)
    from .profile import route_percentiles_scalable

    scalable = route_percentiles_scalable(df, percentile_mode)
    aggs = []
    for c in cols:
        aggs.append(
            F.round(F.expr(f"percentile({c}, {lower_q})"), round_to)
            .alias(f"__lo_{c}")
        )
        aggs.append(
            F.round(F.expr(f"percentile({c}, {upper_q})"), round_to)
            .alias(f"__hi_{c}")
        )

    def _clip(c: str, lo, hi):
        x = F.col(c).cast("double")
        return F.when(
            x.isNotNull() & lo.isNotNull() & hi.isNotNull(),
            F.least(F.greatest(x, lo), hi),
        ).otherwise(x)

    if group_col is None:
        if scalable:
            from .profile import scalable_percentiles

            raw = []
            for c in cols:
                vals = {
                    r["q"]: r["value"]
                    for r in scalable_percentiles(
                        df, c, qs=(lower_q, upper_q)
                    ).collect()
                }
                raw += [vals[float(lower_q)], vals[float(upper_q)]]
            rounded = _spark_round(df.sparkSession, raw, round_to)
            bounds = {
                c: (rounded[2 * i], rounded[2 * i + 1])
                for i, c in enumerate(cols)
            }
        else:
            row = df.agg(*aggs).collect()[0]
            bounds = {
                c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols
            }
        out = df
        for c in cols:
            lo = F.lit(bounds[c][0]).cast("double")
            hi = F.lit(bounds[c][1]).cast("double")
            out = out.withColumn(c, _clip(c, lo, hi))
        return out
    if scalable:
        stats = _group_quantile_stats(
            df, cols, group_col, [lower_q, upper_q],
            lambda c, q: (
                f"__lo_{c}" if q == lower_q else f"__hi_{c}"
            ),
            round_to,
        )
    else:
        stats = df.groupBy(F.col(group_col).alias("__g")).agg(*aggs)
    joined = df.join(
        stats, F.col(group_col).eqNullSafe(F.col("__g")), "left"
    )
    out_cols = []
    for c in df.columns:
        if c in cols:
            out_cols.append(
                _clip(c, F.col(f"__lo_{c}"), F.col(f"__hi_{c}")).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def safe_cast(df: DataFrame, casts: "dict[str, str]") -> DataFrame:
    """Cast columns with ``try_cast`` — unparseable values become NULL
    instead of failing the job (ANSI mode's behavior contract for a
    migration). Pair with ``cast_report`` to count what was lost."""
    out = df
    for c, t in casts.items():
        out = out.withColumn(c, F.expr(f"try_cast({c} AS {t})"))
    return out


def cast_report(df: DataFrame, casts: "dict[str, str]") -> DataFrame:
    """(column, target_type, n_rows, n_nonnull, n_failed) per cast —
    n_failed counts values that were present but did not survive
    ``try_cast`` (the would-be data loss of a type migration). One
    scan for every column."""
    aggs = []
    for c, t in casts.items():
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(
            F.count(F.expr(f"try_cast({c} AS {t})")).alias(f"__ok_{c}")
        )
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs).collect()[0]
    spark = df.sparkSession
    rows = [
        (
            c,
            t,
            int(row["__n"]),
            int(row[f"__nn_{c}"]),
            int(row[f"__nn_{c}"]) - int(row[f"__ok_{c}"]),
        )
        for c, t in casts.items()
    ]
    return spark.createDataFrame(
        rows,
        "column string, target_type string, n_rows bigint, "
        "n_nonnull bigint, n_failed bigint",
    )
