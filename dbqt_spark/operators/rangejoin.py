"""Binned range (interval) join — a scalable equi-join conversion of the
point-in-interval join Spark would otherwise plan as a nested-loop product
(no reference analog; north-star extension alongside the as-of join).

``value BETWEEN lo AND hi`` against an interval table is a non-equi
predicate: Catalyst's only general plan is BroadcastNestedLoopJoin (fine
for a broadcast-size dim, O(n*m) otherwise). The standard large-large
strategy — used by every warehouse range-join optimization (e.g.
Databricks' range-join hints, Trino's spatial partitioning) — converts it
to an equi-join on fixed-width *bins*: each interval is exploded to the
bins it overlaps, each fact value hashes to exactly one bin, the join key
is the bin id, and a residual filter re-checks exact containment.

Shuffle profile: one hash shuffle per side on the bin id; interval rows
are duplicated ``(hi-lo)/bin_width + 1`` times (pick ``bin_width`` near
the median interval width to keep that small); never a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    fact: DataFrame,
    value_col: str,
    intervals: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to every interval row with
    ``lo <= fact[value_col] <= hi`` (inclusive both ends, like SQL
    BETWEEN). Overlapping intervals yield one output row per match.

    ``how='inner'`` (default) or ``'left'`` (keep unmatched fact rows with
    NULL interval columns)."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type: {how}")
    binned_ivl = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width).cast("long"),
                F.floor(F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    binned_fact = fact.withColumn(
        "__bin", F.floor(F.col(value_col) / bin_width).cast("long")
    )
    contained = (F.col(value_col) >= F.col(lo_col)) & (
        F.col(value_col) <= F.col(hi_col)
    )
    if how == "inner":
        return binned_fact.join(binned_ivl, "__bin").filter(contained).drop("__bin")
    # left: equi-join on the bin PLUS the residual as join condition so
    # unmatched fact rows keep NULL interval columns (a post-filter would
    # wrongly drop them)
    cond = (binned_fact["__bin"] == binned_ivl["__bin"]) & contained
    out = binned_fact.join(binned_ivl, cond, "left")
    return out.drop(binned_fact["__bin"]).drop(binned_ivl["__bin"])
