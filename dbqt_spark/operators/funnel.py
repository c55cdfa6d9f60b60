"""Ordered event-funnel analysis over an event stream.

Beyond the reference surface (north star): the classic product/ops
question "of the users who did A, how many went on to do B, then C?"
with ORDER semantics — step i counts only if it happens at-or-after the
user's chosen step i-1 time (first-touch attribution: each step binds
to its EARLIEST qualifying occurrence).

Shape: ONE scan, ONE shuffle (hash partition by user), then a chain of
unordered per-user window minimums — step i's column references step
i-1's, so Catalyst stacks Window nodes over the same partitioning with
no extra Exchange and no per-user sort (unordered frames need none).
The per-user funnel rows collapse with a groupBy(user) and the final
output is one tiny row per step. No joins, no self-reads of the event
table, no driver state — at 100 TB this is a single pass over events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: "list[str]",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(step_index, step, n_users, pct_of_first) — users reaching each
    funnel stage in order. ``pct_of_first`` is the conversion rate
    relative to stage 1, rounded to 2 places (100.0 for stage 1;
    0/0 -> 0.0 when nobody reached stage 1)."""
    from pyspark.sql import Window

    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {steps!r}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")

    w = Window.partitionBy(user_col)
    cur = df.select(user_col, type_col, ts_col)
    prev_t = None
    t_cols = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev_t is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev_t))
        name = f"__t{i}"
        cur = cur.withColumn(
            name, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev_t = name
        t_cols.append(name)

    per_user = cur.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in t_cols]
    )
    counts = per_user.agg(
        *[
            F.count(c).cast("long").alias(f"__n{i}")
            for i, c in enumerate(t_cols)
        ]
    )
    rows = []
    for i, step in enumerate(steps):
        rows.append(
            F.struct(
                F.lit(i + 1).cast("int").alias("step_index"),
                F.lit(step).alias("step"),
                F.col(f"__n{i}").alias("n_users"),
                F.when(
                    F.col("__n0") > 0,
                    F.round(
                        F.col(f"__n{i}").cast("double")
                        / F.col("__n0") * 100.0,
                        2,
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("pct_of_first"),
            )
        )
    return (
        counts.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("step_index")
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Weekly cohort retention: users grouped by their FIRST-activity
    week (Monday-truncated), then for each later week the fraction of
    the cohort still active — (cohort_week, week_offset, n_active,
    retention_pct). Offset 0 is the cohort itself (100% by
    construction); ``max_offset`` optionally bounds the matrix width.

    Shape: one scan -> per-user min-week aggregate + distinct
    (user, week) activity pairs (both hash-partition on the user) ->
    join on user -> tiny (cohort, offset) aggregate. Cohort sizes come
    from the offset-0 rows of the SAME aggregate (no second pass), and
    join back by broadcast — the matrix is weeks x weeks, never
    corpus-sized.
    """
    week = F.date_format(
        F.date_trunc("week", F.col(ts_col)), "yyyy-MM-dd"
    )
    activity = df.select(
        F.col(user_col).alias("u"), week.alias("wk")
    ).distinct()
    cohorts = activity.groupBy("u").agg(F.min("wk").alias("cohort_week"))
    joined = activity.join(cohorts, "u").select(
        "cohort_week",
        (
            F.datediff(F.to_date("wk"), F.to_date("cohort_week")) / 7
        )
        .cast("long")
        .alias("week_offset"),
        "u",
    )
    if max_offset is not None:
        joined = joined.filter(F.col("week_offset") <= max_offset)
    counts = joined.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("u").alias("n_active")
    )
    sizes = counts.filter(F.col("week_offset") == 0).select(
        F.col("cohort_week").alias("__cw"),
        F.col("n_active").alias("__size"),
    )
    return (
        counts.join(
            F.broadcast(sizes), F.col("cohort_week") == F.col("__cw")
        )
        .select(
            "cohort_week",
            "week_offset",
            F.col("n_active").cast("long").alias("n_active"),
            F.round(
                F.col("n_active").cast("double") / F.col("__size") * 100.0,
                2,
            ).alias("retention_pct"),
        )
        .orderBy("cohort_week", "week_offset")
    )
