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
