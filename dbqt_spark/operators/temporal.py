"""Temporal operators: as-of join, gap sessionization, time rollup.

Beyond the reference surface (north star): the reference has no
time-series operators at all (SURVEY §1.4), but a training-data /
event-analytics pipeline needs the three classics — point-in-time
feature attachment (as-of join), gap-based session assignment, and
multi-granularity rollups. All three are expressed as single-shuffle
DataFrame programs (window functions + grouping sets) — no UDFs, no
driver loops — so Catalyst/Tungsten keep them whole-stage-codegen'd and
map-side-combined at any scale.

Scale notes shared by the window-based operators (asof_join,
sessionize): the one shuffle hashes on the entity key; a single
pathological key (one user owning a measurable fraction of all events)
serializes that key's partition — the classic window-skew caveat. The
standard mitigations (range re-chunking with boundary merge) cost a
second shuffle and are NOT applied by default; at profiled-skew corpora
split such keys upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: "list[str]",
    tolerance_seconds: "int | None" = None,
) -> DataFrame:
    """Backward as-of join: every left row gains the payload of the
    LATEST right row with the same key and ``right_ts <= left_ts``
    (inclusive), or NULLs when no prior right row exists (left-join
    semantics). ``tolerance_seconds`` additionally voids matches older
    than the window (pandas ``merge_asof`` contract).

    Contract: (``on``, ``right_ts``) pairs must be unique on the right
    side — as-of tie order is otherwise engine-defined; pre-aggregate
    duplicates (see the ``asof_enriched`` query for the pattern).

    Spark-first shape — the UNION-AND-CARRY plan, not a range join and
    not ``merge_asof`` in a UDF: both sides union into one frame tagged
    by side, one window partitioned by key and ordered by (ts, side —
    right rows sort BEFORE left rows at equal ts, making the match
    inclusive) carries the last non-null right payload forward
    (``F.last(ignorenulls=True)``, rows-unbounded-preceding), then left
    rows are kept. ONE hash shuffle on the key; contrast a naive
    range-condition join, which Spark executes as broadcast-nested-loop
    (O(n*m) comparisons), or per-key ``applyInPandas``, which pays
    Arrow transfer for what codegen does in place.
    """
    lcols = [c for c in left.columns]
    sides = []
    sides.append(
        right.select(
            F.col(on).alias("__k"),
            F.col(right_ts).alias("__ts"),
            F.lit(0).alias("__side"),
            F.col(right_ts).alias("__rts"),
            *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
            *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
              for c in lcols],
        )
    )
    sides.append(
        left.select(
            F.col(on).alias("__k"),
            F.col(left_ts).alias("__ts"),
            F.lit(1).alias("__side"),
            F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
            *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}")
              for c in payload_cols],
            *[F.col(c).alias(f"__l_{c}") for c in lcols],
        )
    )
    u = sides[0].unionByName(sides[1])
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "__side",
        "__ts",
        *[F.col(f"__l_{c}") for c in lcols],
        F.last("__rts", ignorenulls=True).over(w).alias("__m_ts"),
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in payload_cols
        ],
    ).filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        in_window = (
            F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__m_ts"))
        ) <= F.lit(int(tolerance_seconds) * 1_000_000)
    else:
        in_window = F.lit(True)
    keep = F.col("__m_ts").isNotNull() & in_window
    return carried.select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[
            F.when(keep, F.col(f"__m_{c}")).alias(c)
            for c in payload_cols
        ],
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based session assignment + per-session aggregate: a new
    session starts when a user's inter-event gap exceeds
    ``gap_minutes``. Output: one row per session — (user_id,
    session_idx 1..n in time order, session_start, session_end,
    n_events), totally ordered by (user_id, session_idx).

    The batch twin of ``streaming/sessions.py`` (which holds open
    sessions in ``applyInPandasWithState``); batch needs no state —
    the classic two-window program: lag() marks session starts, a
    running sum numbers them, one groupBy aggregates. All three steps
    reuse ONE hash shuffle on the user key (same partitioning, no
    re-exchange; the groupBy is partial-aggregated). Gap arithmetic is
    integer microseconds (``unix_micros``) — exact, engine-portable.
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    marked = df.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(id_col),
        F.when(prev.isNull() | ((us - prev) > gap_us), F.lit(1))
        .otherwise(F.lit(0))
        .alias("__new"),
    )
    numbered = marked.select(
        user_col,
        ts_col,
        F.sum("__new")
        .over(
            Window.partitionBy(user_col)
            .orderBy(ts_col, id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("session_idx"),
    )
    return (
        numbered.groupBy(user_col, "session_idx")
        .agg(
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .orderBy(user_col, "session_idx")
    )


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Multi-granularity rollup in ONE scan: per ``group_col``, event
    counts and value sums at hour grain, day grain, and the group total
    — GROUPING SETS, so the fact table is read and partial-aggregated
    once instead of once per grain (the 100 TB win: three scans -> one;
    the hour-grain partials subsume the coarser grains' work in the
    same shuffle). Output: (grain 'hour'|'day'|'type', event_type,
    bucket as formatted string or NULL at type grain, n_events,
    sum_value rounded to 4), totally ordered.
    """
    hour_b = F.date_trunc("hour", F.col(ts_col))
    day_b = F.date_trunc("day", F.col(ts_col))
    base = df.select(
        F.col(group_col),
        hour_b.alias("__hour"),
        day_b.alias("__day"),
        F.col(value_col).alias("__v"),
    )
    rolled = base.groupingSets(
        [[group_col, "__day", "__hour"], [group_col, "__day"], [group_col]],
        group_col,
        "__day",
        "__hour",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("__v"), 4).alias("sum_value"),
        F.grouping("__hour").alias("__gh"),
        F.grouping("__day").alias("__gd"),
    )
    grain = (
        F.when(F.col("__gh") == 0, F.lit("hour"))
        .when(F.col("__gd") == 0, F.lit("day"))
        .otherwise(F.lit("type"))
    )
    bucket = F.when(
        F.col("__gh") == 0,
        F.date_format("__hour", "yyyy-MM-dd HH:mm:ss"),
    ).when(
        F.col("__gd") == 0,
        F.date_format("__day", "yyyy-MM-dd HH:mm:ss"),
    )
    return (
        rolled.select(
            grain.alias("grain"),
            F.col(group_col),
            bucket.alias("bucket"),
            "n_events",
            "sum_value",
        )
        .orderBy("grain", group_col, "bucket")
    )
