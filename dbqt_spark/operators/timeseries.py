"""Time-series operators over the events stream.

North-star extensions beyond the reference surface (the reference's
event tooling stops at per-table profiling): rolling-window anomaly
detection over bucketed counts, and telemetry debounce dedup. Both are
pure window/aggregate plans — no UDFs, one shuffle each — so the 100 TB
cost is the corpus scan plus one exchange on a natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_anomaly(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    lookback: int = 24,
    z_threshold: float = 3.0,
    densify: bool = True,
) -> DataFrame:
    """Hourly-count anomaly flags per key: each hour's event count is
    z-scored against the mean/std of the PRECEDING ``lookback`` hours
    (the bucket itself excluded, so a spike can't mask itself). The
    drift/incident monitor of an ingestion pipeline — a crawler dying,
    a source flooding, a schema break zeroing a feed all surface as
    |z| > threshold rows.

    ``densify`` (default True) fills zero-event hours between each
    key's first and last observed hour with explicit n_events=0 rows
    BEFORE scoring. Without it a dead/zeroed feed produces no (key,
    hour) row at all — the exact incident the monitor exists to catch
    would be invisible — and the row-based lookback window would span
    ``lookback`` OBSERVED buckets rather than wall-clock hours whenever
    the grid has gaps. Hours before a key's first event are not
    fabricated (the key didn't exist yet); a feed dead PAST its last
    observed hour is the monitoring cadence's job — score up to the
    current wall-clock hour by appending a (key, now_hour, 0) seed row
    upstream if that matters.

    Determinism contract: counts are integers (exact in IEEE double up
    to 2^53), rolling sums/sum-of-squares are window sums of integers —
    exact — and the variance is derived once per row via the identical
    expression the DuckDB oracle uses, so mean/std/z hash-match
    bit-for-bit. Built-in STDDEV over a window is deliberately avoided:
    engines disagree on accumulation order for float aggregates.

    Scale shape: one map-side-combined hash aggregation collapses the
    raw scan to (key, hour) rows — output is bounded by
    |keys| x |hours|, thousands of rows per year per key even at
    100 TB of raw events — then the densify grid (sequence + explode,
    bounded by the same |keys| x |hours|) joins that tiny frame, and a
    single window pass scores it. The shuffle moves the aggregated
    frame, not the events.
    """
    hour = F.date_format(
        F.date_trunc("hour", F.col(ts_col)), "yyyy-MM-dd HH:mm:ss"
    )
    hourly = events.groupBy(
        F.col(key_col), hour.alias("hour_ts")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    return score_hourly_counts(
        hourly,
        key_col=key_col,
        lookback=lookback,
        z_threshold=z_threshold,
        densify=densify,
    )


def score_hourly_counts(
    hourly: DataFrame,
    key_col: str = "event_type",
    lookback: int = 24,
    z_threshold: float = 3.0,
    densify: bool = True,
) -> DataFrame:
    """Score a pre-bucketed (key, hour_ts, n_events) frame — the shared
    back half of ``rolling_anomaly`` and the streaming twin
    (streaming/anomaly.py), so batch and stream flag the identical
    anomalies (and fill the identical zero-event hours — densify lives
    HERE so neither twin can drift) by construction."""
    if densify:
        ts = F.to_timestamp("hour_ts", "yyyy-MM-dd HH:mm:ss")
        grid = (
            hourly.groupBy(key_col)
            .agg(
                F.min(ts).alias("__lo"),
                F.max(ts).alias("__hi"),
            )
            .select(
                key_col,
                F.explode(
                    F.sequence(
                        "__lo", "__hi", F.expr("interval 1 hour")
                    )
                ).alias("__h"),
            )
            .select(
                key_col,
                F.date_format("__h", "yyyy-MM-dd HH:mm:ss").alias(
                    "hour_ts"
                ),
            )
        )
        hourly = grid.join(hourly, [key_col, "hour_ts"], "left").select(
            key_col,
            "hour_ts",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        )
    w = (
        Window.partitionBy(key_col)
        .orderBy("hour_ts")
        .rowsBetween(-lookback, -1)
    )
    x = F.col("n_events").cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    s = F.sum(x).over(w)
    sq = F.sum(x * x).over(w)
    mean = s / n
    # Sample variance from exact integer sums; clamped at 0 for the
    # all-equal window where fp cancellation can go slightly negative.
    var = F.greatest(
        (sq - s * s / n) / (n - F.lit(1.0)), F.lit(0.0)
    )
    std = F.sqrt(var)
    z = F.when(
        (n >= 2) & (std > 0), (x - mean) / std
    )
    return hourly.select(
        key_col,
        "hour_ts",
        "n_events",
        F.round(F.when(n >= 1, mean), 4).alias("roll_mean"),
        F.round(F.when(n >= 2, std), 4).alias("roll_std"),
        F.round(z, 4).alias("zscore"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias(
            "is_anomaly"
        ),
    )


def window_dedup(
    events: DataFrame,
    gap_seconds: int = 300,
    ts_col: str = "ts",
    key_cols: tuple = ("user_id", "event_type"),
    id_col: str = "event_id",
) -> DataFrame:
    """Debounce dedup for telemetry: drop an event when the SAME key
    emitted its previous event within ``gap_seconds`` (retry storms,
    double-clicks, at-least-once replays). Lag-against-previous-arrival
    semantics — each event is compared to its immediate predecessor in
    (ts, id) order, so the plan is ONE window pass; the alternative
    "previous *kept* event" debounce is inherently sequential per key
    and is what streaming/dedup.py's stateful path provides.

    Deterministic: the order key is (ts, id) — a total order even for
    equal timestamps — and the gap test uses exact integer microsecond
    arithmetic (``unix_micros``), no float time math.

    Scale shape: one shuffle on the key columns, then a sorted window
    scan per partition. Key cardinality (users x types) is high, so the
    exchange spreads evenly; no aggregation state beyond one lag value.
    """
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        ts_col, id_col
    )
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    return (
        events.withColumn("__prev_us", prev)
        .filter(
            F.col("__prev_us").isNull()
            | (us - F.col("__prev_us") > gap_seconds * 1_000_000)
        )
        .drop("__prev_us")
    )


def feed_gaps(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Per-key feed-coverage report over the hourly grid: between each
    key's first and last active hour, how many hourly buckets exist,
    how many have data, how many gap RUNS occur, and the longest gap —
    the go-look-here companion to ``rolling_anomaly`` (which scores
    counts hour by hour; this summarizes whole outage windows per
    feed). Output: (key, first_hour, last_hour, n_hours_expected,
    n_hours_present, n_hours_missing, n_gaps, longest_gap_hours,
    coverage), hour bounds as 'yyyy-MM-dd HH:mm:ss' strings (the
    engine-portable convention every hourly query here uses; the
    session timezone is pinned UTC), coverage rounded to 4.

    All arithmetic is exact integers on epoch hours. Scale shape: the
    raw events collapse map-side to DISTINCT (key, hour) — the only
    corpus-sized shuffle, keyed by (key, hour) so a hot feed spreads
    across partitions. The consecutive-hour lag window then runs per
    key over the DISTINCT grid (bounded by hours-in-range, ~9k rows
    per key-year — never event volume), and one final per-key rollup
    emits the report."""
    hour = (F.unix_timestamp(F.col(ts_col)) / 3600).cast("long")
    grid = (
        events.filter(F.col(ts_col).isNotNull())
        .select(F.col(key_col).alias("key"), hour.alias("__h"))
        .distinct()
    )
    w = Window.partitionBy("key").orderBy("__h")
    gaps = grid.select(
        "key",
        "__h",
        (F.col("__h") - F.lag("__h", 1).over(w)).alias("__step"),
    )
    return (
        gaps.groupBy("key")
        .agg(
            F.min("__h").alias("__lo"),
            F.max("__h").alias("__hi"),
            F.count(F.lit(1)).cast("long").alias("n_hours_present"),
            F.sum(
                F.when(F.col("__step") > 1, 1).otherwise(0)
            ).cast("long").alias("n_gaps"),
            F.coalesce(
                F.max(
                    F.when(F.col("__step") > 1, F.col("__step") - 1)
                ),
                F.lit(0),
            ).cast("long").alias("longest_gap_hours"),
        )
        .select(
            "key",
            F.date_format(
                F.timestamp_seconds(F.col("__lo") * 3600),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("first_hour"),
            F.date_format(
                F.timestamp_seconds(F.col("__hi") * 3600),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("last_hour"),
            (F.col("__hi") - F.col("__lo") + 1)
            .cast("long")
            .alias("n_hours_expected"),
            "n_hours_present",
            (F.col("__hi") - F.col("__lo") + 1 - F.col("n_hours_present"))
            .cast("long")
            .alias("n_hours_missing"),
            "n_gaps",
            "longest_gap_hours",
            F.round(
                F.col("n_hours_present").cast("double")
                / (F.col("__hi") - F.col("__lo") + 1),
                4,
            ).alias("coverage"),
        )
        .orderBy("key")
    )
