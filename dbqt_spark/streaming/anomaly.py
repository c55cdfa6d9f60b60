"""Streaming rate-anomaly monitor: watermarked hourly counts from the
event stream, scored against each key's trailing baseline.

No reference analog (dbqt has no streaming surface — SURVEY.md §1.4).
Split follows the module's stream/batch-twin pattern
(streaming/checks.py): the hourly bucketing is a windowed streaming
aggregation (stateful, watermark-bounded), while the z-scoring is the
SAME batch scorer the batch twin uses
(operators/timeseries.py ``score_hourly_counts``) run over the
accumulated buckets — rolling statistics across closed windows are a
relational window function, not per-event state, so pushing them into
the stream would just rebuild a worse window operator.

Production shape at scale: the streaming half writes CLOSED windows
(append mode past the watermark) into a bucket store partitioned by
date; the scorer is a scheduled batch query over the trailing
``lookback`` hours of that store — O(keys x lookback) rows, trivial at
any corpus size. State in the stream is bounded by watermark x key
cardinality. The complete-mode in-memory drain below is the
deterministic test/oracle execution of the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_count_stream(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Tumbling 1-hour counts per key; works on static and streaming
    frames (pass ``watermark`` for streams — bounds the window state)."""
    if watermark and events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), "1 hour")
    return (
        events.groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col(key_col),
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                "hour_ts"
            ),
            "n_events",
        )
    )


def streaming_anomaly(
    spark: SparkSession,
    events_path: str,
    key_col: str = "event_type",
    lookback: int = 24,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Drain the parquet-backed event stream through the watermarked
    hourly-count aggregation, then score every bucket with the shared
    batch scorer. Deterministic (availableNow over a static source,
    complete mode), so the batch SQL twin is a valid oracle."""
    from ..operators.timeseries import score_hourly_counts
    from .checks import (
        normalize_event_ts,
        run_stream_once,
        stream_events_from_parquet,
    )

    raw_schema = spark.read.parquet(events_path).schema
    stream = stream_events_from_parquet(spark, events_path, schema=raw_schema)

    def transform(df: DataFrame) -> DataFrame:
        return hourly_count_stream(normalize_event_ts(df), key_col=key_col)

    rows = run_stream_once(stream, transform, output_mode="complete")
    hourly = spark.createDataFrame(
        rows, f"{key_col} string, hour_ts string, n_events long"
    )
    return score_hourly_counts(
        hourly, key_col=key_col, lookback=lookback, z_threshold=z_threshold
    )
