"""Streaming data-quality checks over an event stream.

No reference analog (dbqt has no streaming surface — SURVEY.md §1.4); this
is the north-star Structured Streaming slice: the same quality checks the
batch engine runs (row counts, null profile, low-distinct) expressed over
tumbling event-time windows with watermark-based late-data handling.

Design: the window aggregation logic is a pure DataFrame transform shared
by batch and streaming callers — in batch it runs over a static frame, in
streaming over ``readStream`` micro-batches. This is the standard
Spark pattern (one logical plan, two execution modes) and keeps the
streaming path oracle-checkable through its batch twin.

Scale notes: stateful windowed aggregation shuffles on (window, keys);
watermark bounds state size. At 100 TB/day the state store needs RocksDB
(``spark.sql.streaming.stateStore.providerClass``) and the output sink
should be partitioned by window date.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_profile(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window quality profile: per (window, key) row count, null
    count of the value column, and min/max event time. Works on both
    static and streaming DataFrames; pass ``watermark`` for streams."""
    if watermark and events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration)
    return (
        events.groupBy(win.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col(value_col).isNull(), 1)).alias("n_null_values"),
            F.min(ts_col).alias("first_event"),
            F.max(ts_col).alias("last_event"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "n_null_values",
            "first_event",
            "last_event",
        )
    )


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Coerce an event-time column to TIMESTAMP whatever shape it arrived
    in: parquet TIMESTAMP(NANOS) read as long (nanosAsLong), parquet
    micros without isAdjustedToUTC read as TIMESTAMP_NTZ, or already
    TIMESTAMP. Watermarks/windows/unix_micros all require TIMESTAMP; the
    NTZ cast is value-identical only under a UTC session timezone, so it
    is enforced here rather than assumed (ADVICE r5)."""
    from pyspark.sql.types import LongType, TimestampNTZType

    t = next(f.dataType for f in df.schema.fields if f.name == ts_col)
    if isinstance(t, LongType):
        # integer div: ~1e18 nanos exceeds double's 53-bit mantissa
        return df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
        )
    if isinstance(t, TimestampNTZType):
        from ..catalog import ensure_utc

        # GLOBAL session side effect, documented at catalog.ensure_utc
        ensure_utc(df.sparkSession)
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def stream_events_from_parquet(
    spark: SparkSession, path: str, schema=None, spread: bool = False
) -> DataFrame:
    """File-source stream over a parquet directory (one file per
    micro-batch by default). Schema must be provided for streaming reads;
    derive it from a batch read when absent. A single-file path streams
    via its parent directory + pathGlobFilter (file sources require a
    directory basePath).

    ``spread=True`` round-robins each micro-batch across the cluster
    before downstream transforms — for gates whose pre-state map is
    heavy (the ~40-op URL canonicalization chain), a one-file trigger
    otherwise runs it on a single core. This is a per-micro-batch
    redistribution bounded by the trigger size, valid at any scale;
    leave it off for cheap pass-through streams where the extra
    exchange costs more than it buys."""
    import os

    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    out = reader.parquet(path)
    if spread:
        out = out.repartition(
            2 * spark.sparkContext.defaultParallelism
        )
    return out


def run_stream_once(
    stream_df: DataFrame,
    transform,
    output_mode: str = "complete",
    timeout_sec: int = 120,
) -> list:
    """Execute a streaming transform with the availableNow trigger (drain
    everything currently in the source, then stop) into an in-memory sink
    and return the collected rows — the batch-equivalent execution used by
    tests and oracles."""
    import uuid

    name = f"dbqt_stream_{uuid.uuid4().hex[:8]}"
    q = (
        transform(stream_df)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()
    spark = stream_df.sparkSession
    return spark.sql(f"SELECT * FROM {name}").collect()
