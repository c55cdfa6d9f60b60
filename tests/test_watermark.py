"""Watermark late-data semantics: append-mode windowed aggregation must
drop events that arrive after the watermark has passed their window."""

import os
import time
import uuid
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write_events(path: str, rows: list[tuple[int, datetime]], mtime: float):
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(t, path)
    os.utime(path, (mtime, mtime))


def test_append_mode_drops_late_events(spark, tmp_path):
    d = str(tmp_path / "stream")
    os.makedirs(d)
    now = time.time()
    # batch 1: two events in the 10:00 window, one at 12:00 that will
    # advance the watermark past the 10:00 window's end
    _write_events(
        os.path.join(d, "f1.parquet"),
        [
            (1, datetime(2024, 1, 1, 10, 0, 0)),
            (1, datetime(2024, 1, 1, 10, 30, 0)),
            (1, datetime(2024, 1, 1, 12, 0, 0)),
        ],
        now - 100,
    )
    # batch 2: advances processing one more batch so the 11:50 watermark
    # evicts + emits the 10:00 window
    _write_events(
        os.path.join(d, "f2.parquet"),
        [(1, datetime(2024, 1, 1, 12, 5, 0))],
        now - 50,
    )
    # batch 3: a LATE event for the already-evicted 10:00 window (far
    # beyond the 10-minute watermark) -> must be dropped. NOTE the row
    # must arrive a batch AFTER the watermark passed: Spark's watermark
    # is a lower-bound guarantee — eviction happens at the end of the
    # batch where the watermark crossed the window end, and a late row
    # arriving in that same batch still merges.
    _write_events(
        os.path.join(d, "f3.parquet"),
        [(1, datetime(2024, 1, 1, 10, 45, 0))],
        now - 20,
    )

    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("start"), "n")
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    rows = {
        (r["start"].hour, r["n"]) for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    # only the 10:00 window is past the watermark and emitted; the late
    # 10:45 event did NOT bump its count (n=2, not 3); the 12:00 window
    # is still open and not emitted in append mode
    assert rows == {(10, 2)}
