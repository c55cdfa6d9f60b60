"""Structured Streaming checks: the streaming windowed profile must equal
its batch twin (stream/batch equivalence is the correctness contract)."""

from pyspark.sql import functions as F

from dbqt_spark.catalog import load_table
from dbqt_spark.streaming.checks import windowed_event_profile


def test_windowed_profile_batch(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    prof = windowed_event_profile(ev, "1 hour")
    rows = prof.collect()
    assert rows
    # totals must reconcile with the raw table
    assert sum(r["n_events"] for r in rows) == ev.count()
    # window bounds contain their events
    for r in rows[:20]:
        assert r["window_start"] <= r["first_event"] <= r["last_event"]
        assert r["last_event"] < r["window_end"]


def test_streaming_equals_batch(spark, sf_dir):
    from dbqt_spark.queries import q_streaming_hourly_profile

    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["n_null_values"])
        for r in q_streaming_hourly_profile(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = {
        (r["ws"], r["event_type"]): (r["n"], r["nn"])
        for r in ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("value").isNull(), 1)).alias("nn"),
        )
        .collect()
    }
    assert streamed == batch
