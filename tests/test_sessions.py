"""Sessionization: batch semantics + stateful-streaming equivalence."""

from datetime import datetime

from pyspark.sql import functions as F


def _mk_events(spark):
    rows = [
        # user 1: two sessions (gap > 30 min between 10:00 and 11:00)
        (1, datetime(2024, 1, 1, 10, 0, 0)),
        (1, datetime(2024, 1, 1, 10, 10, 0)),
        (1, datetime(2024, 1, 1, 11, 0, 1)),
        # user 2: one session
        (2, datetime(2024, 1, 1, 9, 0, 0)),
        (2, datetime(2024, 1, 1, 9, 29, 59)),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_sessionize_batch_semantics(spark):
    from dbqt_spark.streaming.sessions import sessionize_batch

    out = {
        (r["user_id"], r["session_no"]): r["n_events"]
        for r in sessionize_batch(_mk_events(spark), gap_minutes=30).collect()
    }
    assert out == {(1, 1): 2, (1, 2): 1, (2, 1): 2}


def test_sessionize_stream_closes_past_sessions(spark, sf_dir, tmp_path):
    """availableNow drain: every session except each user's live last one
    must be emitted, matching the batch sessionizer."""
    import uuid

    from dbqt_spark.catalog import load_table, table_path
    from dbqt_spark.streaming.checks import (
        normalize_event_ts,
        stream_events_from_parquet,
    )
    from dbqt_spark.streaming.sessions import sessionize_batch, sessionize_stream

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = table_path(sf_dir, "events")
    raw_schema = spark.read.parquet(path).schema
    stream = stream_events_from_parquet(spark, path, schema=raw_schema)
    stream = normalize_event_ts(stream)

    name = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # An availableNow drain of a PROCESSING-time-timeout stateful query
    # never self-terminates: after the data batches it loops empty
    # "cleaning up state" batches waiting for wall-clock timeouts (r16,
    # measured: still spinning at batch 199 / 123 s; the old
    # awaitTermination(180) burned its full timeout every run). All
    # data was available at start, so the first ZERO-input batch means
    # the drain is complete — every session closable by data has been
    # emitted; the remaining state only closes by timeout, which this
    # test excludes from `expected` anyway. Stop there.
    import time as _time

    deadline = _time.time() + 120
    while _time.time() < deadline:
        lp = q.lastProgress
        if lp and lp["numInputRows"] == 0 and lp["batchId"] >= 1:
            break
        _time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    streamed = {
        (r["user_id"], r["session_no"]): r["n_events"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    batch_rows = sessionize_batch(ev, gap_minutes=30).collect()
    last_per_user = {}
    for r in batch_rows:
        last_per_user[r["user_id"]] = max(
            last_per_user.get(r["user_id"], 0), r["session_no"]
        )
    expected = {
        (r["user_id"], r["session_no"]): r["n_events"]
        for r in batch_rows
        if r["session_no"] != last_per_user[r["user_id"]]
    }
    assert streamed == expected
