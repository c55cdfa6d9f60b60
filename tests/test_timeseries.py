"""Unit + plan tests for the time-series operators (rolling anomaly,
window dedup) and the cross-document duplicated-n-gram profiler."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dbqt_spark.operators.textstats import dup_ngram_stats
from dbqt_spark.operators.timeseries import rolling_anomaly, window_dedup
from dbqt_spark.plans import formatted_plan


def _events(spark, rows):
    return spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _t(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


# --- rolling anomaly --------------------------------------------------------


def test_rolling_anomaly_flags_spike(spark):
    # 10 calm hours of exactly 5 events, then a 50-event spike: the
    # rolling window has zero variance until the spike hour, whose
    # z-score is undefined (std 0) -> anomaly must key off... make the
    # calm hours alternate 4/6 so std > 0 and the spike z is huge.
    rows = []
    eid = 0
    for h in range(10):
        for _ in range(4 if h % 2 == 0 else 6):
            rows.append((eid, 1, "click", _t(h)))
            eid += 1
    for _ in range(50):
        rows.append((eid, 1, "click", _t(10)))
        eid += 1
    out = rolling_anomaly(
        _events(spark, rows), lookback=24, z_threshold=3.0
    ).orderBy("hour_ts")
    got = out.collect()
    assert len(got) == 11
    first = got[0]
    # no preceding hours: mean/std/z null, not an anomaly
    assert first["roll_mean"] is None and first["is_anomaly"] is False
    spike = got[-1]
    assert spike["n_events"] == 50
    # mean of ten alternating 4/6 hours is 5, std ~1.054
    assert spike["roll_mean"] == 5.0
    assert spike["zscore"] > 3.0 and spike["is_anomaly"] is True
    calm = got[5]
    assert calm["is_anomaly"] is False and abs(calm["zscore"]) < 3.0


def test_rolling_anomaly_zero_variance_window(spark):
    # constant rate: std 0 -> z null, never an anomaly (division by a
    # zero std must not produce inf/nan)
    rows = [
        (h * 3 + i, 1, "view", _t(h)) for h in range(6) for i in range(3)
    ]
    got = rolling_anomaly(_events(spark, rows)).collect()
    assert all(r["zscore"] is None for r in got)
    assert all(r["is_anomaly"] is False for r in got)
    # but the rolling mean is still reported once a window exists
    assert got[-1]["roll_mean"] == 3.0 and got[-1]["roll_std"] == 0.0


def test_rolling_anomaly_aggregates_before_window(spark, sf_dir):
    from dbqt_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = formatted_plan(rolling_anomaly(ev))
    # the raw scan must collapse via hash aggregation BELOW the window
    # (the plan prints root-first, so Window appears before the
    # aggregate that feeds it): the window runs over the (key, hour)
    # frame, never over raw events
    assert "Window" in plan and "HashAggregate" in plan
    assert plan.index("Window") < plan.index("HashAggregate")


# --- window dedup -----------------------------------------------------------


def test_window_dedup_debounce(spark):
    rows = [
        (1, 1, "click", _t(12, 0, 0)),  # kept
        (2, 1, "click", _t(12, 2, 0)),  # 120s after #1 -> dropped
        (3, 1, "click", _t(12, 4, 0)),  # 120s after #2 -> dropped (lag
        # semantics: compared to previous ARRIVAL, kept or not)
        (4, 1, "click", _t(12, 30, 0)),  # kept
        (5, 1, "view", _t(12, 0, 30)),  # different type -> kept
        (6, 2, "click", _t(12, 0, 30)),  # different user -> kept
    ]
    kept = sorted(
        r["event_id"]
        for r in window_dedup(_events(spark, rows), gap_seconds=300)
        .collect()
    )
    assert kept == [1, 4, 5, 6]


def test_window_dedup_equal_ts_tiebreak(spark):
    # identical timestamps: (ts, id) total order keeps the lowest id
    rows = [(i, 1, "click", _t(9)) for i in range(5)]
    kept = [
        r["event_id"]
        for r in window_dedup(_events(spark, rows), gap_seconds=1)
        .collect()
    ]
    assert kept == [0]


def test_window_dedup_single_shuffle(spark, sf_dir):
    from dbqt_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = formatted_plan(window_dedup(ev))
    # exactly one exchange node in the tree (each node renders once in
    # the tree as "Exchange (n)" and once in the detail as "(n) Exchange")
    assert plan.count("Exchange (") == 1


# --- duplicated n-gram fraction ---------------------------------------------


def test_dup_ngram_stats_known_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # shares 'the quick brown'
            (2, "the quick brown cat sleeps"),  # with doc 1
            (3, "completely different text here now"),
            (4, "hi"),  # < 3 tokens: zero ngrams
            (5, None),  # null-safe
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in dup_ngram_stats(docs, n=3).collect()}
    assert rows[1]["n_ngrams"] == 3
    assert rows[1]["n_dup_ngrams"] == 1  # only 'the quick brown'
    assert rows[1]["dup_ngram_frac"] == round(1 / 3, 4)
    assert rows[2]["n_dup_ngrams"] == 1
    assert rows[3]["n_dup_ngrams"] == 0
    assert rows[4]["n_ngrams"] == 0 and rows[4]["dup_ngram_frac"] == 0.0
    assert rows[5]["n_ngrams"] == 0


def test_dup_ngram_stats_within_doc_repeat_not_duplicated(spark):
    # an n-gram repeated WITHIN one doc but appearing in no other doc
    # is not cross-document duplicated
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "x y z")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in dup_ngram_stats(docs, n=3).collect()}
    assert rows[1]["n_ngrams"] == 4
    assert rows[1]["n_dup_ngrams"] == 0
    with pytest.raises(ValueError):
        dup_ngram_stats(docs, n=0)


def test_dup_ngram_stats_partial_agg_before_shuffle(spark, sf_dir):
    from dbqt_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    stats = dup_ngram_stats(docs)
    plan = formatted_plan(stats)
    tree = plan.split("\n\n")[0]
    # NO per-ngram window anywhere: a PARTITION BY __ngram window puts
    # every distinct (doc, ngram) row of a hot n-gram into ONE
    # partition. The skew-free plan uses only partial-aggregated
    # groupBys (hot ngrams collapse map-side) and doc-keyed shuffles.
    assert "Window" not in tree
    # explode output partially aggregates to distinct (doc, ngram)
    # before any exchange: Generate is the deepest text producer and a
    # HashAggregate sits between it and the first Exchange above it
    lines = tree.splitlines()
    gen_i = next(i for i, ln in enumerate(lines) if "Generate" in ln)
    above = lines[:gen_i]
    agg_i = max(i for i, ln in enumerate(above) if "HashAggregate" in ln)
    exch_i = max(
        i for i, ln in enumerate(above) if "Exchange" in ln
    )
    assert agg_i > exch_i  # aggregate is closer to the explode
    # the per-ngram doc-frequency groupBy itself partially aggregates
    # before its exchange (hot ngrams collapse to one partial per map
    # partition — the skew escape)
    assert any(
        "partial_count" in blk and "partial_min" in blk
        for blk in plan.split("\n\n")
    )
    # ONE explode over ONE text scan at runtime: both consumers of the
    # (doc, ngram) aggregate share its shuffle via AQE stage reuse —
    # never a self-join that re-derives the explode (two corpus scans
    # at 100 TB). Static plans show two branches; the executed adaptive
    # plan must collapse them.
    stats.collect()
    executed = stats._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed
    assert "ReusedExchange" in executed


def test_dup_ngram_stats_hot_ngram(spark):
    # a pathologically hot n-gram shared by EVERY doc: correctness must
    # hold and the per-ngram doc-frequency must come from partial
    # aggregation, not a window partition holding all n rows
    n_docs = 200
    rows = [
        (i, f"of the and unique{i} tail{i} word{i}") for i in range(n_docs)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dup_ngram_stats(docs, n=3).collect()}
    assert len(out) == n_docs
    for i in range(n_docs):
        # 4 trigrams per doc; only 'of the and' is cross-doc duplicated
        assert out[i]["n_ngrams"] == 4
        assert out[i]["n_dup_ngrams"] == 1
        assert out[i]["dup_ngram_frac"] == 0.25


# --- streaming anomaly twin -------------------------------------------------


def test_streaming_anomaly_matches_batch_twin(spark, sf_dir):
    """Stream and batch must flag identical anomalies: the streaming
    path buckets via a watermarked windowed aggregation, the batch path
    via groupBy(date_trunc) — both feed the shared scorer."""
    from dbqt_spark.catalog import load_table, table_path
    from dbqt_spark.streaming.anomaly import streaming_anomaly

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load_table(spark, sf_dir, "events")
    batch = sorted(
        tuple(r)
        for r in rolling_anomaly(ev, lookback=24, z_threshold=3.0).collect()
    )
    stream = sorted(
        tuple(r)
        for r in streaming_anomaly(
            spark, table_path(sf_dir, "events"), lookback=24, z_threshold=3.0
        ).collect()
    )
    assert batch == stream and len(batch) > 0


def test_rolling_anomaly_densifies_dead_hours(spark):
    """An hour with ZERO events must surface as an explicit scored row
    (a dead feed is the incident the monitor exists to catch), and the
    lookback must span wall-clock hours, not observed buckets."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    # near-steady feed (alternating 9/11 so std > 0) for 30 hours, then
    # a 3-hour outage, then one more hour
    for h in list(range(30)) + [33]:
        for i in range(9 if h % 2 == 0 else 11):
            rows.append((h * 100 + i, "load", t0 + dt.timedelta(hours=h)))
    ev = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    out = {r["hour_ts"]: r for r in rolling_anomaly(ev, lookback=24).collect()}
    assert len(out) == 34  # 30 observed + 3 zero hours + 1
    dead = out["2026-01-02 06:00:00"]  # hour 30: first outage hour
    assert dead["n_events"] == 0
    assert dead["is_anomaly"]  # 0 against a steady mean of 10 flags
    assert abs(dead["zscore"]) > 3.0
    # densify=False preserves the old observed-buckets-only behavior
    sparse = rolling_anomaly(ev, lookback=24, densify=False).collect()
    assert len(sparse) == 31


def test_feed_gaps_known_outage(spark):
    from datetime import datetime

    from dbqt_spark.operators.timeseries import feed_gaps

    # feed 'a': hours 0,1,2, then a 3-hour outage, then 6,7 (two rows
    # in hour 7 must collapse); feed 'b': continuous
    def t(h, m=0):
        return datetime(2024, 1, 1, h, m)

    rows = [
        ("a", t(0)), ("a", t(1)), ("a", t(2)), ("a", t(6)),
        ("a", t(7)), ("a", t(7, 30)),
        ("b", t(0)), ("b", t(1)),
        ("c", None),  # NULL ts rows contribute nothing
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    got = {r["key"]: r for r in feed_gaps(df).collect()}
    a = got["a"]
    assert a["n_hours_expected"] == 8 and a["n_hours_present"] == 5
    assert a["n_hours_missing"] == 3
    assert a["n_gaps"] == 1 and a["longest_gap_hours"] == 3
    assert a["coverage"] == round(5 / 8, 4)
    assert a["first_hour"] == "2024-01-01 00:00:00"
    assert a["last_hour"] == "2024-01-01 07:00:00"
    b = got["b"]
    assert b["n_gaps"] == 0 and b["coverage"] == 1.0
    assert "c" not in got  # only NULL ts rows -> absent
