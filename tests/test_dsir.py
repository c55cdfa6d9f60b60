"""DSIR importance resampling: direction of the weights, determinism,
selection modes, scale-shape of the plan."""

import pytest
from pyspark.sql import functions as F

from dbqt_spark.operators.dsir import (
    dsir_select,
    dsir_weights,
    hashed_ngram_features,
    with_gumbel_key,
)


def _corpora(spark):
    """Raw corpus: 20 'code' docs + 20 'prose' docs; target: prose
    only. DSIR must weight prose-like raw docs above code-like ones."""
    prose = [
        (i, f"the quick brown fox jumps over the lazy dog number {i}")
        for i in range(20)
    ]
    code = [
        (100 + i, f"def fn_{i}(x): return x + {i} # stack trace error")
        for i in range(20)
    ]
    raw = spark.createDataFrame(prose + code, "doc_id long, text string")
    target = spark.createDataFrame(
        [(1000 + i, f"a quick brown fox and a lazy dog story {i}")
         for i in range(10)],
        "doc_id long, text string",
    )
    return raw, target


def test_weights_separate_target_like_docs(spark):
    raw, target = _corpora(spark)
    w = dsir_weights(raw, target, n_buckets=1000)
    rows = {r.doc_id: r for r in w.collect()}
    assert len(rows) == 40
    # normalize by gram count: prose docs must score clearly higher
    # per-gram than code docs (population-level separation; individual
    # tails may graze because each doc also carries unique grams)
    prose_avg = [
        float(rows[i].log_weight) / rows[i].n_grams for i in range(20)
    ]
    code_avg = [
        float(rows[100 + i].log_weight) / rows[100 + i].n_grams
        for i in range(20)
    ]
    prose_mean = sum(prose_avg) / len(prose_avg)
    code_mean = sum(code_avg) / len(code_avg)
    assert prose_mean > code_mean + 0.2
    # and the best-matching docs are all prose
    top10 = sorted(
        rows, key=lambda d: -float(rows[d].log_weight) / rows[d].n_grams
    )[:10]
    assert all(d < 100 for d in top10)


def test_empty_and_null_text_docs_carry_zero_weight(spark):
    raw = spark.createDataFrame(
        [(1, "some words here"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(9, "some words")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in dsir_weights(raw, target).collect()}
    assert len(rows) == 3
    for empty_id in (2, 3):
        assert rows[empty_id].n_grams == 0
        assert float(rows[empty_id].log_weight) == 0.0


def test_features_are_bag_counts_not_distinct(spark):
    df = spark.createDataFrame(
        [(1, "word word word")], "doc_id long, text string"
    )
    feats = hashed_ngram_features(df, n_buckets=10_000).collect()
    # 3 unigram occurrences of 'word' + 2 'word word' bigrams
    assert sorted(r.cnt for r in feats) == [2, 3]
    assert sum(r.cnt for r in feats) == 5


def test_select_modes_and_determinism(spark):
    raw, target = _corpora(spark)
    topk = dsir_select(raw, target, k=10, mode="topk")
    ids_topk = [r.doc_id for r in topk.collect()]
    assert len(ids_topk) == 10
    # topk mode: sample_key == log_weight, winners are the best weights
    w = {
        r.doc_id: r.log_weight
        for r in dsir_weights(raw, target).collect()
    }
    best = sorted(w, key=lambda d: (-w[d], d))[:10]
    assert sorted(ids_topk) == sorted(best)

    g1 = [r.doc_id for r in dsir_select(raw, target, k=10, seed=7).collect()]
    g2 = [r.doc_id for r in dsir_select(raw, target, k=10, seed=7).collect()]
    assert g1 == g2  # same seed -> identical draw
    g3 = [r.doc_id for r in dsir_select(raw, target, k=10, seed=8).collect()]
    assert g1 != g3  # different seed -> different sample (overwhelmingly)

    with pytest.raises(ValueError, match="mode"):
        dsir_select(raw, target, k=5, mode="uniform")


def test_gumbel_key_distribution_sanity(spark):
    """Deterministic Gumbel draws should look Gumbel: mean near the
    Euler-Mascheroni constant (~0.5772), not degenerate."""
    ids = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    vals = [
        float(r.g)
        for r in with_gumbel_key(ids, "doc_id", 42, out="g").collect()
    ]
    mean = sum(vals) / len(vals)
    assert 0.45 < mean < 0.72
    assert len(set(vals)) > 1990  # essentially all distinct


def test_log_ratio_table_broadcasts(spark):
    """The per-doc weight join must be a broadcast of the bucket-level
    ratio table, never a shuffle of the corpus features."""
    raw, target = _corpora(spark)
    plan = dsir_weights(raw, target)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_frozen_ratio_table_injection(spark):
    """Production path: fit dsir_log_ratios once (e.g. on a raw
    sample), inject via ratios= — scoring must equal the self-fit
    two-pass result when the fit input is the same."""
    from dbqt_spark.operators.dsir import dsir_log_ratios

    raw, target = _corpora(spark)
    rf = hashed_ngram_features(raw, n_buckets=10_000)
    tf = hashed_ngram_features(target, n_buckets=10_000)
    frozen = dsir_log_ratios(rf, tf, n_buckets=10_000)
    a = sorted(
        (r.doc_id, r.log_weight)
        for r in dsir_weights(raw, target).collect()
    )
    b = sorted(
        (r.doc_id, r.log_weight)
        for r in dsir_weights(raw, target, ratios=frozen).collect()
    )
    assert a == b


def test_ratio_table_is_dense_over_all_buckets(spark):
    """r13 ADVICE: a sample-fit ratio table must cover every bucket —
    unseen buckets carry the Laplace default ln((R+aB)/(T+aB)), not a
    missing row that the one-pass scoring join would silently drop."""
    import math

    from dbqt_spark.operators.dsir import dsir_log_ratios

    raw, target = _corpora(spark)
    B = 512
    rf = hashed_ngram_features(raw, n_buckets=B)
    tf = hashed_ngram_features(target, n_buckets=B)
    lr = dsir_log_ratios(rf, tf, n_buckets=B)
    rows = {r.bucket: float(r.lr6) for r in lr.collect()}
    assert set(rows) == set(range(B))
    seen = {
        r.bucket
        for r in rf.select("bucket").union(tf.select("bucket")).collect()
    }
    unseen = set(range(B)) - seen
    assert unseen, "fixture too dense to exercise the default"
    tot_t = sum(r.cnt for r in tf.collect())
    tot_r = sum(r.cnt for r in rf.collect())
    want = round(math.log((tot_r + B) / (tot_t + B)), 6)
    for b in unseen:
        assert rows[b] == want


def test_sample_fit_ratios_score_unseen_buckets(spark):
    """One-pass path with a table fit on a SAMPLE: grams hashing into
    buckets the fit never saw must (a) still count toward n_grams and
    (b) contribute the smoothed default, not vanish (r13 ADVICE). A
    hand-built SPARSE table degrades to ratio 1 for missing buckets
    but still counts the grams."""
    from dbqt_spark.operators.dsir import dsir_log_ratios

    raw, target = _corpora(spark)
    B = 256
    # fit on HALF the raw corpus: the held-out docs' novel grams land
    # in buckets the fit saw only via the dense default
    sample = raw.filter(F.col("doc_id") < 10)
    frozen = dsir_log_ratios(
        hashed_ngram_features(sample, n_buckets=B),
        hashed_ngram_features(target, n_buckets=B),
        n_buckets=B,
    )
    got = {
        r.doc_id: (r.n_grams, r.log_weight)
        for r in dsir_weights(raw, target, n_buckets=B, ratios=frozen)
        .collect()
    }
    full = {
        r.doc_id: r.n_grams
        for r in dsir_weights(raw, target, n_buckets=B).collect()
    }
    # every doc keeps its full gram count — nothing dropped by the join
    assert {k: v[0] for k, v in got.items()} == full
    # sparse table: drop a third of the buckets, n_grams stays intact
    sparse = frozen.filter(F.col("bucket") % 3 != 0)
    assert sparse.count() < B
    got_sparse = {
        r.doc_id: r.n_grams
        for r in dsir_weights(raw, target, n_buckets=B, ratios=sparse)
        .collect()
    }
    assert got_sparse == full
