"""Bloom-filter membership gate (operators/bloom.py)."""

import re

import pytest
from pyspark.sql import functions as F

from dbqt_spark.operators.bloom import (
    WORD_BITS,
    bloom_build,
    bloom_gate,
    bloom_params,
)


def _keys(spark, n=200):
    return spark.range(0, n).select(
        F.col("id"),
        F.concat(F.lit("k"), F.col("id")).alias("key"),
    )


def test_bloom_build_matches_manual_bits(spark):
    """Every packed word equals the bit set computed independently in
    Python from the same md5-prefix construction."""
    import hashlib

    n_bits, k = 256, 3
    df = _keys(spark, 40)
    words = {
        r.word_idx: r.word
        for r in bloom_build(df, "key", n_bits, k).collect()
    }
    expect: dict[int, int] = {}
    for i in range(40):
        for h in range(k):
            v = int(hashlib.md5(f"{h}:k{i}".encode()).hexdigest()[:15], 16)
            bit = v % n_bits
            w = bit >> 5
            expect[w] = expect.get(w, 0) | (1 << (bit % WORD_BITS))
    assert words == expect


def test_bloom_gate_no_false_negatives_and_arms_agree(spark):
    df = _keys(spark, 300)
    seen = df.where(F.col("id") % 3 == 0)
    n_bits, k = 1024, 3
    bl = bloom_build(seen, "key", n_bits, k)
    bcast = {
        r.id: r.maybe_seen
        for r in bloom_gate(df, bl, "key", n_bits, k).collect()
    }
    shuf = {
        r.id: r.maybe_seen
        for r in bloom_gate(
            df, bl, "key", n_bits, k, mode="shuffle", id_col="id"
        ).collect()
    }
    assert bcast == shuf
    # every inserted key must flag (no false negatives, the Bloom law)
    assert all(bcast[i] for i in range(0, 300, 3))


def test_bloom_gate_null_key_gates_false(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id int, key string"
    )
    bl = bloom_build(df, "key", 256, 2)
    out = {
        r.id: r.maybe_seen
        for r in bloom_gate(df, bl, "key", 256, 2).collect()
    }
    assert out[2] is False and out[1] and out[3]
    shuf = {
        r.id: r.maybe_seen
        for r in bloom_gate(
            df, bl, "key", 256, 2, mode="shuffle", id_col="id"
        ).collect()
    }
    assert shuf == out


def test_bloom_undersized_filter_has_false_positives_never_negatives(spark):
    """Saturate a tiny filter: FPs appear (the documented trade), FNs
    never do."""
    df = _keys(spark, 400)
    seen = df.where(F.col("id") % 2 == 0)
    bl = bloom_build(seen, "key", 64, 3)
    out = {r.id: r.maybe_seen for r in bloom_gate(df, bl, "key", 64, 3).collect()}
    assert all(out[i] for i in range(0, 400, 2))
    assert any(out[i] for i in range(1, 400, 2))  # saturated -> FPs


def test_bloom_validation_errors(spark):
    df = _keys(spark, 10)
    with pytest.raises(ValueError, match="multiple"):
        bloom_build(df, "key", 100, 3)
    with pytest.raises(ValueError, match="n_hashes"):
        bloom_build(df, "key", 256, 0)
    bl = bloom_build(df, "key", 256, 2)
    with pytest.raises(ValueError, match="mode"):
        bloom_gate(df, bl, "key", 256, 2, mode="nope")
    with pytest.raises(ValueError, match="id_col"):
        bloom_gate(df, bl, "key", 256, 2, mode="shuffle")


def test_bloom_params_standard_sizing():
    n_bits, k = bloom_params(1000, 0.01)
    assert n_bits % WORD_BITS == 0
    assert 9000 <= n_bits <= 10000 and k == 7  # -n ln p / ln2^2 ~ 9586
    with pytest.raises(ValueError):
        bloom_params(0)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_bloom_gate_broadcast_arm_arrivals_never_shuffle(spark):
    """The broadcast arm's whole point: the arrivals side rides k
    BroadcastHashJoins — no shuffle join anywhere, and no Exchange
    block may carry the arrivals' payload column (only the word frame's
    build aggregation exchanges)."""
    from dbqt_spark.plans import formatted_plan

    arrivals = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", F.concat(F.lit("u"), "doc_id").alias("key"))
    bl = bloom_build(
        arrivals.where(F.col("doc_id") % 2 == 0), "key", 1024, 3
    )
    plan = formatted_plan(bloom_gate(arrivals, bl, "key", 1024, 3))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastHashJoin") == 3
    for block in re.split(r"\n\n", plan):
        if re.match(r"\(\d+\) Exchange", block.strip()):
            assert "text#" not in block, block


def test_bloom_filters_merge_by_union(spark):
    """Two per-slice builds unioned == one build over all keys — the
    build-per-partition, union-for-the-corpus merge path (bloom_gate
    re-ORs words per word_idx)."""
    df = _keys(spark, 120)
    half_a = df.where(F.col("id") < 60)
    half_b = df.where(F.col("id") >= 60)
    n_bits, k = 512, 3
    merged = bloom_build(half_a, "key", n_bits, k).unionByName(
        bloom_build(half_b, "key", n_bits, k)
    )
    whole = bloom_build(df, "key", n_bits, k)
    got_m = {
        r.id: r.maybe_seen
        for r in bloom_gate(df, merged, "key", n_bits, k).collect()
    }
    got_w = {
        r.id: r.maybe_seen
        for r in bloom_gate(df, whole, "key", n_bits, k).collect()
    }
    assert got_m == got_w
    assert all(got_m.values())  # every inserted key still flags


def test_bloom_gate_auto_mode_size_gates(spark):
    """auto picks broadcast under the word limit, escalates to the
    shuffle arm above it when id_col is supplied, and FAILS with the
    remedy named (never an over-budget broadcast) without one."""
    df = _keys(spark, 100)
    bl = bloom_build(df, "key", 1024, 3)
    want = {
        r.id: r.maybe_seen
        for r in bloom_gate(df, bl, "key", 1024, 3).collect()
    }
    got_b = {
        r.id: r.maybe_seen
        for r in bloom_gate(df, bl, "key", 1024, 3, mode="auto").collect()
    }
    assert got_b == want
    got_s = {
        r.id: r.maybe_seen
        for r in bloom_gate(
            df, bl, "key", 1024, 3, mode="auto", id_col="id",
            broadcast_word_limit=1,
        ).collect()
    }
    assert got_s == want
    with pytest.raises(ValueError, match="id_col"):
        bloom_gate(
            df, bl, "key", 1024, 3, mode="auto", broadcast_word_limit=1
        )
