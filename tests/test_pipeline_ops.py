"""Training-pipeline operators added in r7: decontamination,
deterministic hash-split, Gopher repetition stats. Oracle value/type
parity is covered by test_oracle_parity; these tests pin the semantics
on constructed inputs and the at-scale plan shapes."""

import pytest
from pyspark.sql import functions as F

from dbqt_spark.operators.contamination import (
    contamination_check,
    decontaminate,
)
from dbqt_spark.operators.sampling import hash_split
from dbqt_spark.operators.textstats import repetition_stats
from dbqt_spark.plans import formatted_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_contamination_flags_shared_ngram(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words in this one"),
            (3, "QUICK BROWN FOX appears here too"),  # case-folded hit
        ],
    )
    eval_set = _docs(spark, [(100, "a quick brown fox story")])
    hits = {
        r["doc_id"]: r["n_hit_ngrams"]
        for r in contamination_check(corpus, eval_set, n=3).collect()
    }
    assert hits == {1: 1, 3: 1}  # the 'quick brown fox' 3-gram
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, eval_set, n=3).collect()
    )
    assert kept == [2]


def test_contamination_short_and_empty_docs(spark):
    # shorter-than-n docs hash their whole token sequence; empty docs
    # contribute nothing (and never match)
    corpus = _docs(spark, [(1, "tiny doc"), (2, "   "), (3, "tiny doc here")])
    eval_set = _docs(spark, [(100, "tiny doc")])
    hits = {
        r["doc_id"]: r["n_hit_ngrams"]
        for r in contamination_check(corpus, eval_set, n=5).collect()
    }
    assert hits == {1: 1}  # whole-doc gram matches; doc 3 differs


def test_contamination_plan_broadcasts_eval_no_corpus_shuffle(spark, sf_dir):
    """The at-scale contract: eval n-gram hashes broadcast, the corpus
    side reaches the join through scan+generate only (no Exchange below
    the join on the corpus side; the only shuffle is the post-join
    per-doc aggregate of matched hits)."""
    from dbqt_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = formatted_plan(
        contamination_check(
            docs.filter("doc_id % 97 != 0"),
            docs.filter("doc_id % 97 = 0"),
            n=3,
        )
    )
    assert "BroadcastHashJoin" in plan
    # the CORPUS side is the join's streamed (":-") branch in the tree
    # header: it must contain no Exchange at all — scan + generate only.
    tree = plan.split("\n\n")[0].splitlines()
    start = next(i for i, l in enumerate(tree) if "BroadcastHashJoin" in l)
    corpus_branch = []
    for line in tree[start + 1 :]:
        if ":" not in line:  # left-branch lines carry the ':' gutter
            break
        corpus_branch.append(line)
    assert corpus_branch and not any("Exchange" in l for l in corpus_branch)
    # the eval side broadcasts
    assert "BroadcastExchange" in plan


def test_hash_split_deterministic_and_complete(spark, sf_dir):
    from dbqt_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert a == b  # pure function of (seed, id)
    assert set(a.values()) <= {"train", "val", "test"}
    n = len(a)
    train_frac = sum(1 for v in a.values() if v == "train") / n
    assert 0.7 < train_frac < 0.9  # 80% nominal, small-sample noise

    # a different seed reshuffles membership
    c = {r["doc_id"]: r["split"] for r in hash_split(docs, seed=7).collect()}
    assert c != a


def test_hash_split_append_stability(spark):
    """Late-arriving rows must not move existing assignments: the split
    of a doc depends only on its id, never on the rest of the frame."""
    d1 = _docs(spark, [(i, f"doc {i}") for i in range(50)])
    d2 = _docs(spark, [(i, f"doc {i}") for i in range(100)])
    a = {r["doc_id"]: r["split"] for r in hash_split(d1).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(d2).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_hash_split_bad_weights(spark):
    d = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(d, weights=[("a", 0.5), ("b", 0.2)])


def test_repetition_stats_known_values(spark):
    df = _docs(
        spark,
        [
            # 4 tokens, all distinct words, one repeated 2-gram:
            # "a b a b" -> 2-grams [a b, b a, a b] -> 1/3 dup
            (1, "a b a b"),
            (2, "x\nx\ny"),  # 3 lines, one duplicate -> 1/3
            (3, ""),  # empty: all zeros
            (4, "w w w w"),  # 3/4 dup words, 2-grams all same -> 2/3
        ],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["dup_2gram_frac"] == round(1 - 2 / 3, 4)
    assert rows[1]["dup_word_frac"] == 0.5
    assert rows[2]["n_lines"] == 3
    assert rows[2]["dup_line_frac"] == round(1 - 2 / 3, 4)
    assert rows[3]["n_lines"] == 0
    assert rows[3]["dup_word_frac"] == 0.0
    assert rows[4]["dup_word_frac"] == 0.75
    assert rows[4]["dup_2gram_frac"] == round(1 - 1 / 3, 4)


def test_repetition_stats_no_shuffle(spark, sf_dir):
    from dbqt_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = formatted_plan(repetition_stats(docs))
    assert "Exchange" not in plan  # pure map over the scan
