def test_registered_sql_functions(spark):
    from dbqt_spark.functions import register_engine_functions

    names = register_engine_functions(spark)
    assert len(names) == 3
    row = spark.sql(
        """
        SELECT dbqt_type_compatible('INT', 'BIGINT') AS a,
               dbqt_type_compatible('INT', 'VARCHAR') AS b,
               dbqt_canonical_type('decimal(10,2)') AS c,
               dbqt_name_excluded('ORDERS_FINAL', '%_FINAL,TMP_%') AS d,
               dbqt_name_excluded('FINAL_ORDERS', '%_FINAL,TMP_%') AS e
        """
    ).collect()[0]
    assert row["a"] is True
    assert row["b"] is False
    assert row["c"] == "DECIMAL"
    assert row["d"] is True
    assert row["e"] is False


def test_plan_summary(spark, sf_dir):
    from dbqt_spark.plans import plan_summary
    from dbqt_spark.queries import q_revenue_by_nation

    s = plan_summary(q_revenue_by_nation(spark, sf_dir))
    assert s["scans"] == 5
    assert s["broadcast_joins"] == 4
    assert s["sort_merge_joins"] == 0


def test_rolling_hash_order_sensitive_and_empty(spark):
    """The rolling fingerprint is order-SENSITIVE (unlike the md5 of
    normalized text which collapses whitespace only) and hashes empty
    docs to 0."""
    from dbqt_spark.operators.textstats import fingerprint

    rows = [
        (1, "alpha beta gamma"),
        (2, "gamma beta alpha"),  # same tokens, different order
        (3, "alpha beta gamma"),  # identical to 1
        (4, ""),
        (5, "   "),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = {r["doc_id"]: r["fingerprint_roll"] for r in fingerprint(df).collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]
    assert fp[4] == 0 and fp[5] == 0


# --- pluggable tokenizer hook ------------------------------------------------


def test_simple_bpe_counts():
    from dbqt_spark.functions.tokenize import simple_bpe

    # vocab: merge l+o -> lo, lo+w -> low; 'lower' = low,e,r = 3 tokens
    count = simple_bpe([("l", "o"), ("lo", "w")])
    assert count("low") == 1
    assert count("lower") == 3          # low + e + r
    assert count("hello") == 4          # h e l lo  (only l+o merges)
    assert count("low low") == 2
    assert count("") == 0
    assert count(None) == 0


def test_token_stats_with_bpe_tokenizer(spark):
    from dbqt_spark.functions.tokenize import simple_bpe
    from dbqt_spark.operators.textstats import token_stats

    merges = [("l", "o"), ("lo", "w")]
    df = spark.createDataFrame(
        [(1, "low lower"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r
        for r in token_stats(df, tokenizer=simple_bpe(merges)).collect()
    }
    assert rows[1]["n_tokens"] == 4      # low=1, lower=3
    assert rows[2]["n_tokens"] == 0
    assert rows[3]["n_tokens"] == 0
    # whitespace arm untouched: default call still counts words
    base = {r["doc_id"]: r for r in token_stats(df).collect()}
    assert base[1]["n_tokens"] == 2


def test_sequence_pack_and_budget_with_tokenizer(spark):
    """The packing offsets and budget selection re-denominate under a
    custom tokenizer but keep their structural invariants."""
    from dbqt_spark.functions.tokenize import simple_bpe
    from dbqt_spark.operators.packing import sequence_pack
    from dbqt_spark.operators.sampling import token_budget_sample

    count = simple_bpe([("l", "o"), ("lo", "w")])
    df = spark.createDataFrame(
        [(1, "low"), (2, "lower lower"), (3, "hello")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r
        for r in sequence_pack(
            df, seq_len=4, sep_tokens=1, n_buckets=2, tokenizer=count
        ).collect()
    }
    # doc1: 1 tok + sep -> starts 0; doc2: 6 toks starting at 2;
    # doc3: 4 toks starting at 9
    assert rows[1]["n_tokens"] == 1 and rows[1]["global_start"] == 0
    assert rows[2]["n_tokens"] == 6 and rows[2]["global_start"] == 2
    assert rows[3]["n_tokens"] == 4 and rows[3]["global_start"] == 9
    assert rows[2]["first_seq"] == 0 and rows[2]["last_seq"] == 1

    # budget: count-denominated selection is a prefix of hash order
    kept = token_budget_sample(df, 7, tokenizer=count)
    total = sum(r["n_tokens"] for r in kept.collect())
    assert total <= 7
    # whitespace arm unchanged
    base = token_budget_sample(df, 7)
    assert {r["doc_id"] for r in base.collect()} >= set()


def test_resolve_token_counter_contract():
    import pytest

    from dbqt_spark.functions.tokenize import resolve_token_counter

    assert resolve_token_counter(None) is None
    assert resolve_token_counter("whitespace") is None
    assert resolve_token_counter(lambda t: 1) is not None
    with pytest.raises(ValueError, match="unrecognized tokenizer"):
        resolve_token_counter("bogus-spec")
    # hf backend absent in this environment -> loud driver-side error
    try:
        import tokenizers  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="tokenizers"):
            resolve_token_counter("hf:gpt2")
