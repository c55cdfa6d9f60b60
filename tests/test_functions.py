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
