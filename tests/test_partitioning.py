import re

from pyspark.sql import functions as F


from dbqt_spark.plans import formatted_plan as _plan


def test_salted_agg_matches_plain(spark, sf_dir):
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.partitioning import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r["l_returnflag"],): (r["n"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count("l_quantity").alias("n"), F.max("l_quantity").alias("mx"))
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["n"], r["mx"])
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {"n": ("l_quantity", "count"), "mx": ("l_quantity", "max")},
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.partitioning import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = (
        li.join(orders, "l_orderkey")
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    salted = (
        salted_join(li, orders, "l_orderkey")
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.partitioning import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        write_bucketed(li, "b_lineitem", ["l_orderkey"], 8)
        write_bucketed(orders, "b_orders", ["o_orderkey"], 8)
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        # co-bucketed join: no Exchange on either side
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
