"""Unit + plan tests for the row-level / checksum table comparison
operators (operators/datadiff.py)."""

import pytest
from pyspark.sql import functions as F

from dbqt_spark.operators.datadiff import (
    agg_compare,
    diff_summary,
    table_diff,
)
from dbqt_spark.plans import formatted_plan


def _pair(spark):
    src = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", None),   # null value, unchanged -> identical
            (4, "d", 40.0),   # missing from target -> removed
            (5, None, 50.0),  # null -> value change
        ],
        ["k", "s", "v"],
    )
    tgt = spark.createDataFrame(
        [
            (1, "a", 10.0),    # identical
            (2, "B", 20.0),    # s changed
            (3, "c", None),    # NULL == NULL -> identical
            (5, "x", 50.0),    # s changed (NULL -> 'x')
            (6, "new", 60.0),  # added
        ],
        ["k", "s", "v"],
    )
    return src, tgt


def test_table_diff_statuses(spark):
    src, tgt = _pair(spark)
    rows = {r["k"]: r for r in table_diff(src, tgt, ["k"]).collect()}
    assert rows[1]["diff_status"] == "identical"
    assert rows[2]["diff_status"] == "changed"
    assert rows[2]["changed_columns"] == ["s"]
    assert rows[3]["diff_status"] == "identical"  # null-safe equality
    assert rows[4]["diff_status"] == "removed"
    assert rows[5]["diff_status"] == "changed"  # NULL -> 'x' is a change
    assert rows[6]["diff_status"] == "added"
    assert rows[6]["changed_columns"] == []
    with pytest.raises(ValueError):
        table_diff(src, tgt, [])


def test_table_diff_multi_column_change(spark):
    src = spark.createDataFrame([(1, "a", 1.0)], ["k", "s", "v"])
    tgt = spark.createDataFrame([(1, "z", 9.0)], ["k", "s", "v"])
    r = table_diff(src, tgt, ["k"]).collect()[0]
    assert r["diff_status"] == "changed"
    assert r["changed_columns"] == ["s", "v"]  # sorted


def test_diff_summary_counts(spark):
    src, tgt = _pair(spark)
    got = {
        r["item"]: r["n_rows"]
        for r in diff_summary(src, tgt, ["k"]).collect()
    }
    assert got == {
        "added": 1,
        "removed": 1,
        "changed": 2,
        "identical": 2,
        "column:s": 2,
    }  # zero-change column 'v' omitted


def test_agg_compare_flags_mismatch(spark):
    src = spark.createDataFrame(
        [(1, 1.5), (2, 2.5), (3, None)], ["k", "v"]
    ).select(F.col("v"))
    tgt = spark.createDataFrame(
        [(1, 1.5), (2, 2.5)], ["k", "v"]
    ).select(F.col("v"))
    rows = {r["metric"]: r for r in agg_compare(src, tgt, ["v"]).collect()}
    assert rows["n_rows"].source_value == 3.0
    assert rows["n_rows"].target_value == 2.0
    assert rows["n_rows"].is_match is False
    assert rows["n_null"].is_match is False  # 1 vs 0
    assert rows["min"].is_match is True
    assert rows["max"].is_match is True
    assert rows["sum"].is_match is True  # 4.0 both sides (nulls skipped)
    with pytest.raises(ValueError):
        agg_compare(src, tgt, [])


def test_agg_compare_sum_order_independent(spark):
    # decimal sums must not depend on partitioning: many tiny doubles
    # whose float-sum differs by accumulation order
    df = spark.range(10_000).selectExpr("0.1 + id * 1e-9 AS v")
    a = agg_compare(
        df.repartition(1), df.repartition(16), ["v"]
    ).collect()
    assert all(r["is_match"] for r in a)


def test_table_diff_plan_single_join(spark, sf_dir):
    from dbqt_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    d = table_diff(
        orders, orders.filter(F.col("o_orderkey") % 2 == 0), ["o_orderkey"]
    )
    tree = formatted_plan(d).split("\n\n")[0]
    # exactly one join, full outer, no UDFs anywhere
    joins = [ln for ln in tree.splitlines() if "Join" in ln]
    assert len(joins) == 1 and "FullOuter" in joins[0]
    assert "Python" not in tree  # no python UDF stages


def test_agg_compare_one_scan_per_side(spark, sf_dir):
    from dbqt_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    a = agg_compare(li, li.limit(100), ["l_quantity", "l_discount"])
    tree = formatted_plan(a).split("\n\n")[0]
    # all metrics for all columns fuse into ONE aggregate per side
    scans = [ln for ln in tree.splitlines() if "Scan parquet" in ln]
    assert len(scans) == 2


def test_psi_drift_identical_distributions(spark):
    from dbqt_spark.operators.datadiff import psi_drift

    df = spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    rows = psi_drift(df, df, "v", bins=10).collect()
    assert len(rows) == 10
    assert all(r["psi_contrib"] == 0.0 for r in rows)
    assert sum(r["n_source"] for r in rows) == 1000
    # identical sides bin identically
    assert all(r["n_source"] == r["n_target"] for r in rows)


def test_psi_drift_detects_shift(spark):
    from dbqt_spark.operators.datadiff import psi_drift

    src = spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    # target concentrated in the top decile of the source range
    tgt = spark.range(1000).selectExpr(
        "CAST(90 + id % 10 AS DOUBLE) AS v"
    )
    rows = psi_drift(src, tgt, "v", bins=10).collect()
    total = sum(r["psi_contrib"] for r in rows)
    assert total > 0.25  # action-level drift
    # out-of-range/edge values clamp into bins (no rows lost)
    assert sum(r["n_target"] for r in rows) == 1000


def test_psi_drift_nulls_and_degenerate_range(spark):
    from dbqt_spark.operators.datadiff import psi_drift

    import pytest as _pytest

    src = spark.createDataFrame(
        [(1.0,), (None,), (1.0,)], ["v"]
    )
    tgt = spark.createDataFrame([(1.0,), (None,)], ["v"])
    # constant column: hi == lo -> everything lands in bin 0, no
    # division by zero; nulls excluded from both sides
    rows = psi_drift(src, tgt, "v", bins=5).collect()
    b0 = rows[0]
    assert b0["n_source"] == 2 and b0["n_target"] == 1
    assert sum(r["n_source"] for r in rows[1:]) == 0
    with _pytest.raises(ValueError):
        psi_drift(src, tgt, "v", bins=0)


def test_psi_drift_categorical_semantics(spark):
    from dbqt_spark.operators.datadiff import psi_drift_categorical

    src = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 2 + [(None,)],
        ["g"],
    )
    tgt = spark.createDataFrame(
        [("a",)] * 2 + [("b",)] * 2 + [("z",)] * 4, ["g"]
    )
    # top_k=2 keeps a and b from the SOURCE; c, NULL, and target-only z
    # fold into __other__
    rows = {
        r["category"]: r
        for r in psi_drift_categorical(src, tgt, "g", top_k=2).collect()
    }
    assert set(rows) == {"a", "b", "__other__"}
    assert rows["a"]["n_source"] == 6 and rows["a"]["n_target"] == 2
    assert rows["__other__"]["n_source"] == 3  # c x2 + null x1
    assert rows["__other__"]["n_target"] == 4  # z x4
    # drift toward __other__ has positive contribution
    assert rows["__other__"]["psi_contrib"] > 0
    with pytest.raises(ValueError):
        psi_drift_categorical(src, tgt, "g", top_k=0)


def test_psi_drift_categorical_identical(spark):
    from dbqt_spark.operators.datadiff import psi_drift_categorical

    df = spark.range(100).selectExpr("CAST(id % 5 AS STRING) AS g")
    rows = psi_drift_categorical(df, df, "g", top_k=3).collect()
    assert all(r["psi_contrib"] == 0.0 for r in rows)
