import re

import pytest

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


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """Z-order clustering must give file-level min/max pruning on EVERY
    interleaved column: a narrow filter on either x or y overlaps only
    a small fraction of files, while a plain x-sorted layout gives y no
    pruning at all (every file spans the full y range)."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from dbqt_spark.operators.partitioning import write_zordered

    df = spark.range(40_000).select(
        (F.col("id") % 200).alias("x"),
        (F.xxhash64("id") % 200).alias("y"),
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(df, zpath, ["x", "y"], n_files=16)
    xpath = str(tmp_path / "xsorted")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    def overlap(path, col, lo, hi):
        files = glob.glob(path + "/*.parquet")
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            fmin = fmax = None
            for rg in range(md.num_row_groups):
                for i in range(md.num_columns):
                    c = md.row_group(rg).column(i)
                    if c.path_in_schema == col and c.statistics:
                        mn, mx = c.statistics.min, c.statistics.max
                        fmin = mn if fmin is None else min(fmin, mn)
                        fmax = mx if fmax is None else max(fmax, mx)
            if fmin is not None and not (hi < fmin or lo > fmax):
                hit += 1
        return hit, len(files)

    zx = overlap(zpath, "x", 10, 20)
    zy = overlap(zpath, "y", 10, 20)
    sy = overlap(xpath, "y", 10, 20)
    # z-order: both dimensions prune to a fraction of the files
    assert zx[0] <= zx[1] // 2, f"x did not prune: {zx}"
    assert zy[0] <= zy[1] // 2, f"y did not prune: {zy}"
    # the single-sort layout cannot prune its non-sort column
    assert sy[0] == sy[1], f"baseline unexpectedly pruned y: {sy}"
    # and the data round-trips exactly
    assert spark.read.parquet(zpath).count() == 40_000


def test_zorder_requires_columns(spark, tmp_path):
    import pytest as _pytest

    from dbqt_spark.operators.partitioning import write_zordered

    df = spark.range(10).selectExpr("id AS x")
    with _pytest.raises(ValueError, match="at least one column"):
        write_zordered(df, str(tmp_path / "z"), [])


def test_zorder_refuses_sign_bit_overflow(spark):
    """bits_per_col x len(cols) > 63 would push interleaved bits into
    the long sign bit (or wrap past 64) and silently break the Morton
    sort order — must refuse loudly. 8 bits x 8 cols = 64 > 63."""
    import pytest as _pytest

    from dbqt_spark.operators.partitioning import zorder_column

    cols = [f"c{i}" for i in range(8)]
    df = spark.range(20).selectExpr(
        *[f"id * {i + 1} AS c{i}" for i in range(8)]
    )
    with _pytest.raises(ValueError, match="63"):
        zorder_column(df, cols, bits_per_col=8)
    # 7 bits x 8 cols = 56 bits fits — monotone in every column's rank
    z = zorder_column(df, cols, bits_per_col=7)
    vals = [r["z"] for r in df.select(z.alias("z")).collect()]
    assert all(v >= 0 for v in vals)


def test_file_stats_multi_file_layout(spark, tmp_path):
    from dbqt_spark.operators.partitioning import file_stats

    path = str(tmp_path / "multi")
    spark.range(9000).selectExpr(
        "id", "id % 7 AS grp"
    ).repartition(3).write.parquet(path)
    out = file_stats(spark.read.parquet(path)).collect()
    assert len(out) == 3
    assert sum(r["n_rows"] for r in out) == 9000
    assert all(r["file_bytes"] > 0 for r in out)
    assert all(r["file_name"].endswith(".parquet") for r in out)
    # sorted by file name (deterministic report order)
    names = [r["file_name"] for r in out]
    assert names == sorted(names)


def test_file_stats_aggregates_on_scan(spark, sf_dir):
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.partitioning import file_stats

    fs = file_stats(load_table(spark, sf_dir, "lineitem"))
    plan = _plan(fs)
    # one exchange whose cardinality is the FILE count: the aggregate
    # must partially combine on the scan side (HashAggregate below the
    # Exchange in dataflow = after it in root-first print order)
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    exch = [i for i, ln in enumerate(lines) if "Exchange" in ln]
    aggs = [i for i, ln in enumerate(lines) if "HashAggregate" in ln]
    assert any(a > e for e in exch for a in aggs)


def test_skew_report_identifies_hot_key(spark):
    from dbqt_spark.operators.partitioning import skew_report

    import pytest as _pytest

    # 900 rows on key 0, 10 each on keys 1..10
    df = spark.range(1000).selectExpr(
        "CASE WHEN id < 900 THEN 0 ELSE 1 + id % 10 END AS k"
    )
    rows = skew_report(df, ["k"], top_k=3).collect()
    assert rows[0]["key"] == "0" and rows[0]["n_rows"] == 900
    assert rows[0]["share"] == 0.9
    # 11 keys, mean ~90.9 rows -> the hot key is ~9.9x the average
    assert rows[0]["x_avg"] == round(900 / (1000 / 11), 4)
    # deterministic tie-break among the 10-row keys: key asc
    assert [r["key"] for r in rows[1:]] == ["1", "10"]


def test_skew_report_composite_and_null_keys(spark):
    from dbqt_spark.operators.partitioning import skew_report

    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (None, "b")], ["x", "y"]
    )
    rows = skew_report(df, ["x", "y"], top_k=10).collect()
    assert rows[0]["key"] == "1|a" and rows[0]["n_rows"] == 2
    assert rows[1]["key"] == "__null__|b"
    with _pytest.raises(ValueError):
        skew_report(df, [], top_k=5)
    with _pytest.raises(ValueError):
        skew_report(df, ["x"], top_k=0)


def test_skew_report_takeordered_not_full_sort(spark, sf_dir):
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.partitioning import skew_report

    ev = load_table(spark, sf_dir, "events")
    plan = _plan(skew_report(ev, ["user_id"], top_k=20))
    assert "TakeOrderedAndProject" in plan  # top-k cut, no global Sort


def test_rowgroup_stats_matches_duckdb_parquet_metadata(spark, tmp_path):
    """Every reported value cross-checks against DuckDB's
    parquet_metadata() on the same files — the engine-independent
    truth a SQL-view oracle cannot reach (file_bytes precedent).
    Multi-row-group layout forced via a small row_group_size."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    pq.write_table(
        pa.table({"x": list(range(1000)), "s": [f"v{i}" for i in range(1000)]}),
        p1, row_group_size=300,
    )
    pq.write_table(pa.table({"x": [1, 2, 3]}), p2)

    from dbqt_spark.operators.partitioning import rowgroup_stats

    got = rowgroup_stats(spark, [p1, p2]).collect()
    assert [(r["file_name"], r["row_group_id"]) for r in got] == [
        ("a.parquet", 0), ("a.parquet", 1), ("a.parquet", 2),
        ("a.parquet", 3), ("b.parquet", 0),
    ]
    con = duckdb.connect()
    for path in (p1, p2):
        rows = {
            r[0]: r
            for r in con.execute(
                """
                SELECT row_group_id,
                       any_value(row_group_num_rows),
                       count(*),
                       SUM(total_compressed_size),
                       SUM(total_uncompressed_size),
                       SUM(CASE WHEN stats_min_value IS NOT NULL
                                THEN 1 ELSE 0 END)
                FROM parquet_metadata(?) GROUP BY 1
                """,
                [path],
            ).fetchall()
        }
        import os

        base = os.path.basename(path)
        for r in got:
            if r["file_name"] != base:
                continue
            d = rows[r["row_group_id"]]
            assert r["n_rows"] == d[1]
            assert r["n_cols"] == d[2]
            assert r["compressed_bytes"] == d[3]
            assert r["uncompressed_bytes"] == d[4]
            assert r["n_stats_cols"] == d[5]


def test_zorder_key_int_hand_computed(spark):
    """The integer-exact arm matches a hand-computed Morton interleave
    on a tiny 2-bit domain, and NULLs land in bucket 0."""
    from dbqt_spark.operators.partitioning import zorder_key_int

    # x,y in 0..3 with bits_per_col=2: bucket == value (min 0, max 3,
    # rng 4 -> (v*4) div 4 == v); z = interleave bits of (x, y)
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long")
    z = zorder_key_int(df, ["x", "y"], bits_per_col=2)
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", z).collect()
    }

    def morton(x, y):
        out = 0
        for b in range(2):
            out |= ((x >> b) & 1) << (2 * b)       # col 0 -> even bits
            out |= ((y >> b) & 1) << (2 * b + 1)   # col 1 -> odd bits
        return out

    for (x, y), zv in got.items():
        assert zv == morton(x, y), (x, y, zv)
    # locality sanity: (0,0) and (1,1) are closer in z than (0,0),(3,3)
    assert got[(1, 1)] < got[(3, 3)]

    dfn = spark.createDataFrame(
        [(None, 0), (0, 0), (3, 3)], "x long, y long"
    )
    zn = zorder_key_int(dfn, ["x", "y"], bits_per_col=2)
    rows_n = {
        (r.x, r.y): r.z for r in dfn.withColumn("z", zn).collect()
    }
    assert rows_n[(None, 0)] == rows_n[(0, 0)] == 0


def test_zorder_key_int_guards(spark):
    from dbqt_spark.operators.partitioning import zorder_key_int

    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="63"):
        zorder_key_int(df, ["a", "b"], bits_per_col=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key_int(df, [])
    # range * buckets overflowing a long is refused, not wrapped
    big = spark.createDataFrame(
        [(0,), (1 << 60,)], "a long"
    )
    with pytest.raises(ValueError, match="overflows"):
        zorder_key_int(big, ["a"], bits_per_col=8)
