"""Plan-regression tests: the physical plans we rely on for scale must
not silently degrade. These assert Catalyst behaviors (pushdown, column
pruning, broadcast joins, partial aggregation) rather than results."""

from pyspark.sql import functions as F


from dbqt_spark.plans import formatted_plan as _formatted_plan


def test_filter_pushdown_and_pruning(spark, sf_dir):
    from dbqt_spark.queries import q_rowcount_filtered

    plan = _formatted_plan(q_rowcount_filtered(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan
    # column pruning: scan must read only the two referenced columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_quantity" in read_schema and "l_shipdate" in read_schema
    assert "l_extendedprice" not in read_schema


def test_join_queries_broadcast_dimensions(spark, sf_dir):
    from dbqt_spark.queries import q_revenue_by_nation, q_top_revenue_orders

    for q in (q_top_revenue_orders, q_revenue_by_nation):
        plan = _formatted_plan(q(spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        # the fact table must not be exchanged before its joins
        assert "SortMergeJoin" not in plan


def test_profile_single_scan(spark, sf_dir):
    """The profiler must plan ONE scan of the table (multi-distinct via
    Expand), not one scan per column."""
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.profile import profile_columns

    import re

    li = load_table(spark, sf_dir, "lineitem")
    plan = _formatted_plan(profile_columns(li, "lineitem"))
    # formatted explain lists each node once in the detail section
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_approx_profile_no_expand(spark, sf_dir):
    """HLL mode must avoid the Expand row multiplication entirely."""
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.profile import profile_columns

    li = load_table(spark, sf_dir, "lineitem")
    plan = _formatted_plan(profile_columns(li, "lineitem", exact=False))
    assert "Expand" not in plan


def test_schema_ir_no_data_scan(spark, sf_dir):
    """Schema extraction must not plan any parquet data scan (footer-only
    on the driver)."""
    from dbqt_spark.catalog import load_tables
    from dbqt_spark.schema_df import build_schema_df

    ir = build_schema_df(spark, load_tables(spark, sf_dir, ["lineitem", "orders"]))
    assert "Scan parquet" not in _formatted_plan(ir)


def test_compat_join_is_broadcast(spark, sf_dir):
    from dbqt_spark.queries import q_colcompare

    plan = _formatted_plan(q_colcompare(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


import pytest


@pytest.mark.parametrize("portable", [True, False])
def test_simhash_banding_is_equi_join(spark, sf_dir, portable):
    """The simhash pair search must plan the band-bucket match as a hash
    equi-join on (band, chunk) — never a cartesian/nested-loop product,
    which would be O(n^2) at corpus scale. Both fingerprint paths are
    pinned: portable (JVM md5 expressions) and default (pandas_udf —
    Catalyst extracts the UDF-bearing null filter from the join
    condition, and the equi keys MUST survive that extraction). The
    shipped operator executes this plan eagerly (and returns a localized
    result), so the assertion runs on the lazy pair plan it builds
    internally."""
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.dedup import (
        _candidate_pair_plan,
        simhash_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = simhash_fingerprints(docs, portable=portable)
    width = 64 // 4
    mask = (1 << width) - 1
    banded = fp.select(
        F.col("doc_id").alias("id"),
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", b * width).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(4)
                ]
            )
        ).alias("band", "chunk"),
    )
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    pairs_plan = _candidate_pair_plan(
        banded,
        ["band", "chunk"],
        lambda a, b: [
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        ],
        pair_filter=hamming <= 3,
    )
    plan = _formatted_plan(pairs_plan)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_asof_join_single_shuffle_no_range_join(spark, sf_dir):
    """The as-of join must be ONE hash exchange + sort + window — never a
    nested-loop range join (quadratic per key at scale)."""
    from dbqt_spark.queries import q_events_asof

    plan = _formatted_plan(q_events_asof(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    # exactly one data exchange (the per-key hash partition for the window)
    import re

    assert len(re.findall(r"Exchange \(\d+\)", plan)) == 1


def test_range_join_is_equi_join(spark, sf_dir):
    """The binned range join must plan as a hash equi-join on the bin id
    with the interval side exploded — no nested-loop product."""
    from dbqt_spark.queries import q_quantity_tiers

    plan = _formatted_plan(q_quantity_tiers(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan  # Broadcast- or ShuffledHashJoin on __bin


def test_ngram_jaccard_is_equi_join(spark, sf_dir):
    """The set-similarity join must be an equi-join on the shingle (the
    inverted index) — never a cartesian product. Asserted on the lazy
    pair plan (the operator executes it eagerly)."""
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.dedup import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(docs).select("id", "shingle").distinct()
    a, b = sh.alias("a"), sh.alias("b")
    joined = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.id") < F.col("b.id")),
    ).groupBy(F.col("a.id"), F.col("b.id")).count()
    plan = _formatted_plan(joined)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_ivf_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """A probe over a written IVF index must PRUNE partitions: the scan
    plan carries the cell filter as a PartitionFilter (only the probed
    cells' directories are read), and a round-tripped full-probe search
    still equals brute force."""
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.similarity import (
        cosine_topk,
        ivf_build,
        ivf_load,
        ivf_search,
        ivf_write,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_build(emb, n_cells=8)
    ivf_write(assigned, centroids, str(tmp_path / "ivf"))
    loaded, c2 = ivf_load(spark, str(tmp_path / "ivf"))
    assert c2 == centroids

    q = emb.filter("vec_id = 0").select("embedding").collect()[0][0]
    probe = ivf_search(loaded, c2, list(q), k=10, n_probes=3)
    plan = _formatted_plan(probe)
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines and "cell" in part_lines[0]

    truth = [r["vec_id"] for r in cosine_topk(emb, list(q), k=10).collect()]
    full = [
        r["vec_id"]
        for r in ivf_search(loaded, c2, list(q), k=10, n_probes=8).collect()
    ]
    assert full == truth


def test_ivf_knn_join_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """The batch kNN JOIN's cell equi-join must reach the
    cell-partitioned index scan as DYNAMIC partition pruning: the
    broadcast of the probe side installs a runtime
    dynamicpruningexpression on the partition column, so at any index
    size the scan reads only the cells the batch actually probes —
    never the whole index. Pins Catalyst DPP on this plan shape (a
    broadcast regression to shuffle join would silently drop it)."""
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.similarity import (
        ivf_build,
        ivf_knn_join,
        ivf_load,
        ivf_write,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_build(emb, n_cells=8)
    ivf_write(assigned, centroids, str(tmp_path / "ivf"))
    loaded, c2 = ivf_load(spark, str(tmp_path / "ivf"))
    out = ivf_knn_join(
        emb.filter("vec_id < 10"), loaded, c2, k=5, n_probes=2
    )
    plan = _formatted_plan(out)
    assert "dynamicpruningexpression" in plan.lower()
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines and "cell" in part_lines[0]
    assert "SortMergeJoin" not in plan  # probe side broadcasts


def test_lsh_index_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """Multi-probe search over a written LSH index enumerates the probe
    buckets driver-side and the scan prunes to those partitions; the
    query vector's own bucket is always probed, so vec 0 ranks first."""
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.similarity import (
        lsh_topk_from_index,
        lsh_write,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    lsh_write(emb, str(tmp_path / "lsh"), n_planes=8, seed=42)
    q = emb.filter("vec_id = 0").select("embedding").collect()[0][0]
    topk = lsh_topk_from_index(
        spark, str(tmp_path / "lsh"), list(q), k=5, probe_hamming=1
    )
    plan = _formatted_plan(topk)
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines and "bucket" in part_lines[0]
    got = topk.collect()
    assert got and got[0]["vec_id"] == 0


def test_corpus_summary_single_scan(spark, sf_dir):
    """The per-language rollup must be ONE scan of documents (compose the
    per-doc expressions, aggregate once) — not three operator scans
    joined on doc_id."""
    import re

    from dbqt_spark.queries import q_corpus_summary

    plan = _formatted_plan(q_corpus_summary(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_profile_numeric_single_scan(spark, sf_dir):
    """All numeric-column stats must come from ONE scan (wide aggregate +
    stack unpivot), not a scan per column."""
    import re

    from dbqt_spark.queries import q_profile_numeric

    plan = _formatted_plan(q_profile_numeric(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_sequence_pack_no_single_reducer(spark, sf_dir):
    """The packing prefix sum must NEVER funnel through one reducer:
    no SinglePartition exchange and no global sort anywhere — the
    per-bucket windows hash-partition on the bucket column."""
    import re

    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.packing import sequence_pack

    docs = load_table(spark, sf_dir, "documents")
    plan = _formatted_plan(sequence_pack(docs, 512))
    assert "SinglePartition" not in plan
    assert not re.search(r"Sort \[[^\]]*\], true", plan), "global sort"


def test_line_dedup_no_window(spark, sf_dir):
    """Line dedup's first-occurrence rule is a map-side-combinable
    min(struct) aggregate, never a corpus-wide Window (whose per-line
    partitions would be dominated by the single hottest line)."""
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.linededup import line_level_dedup

    docs = load_table(spark, sf_dir, "documents")
    plan = _formatted_plan(line_level_dedup(docs))
    assert "Window" not in plan


def test_corpus_card_single_scan(spark, sf_dir):
    """The per-slice card is ONE scan + aggregation (the distinct-text
    count plans as the two-level group rewrite, not a second scan or a
    join)."""
    import re

    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.textstats import corpus_card

    docs = load_table(spark, sf_dir, "documents")
    plan = corpus_card(docs, group_cols=["source", "lang"])._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"FileScan parquet", plan)) == 1
    assert "Join" not in plan


def test_new_operators_prune_scan_columns(spark, sf_dir):
    """Column pruning reaches the parquet scan for the r10 operators:
    a text op must not read lang/source/n_chars; an embedding op must
    not read label. A scan reading every column for a two-column
    computation is wrong at 100 TB."""
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.chunking import chunk_documents
    from dbqt_spark.operators.classifier import classifier_score
    from dbqt_spark.operators.kmeans import kmeans_assign
    from dbqt_spark.operators.linededup import duplicate_span_removal

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    def read_schemas(df):
        plan = _formatted_plan(df)
        return [ln for ln in plan.splitlines() if "ReadSchema" in ln]

    for frame in (
        chunk_documents(docs),
        classifier_score(docs, {"the": 0.5}),
    ):
        for ln in read_schemas(frame):
            assert "lang" not in ln and "source" not in ln, ln

    # span removal keeps every input column by contract (it returns the
    # full rows), so only the assignment path is checked for embeddings
    spans = duplicate_span_removal(docs, k=5)
    assert spans.columns[-1] == "n_removed_tokens"

    for ln in read_schemas(kmeans_assign(emb, k=2, iters=0)):
        assert "label" not in ln, ln


def test_vocab_coverage_reuses_counts_exchange(spark, sf_dir):
    """The term-counts aggregation feeds BOTH the top-k cut and the
    corpus totals; AQE must reuse its exchange so the explode + partial
    aggregate runs ONCE — a second full tokenize pass at 100 TB would
    double the query's cost."""
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.textstats import vocab_coverage

    docs = load_table(spark, sf_dir, "documents")
    df = vocab_coverage(docs, cutoffs=(100, 1000))
    df.collect()  # AQE reuse only materializes in the executed plan
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "ReusedExchange" in plan


def test_shuffle_shards_single_shuffle(spark, sf_dir):
    """One exchange (the shard key) and one window — the permutation
    must never add a second data shuffle or a global sort."""
    import re

    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.sampling import shuffle_shards
    from dbqt_spark.plans import formatted_plan

    docs = load_table(spark, sf_dir, "documents")
    plan = formatted_plan(shuffle_shards(docs, n_shards=8))
    body = plan.split("\n\n")[0]  # tree section only, not node details
    assert len(re.findall(r"\bExchange\b", body)) == 1
    assert len(re.findall(r"\bWindow\b", body)) == 1
