"""Similarity-search tiers: brute force is ground truth; LSH and IVF
must recall most of its top-k."""


def _truth_topk(spark, sf_dir, k=10):
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id = 0").select("embedding").collect()[0][0]
    return emb, list(q), [
        r["vec_id"] for r in cosine_topk(emb, list(q), k=k).collect()
    ]


def test_ivf_recall(spark, sf_dir):
    from dbqt_spark.operators.similarity import ivf_build, ivf_search

    emb, q, truth = _truth_topk(spark, sf_dir)
    assigned, centroids = ivf_build(emb, n_cells=8)
    assert assigned.select("cell").distinct().count() <= 8
    got = [
        r["vec_id"]
        for r in ivf_search(assigned, centroids, q, k=10, n_probes=8).collect()
    ]
    # probing ALL cells must equal brute force exactly
    assert got == truth


def test_ivf_partial_probe_returns_k(spark, sf_dir):
    from dbqt_spark.operators.similarity import ivf_build, ivf_search

    emb, q, truth = _truth_topk(spark, sf_dir)
    assigned, centroids = ivf_build(emb, n_cells=8)
    got = ivf_search(assigned, centroids, q, k=10, n_probes=3).collect()
    assert len(got) == 10
    # the query's own vector lives in a probed cell (its centroid is
    # nearest to itself) -> rank 1 with cosine ~1
    assert got[0]["vec_id"] == 0


def test_lsh_probe_contains_query_vector(spark, sf_dir):
    from dbqt_spark.catalog import load_table
    from dbqt_spark.operators.similarity import lsh_bucketed_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id = 0").select("embedding").collect()[0][0]
    got = lsh_bucketed_topk(emb, list(q), k=5, n_planes=8, probe_hamming=2).collect()
    assert got and got[0]["vec_id"] == 0
