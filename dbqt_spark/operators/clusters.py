"""Connected components over a pair graph — near-dup CLUSTER assignment.

Beyond the reference surface (north star): pairwise near-dup output
(``minhash_near_duplicates`` et al.) is not directly actionable when
duplicates chain (A~B, B~C, no A~C pair): keep-smaller-id drops both B
and C, and per-pair greedy needs a driver walk. The standard resolution
is the transitive closure — assign every doc the MINIMUM id reachable
through the pair graph (its cluster id), then keep one representative
per cluster.

Algorithm: iterative min-label propagation (the simple half of the
small-star/large-star family — Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014). Each round joins the current labels
across the (bidirected) edge list and takes the min of each node's own
label and its neighbors' labels; fixpoint when no label changes. Rounds
needed = graph diameter in the worst case — near-dup graphs are
overwhelmingly tiny star-shaped clusters, so 3-5 rounds is typical.

Scale shape per round: one shuffle join (labels x edges, both hashed on
the node id) + one groupBy min (partial-aggregated). The frame is
``localCheckpoint``-ed each round to truncate lineage — an iterative
plan that keeps growing is the classic Spark-iteration failure. The
convergence check is a one-row ``agg(sum(changed))`` — the only
driver-side data movement; labels themselves never leave the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
    localize_limit: "int | None" = None,
) -> DataFrame:
    """(id, cluster_id) for every node appearing in ``pairs``;
    cluster_id is the minimum node id reachable through the pair graph.
    Raises if the fixpoint is not reached within ``max_iterations``
    (pathological diameter — raise the limit or pre-contract the
    graph).

    Hybrid execution (the same localize contract as
    ``dedup._eager_pairs_from_banded``): when the pair set fits under
    ``localize_limit`` (default ``dedup.BROADCAST_PAIR_LIMIT``) the
    components are resolved driver-side with union-find — O(pairs
    alpha) instant, no per-round jobs — because a near-dup pair set is
    bounded by construction (bucket caps) and collecting ids-only pairs
    is exactly what the verify stage already broadcasts. Only an
    over-limit pair graph runs the distributed propagation loop.

    The result never references the input's lineage (a LocalRelation on
    the localized path, checkpointed frames on the distributed one), so
    a persisted ``pairs`` input (dedup's over-limit contract) can be
    released by the caller as soon as this returns. The ids-only
    projection is persisted around the probe so the over-limit path
    never executes the (expensive) upstream pair pipeline twice."""
    from .dedup import BROADCAST_PAIR_LIMIT

    limit = (
        BROADCAST_PAIR_LIMIT if localize_limit is None else localize_limit
    )
    ids_only = pairs.select(
        F.col(id_a).alias("__a"), F.col(id_b).alias("__b")
    ).persist()
    try:
        probe = ids_only.limit(limit + 1).collect()
        if len(probe) <= limit:
            return _local_components(pairs, probe, id_a)
        return _distributed_components(ids_only, max_iterations)
    finally:
        ids_only.unpersist()


def _local_components(pairs, probe, id_a) -> DataFrame:
    """Driver union-find (union by min id, so the root IS the cluster
    id) over a bounded collected pair list."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in probe:
        a, b = r[0], r[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = sorted((i, find(i)) for i in parent)
    schema = pairs.select(
        F.col(id_a).alias("id"), F.col(id_a).alias("cluster_id")
    ).schema
    return pairs.sparkSession.createDataFrame(rows, schema)


def _distributed_components(ids_only, max_iterations: int) -> DataFrame:
    """Min-label propagation over the persisted (__a, __b) frame;
    ``localCheckpoint`` materializes from the cache, so the upstream
    pair pipeline is never re-executed."""
    edges = (
        ids_only.select(F.col("__a").alias("src"), F.col("__b").alias("dst"))
        .unionByName(
            ids_only.select(
                F.col("__b").alias("src"), F.col("__a").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        # each node's new label: min(own, min over neighbors' labels)
        neighbor_min = (
            edges.join(
                labels.withColumnRenamed("id", "dst").withColumnRenamed(
                    "cluster_id", "nbr_label"
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nbr_label").alias("nbr_min"))
            .withColumnRenamed("src", "id")
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
                (
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                    < F.col("cluster_id")
                )
                .cast("int")
                .alias("__changed"),
            )
            .localCheckpoint()
        )
        n_changed = updated.agg(F.sum("__changed")).collect()[0][0] or 0
        labels = updated.drop("__changed")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def near_dup_clusters(
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster view of a near-dup pair set: one row per doc APPEARING IN
    A PAIR — (doc_id, cluster_id, cluster_size, is_representative).
    Singleton docs (no pairs) are not emitted; they are their own
    implicit clusters. The representative (min id) is the keeper under
    the canonical-min policy, now transitively correct. A persisted
    ``pairs`` input is released here once the components are built (the
    components never reference its lineage)."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    pairs.unpersist()  # no-op unless dedup returned it persisted
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return (
        comp.withColumnRenamed("id", id_col)
        .join(sizes, "cluster_id")
        .select(
            id_col,
            F.col("cluster_id").alias("cluster_id"),
            "cluster_size",
            (F.col(id_col) == F.col("cluster_id")).alias(
                "is_representative"
            ),
        )
    )
