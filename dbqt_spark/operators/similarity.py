"""Similarity search over embedding columns (array<float>).

North-star operator (no reference analog). Two tiers:

- ``cosine_topk``: brute-force top-k against a query vector — a single
  narrow scan (dot product via ``F.zip_with``/``F.aggregate``, JVM-side)
  + a small top-k. The correct baseline at any scale: no shuffle until
  the final k-row ordering.
- ``lsh_bucketed_topk``: random-hyperplane LSH (signed projections packed
  into a bit signature) pre-filters candidates to matching buckets before
  exact scoring — the 100 TB path where scanning every vector per query
  is wasteful. Hyperplanes are derived deterministically from a seed.
- ``knn_join_brute``: all-pairs k-NN between two (small) sets via
  broadcast cross join — utility for evaluation.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot_lit(vec_col: Column, q: list[float]) -> Column:
    """dot(vec, literal query) — zip_with + aggregate, stays in codegen."""
    qarr = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(
        F.zip_with(vec_col, qarr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            vec_col,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_scores(
    df: DataFrame,
    query: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query)) or 1.0
    v = F.col(vec_col)
    cos = _dot_lit(v, query) / (_norm(v) * F.lit(qnorm))
    return df.select(F.col(id_col), cos.alias("cosine"))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by cosine, deterministic tie-break on id. orderBy+limit over
    scored rows: Spark executes this as a per-partition top-k (TakeOrdered)
    — no full sort, no shuffle of the scored set."""
    return (
        cosine_scores(df, query, vec_col, id_col)
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature_col(
    vec_col: Column, planes: list[list[float]]
) -> Column:
    """Pack sign(dot(v, plane_i)) bits into a bigint bucket id."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = F.when(_dot_lit(vec_col, p) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return sig


def lsh_bucketed_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """ANN: score only vectors whose LSH bucket is within ``probe_hamming``
    bits of the query's bucket (multi-probe). At scale, write the data
    partitioned by bucket so this prunes parquet partitions instead of
    filtering post-scan."""
    dim = len(query)
    planes = _hyperplanes(dim, n_planes, seed)
    qsig = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query, p)) > 0:
            qsig |= 1 << i
    sig = lsh_signature_col(F.col(vec_col), planes)
    probe = F.bit_count(sig.bitwiseXOR(F.lit(qsig))) <= probe_hamming
    return (
        cosine_scores(df.filter(probe), query, vec_col, id_col)
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def ivf_build(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_iter: int = 10,
    max_train_rows: int = 10_000,
) -> tuple[DataFrame, list[list[float]]]:
    """Build an IVF index: KMeans the vectors into cells, return the
    cell-assigned table and the centroid list.

    At 100 TB the assigned table is written ``partitionBy("cell")`` so a
    probe query scans only the probed cells' files (partition pruning);
    here it stays a DataFrame. Training fits KMeans on a BOUNDED sample
    (standard IVF practice — faiss trains on ~max(10k, 39*n_cells)
    points): centroid quality saturates long before the corpus size, and
    an unbounded fit makes index build the scale bottleneck. The count
    used to size the fraction is a cheap parquet-metadata count; the
    assignment pass over the full data is unavoidable and linear."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = df.withColumn("__v", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=n_cells, seed=seed, maxIter=max_iter, featuresCol="__v")
    n = df.count()
    train = vecs.select("__v")
    if n > max_train_rows:
        # over-sample slightly so the materialized sample stays >= the
        # target with high probability; exactness is irrelevant to KMeans
        train = train.sample(
            fraction=min(1.0, 1.1 * max_train_rows / n), seed=seed
        )
    model = km.fit(train)
    assigned = (
        model.transform(vecs)
        .withColumnRenamed(model.getPredictionCol(), "cell")
        .drop("__v")
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    n_probes: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the ``n_probes`` cells whose centroids are closest to the
    query (cosine), then exact-score only those cells' vectors."""
    qnorm = math.sqrt(sum(x * x for x in query)) or 1.0

    def cos_to_query(c: list[float]) -> float:
        dot = sum(a * b for a, b in zip(c, query))
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return dot / (cn * qnorm)

    probe_cells = [
        cell
        for cell, _ in sorted(
            enumerate(cos_to_query(c) for c in centroids),
            key=lambda t: -t[1],
        )[:n_probes]
    ]
    pruned = assigned.filter(F.col("cell").isin(probe_cells))
    return (
        cosine_scores(pruned, query, vec_col, id_col)
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def knn_join_brute(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All-pairs k-NN via broadcast cross join + window top-k. Only for a
    small ``right`` side (it is broadcast); for large×large use the LSH
    bucketing to band both sides first."""
    from pyspark.sql import Window

    l = left.select(
        F.col(id_col).alias("left_id"), F.col(vec_col).alias("__lv")
    )
    r = right.select(
        F.col(id_col).alias("right_id"), F.col(vec_col).alias("__rv")
    )
    dot = F.aggregate(
        F.zip_with("__lv", "__rv", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (_norm(F.col("__lv")) * _norm(F.col("__rv")))
    scored = (
        l.crossJoin(F.broadcast(r))
        .filter(F.col("left_id") != F.col("right_id"))
        .select("left_id", "right_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("left_id").orderBy(F.desc("cosine"), F.col("right_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )
