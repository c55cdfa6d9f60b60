#!/usr/bin/env python
"""Stage-by-stage timing of the vectorized minhash_near_duplicates at sf0.1."""
import time

from pyspark.sql import functions as F

from dbqt_spark.catalog import load_table
from dbqt_spark.operators.dedup import (
    _eager_pairs_from_banded,
    _spread,
    minhash_band_hashes,
    shingles_col,
)
from dbqt_spark.session import get_spark

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile_minhash")
spark.range(1_000_000).selectExpr("sum(id)").collect()

docs = load_table(spark, sf_dir, "documents")

t0 = time.perf_counter()
banded = _spread(docs).select(
    F.col("doc_id").alias("id"),
    F.posexplode(minhash_band_hashes("text")).alias("band_id", "band_hash"),
)
n_banded = banded.count()
t1 = time.perf_counter()
print(f"banded (UDF+explode) count: {t1-t0:.3f}s ({n_banded} rows)", flush=True)

pairs, n_pairs = _eager_pairs_from_banded(
    banded,
    ["band_id", "band_hash"],
    lambda a, b: [F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")],
    1000,
    None,
)
t2 = time.perf_counter()
print(f"eager pairs: {t2-t1:.3f}s ({n_pairs} rows)", flush=True)

involved = pairs.select(F.col("id_a").alias("id")).union(
    pairs.select(F.col("id_b").alias("id"))
)
sets = (
    docs.select(F.col("doc_id").alias("id"), F.col("text").alias("__t"))
    .join(F.broadcast(involved), "id", "left_semi")
    .select("id", shingles_col("__t", 3).alias("shingles"))
)
verified = (
    pairs.join(F.broadcast(sets.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a")), "id_a")
    .join(F.broadcast(sets.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b")), "id_b")
    .withColumn(
        "jaccard",
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")),
    )
    .filter(F.col("jaccard") >= 0.5)
    .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
)
n_v = verified.count()
t3 = time.perf_counter()
print(f"verify: {t3-t2:.3f}s ({n_v} rows)", flush=True)
print(f"TOTAL: {t3-t0:.3f}s", flush=True)

# second full pass to see which stage was first-run-only cost
t0 = time.perf_counter()
banded2 = _spread(docs).select(
    F.col("doc_id").alias("id"),
    F.posexplode(minhash_band_hashes("text")).alias("band_id", "band_hash"),
)
print(f"banded2 count: {time.perf_counter()-t0:.3f}s ({banded2.count()})", flush=True)
