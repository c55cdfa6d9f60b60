"""Persisted MinHash band index — dedup-against-corpus as a LIFECYCLE.

Beyond the reference surface (north star). ``minhash_cross_near_duplicates``
needs both frames live, so deduping every new crawl against a 100 TB
corpus would re-band the corpus per crawl. This module bands the corpus
ONCE into an on-disk index and lets every future crawl probe it — the
batch twin of the streaming gate's store (``streaming/neardup.py``),
promoted to a first-class write/append/query/compact lifecycle
(mirroring the ANN stores' ``lsh_write``/``ivf_append`` contracts in
``operators/similarity.py``).

Layout at ``path``::

    bands/      parquet (corpus_id, band_key)   band_key = xxhash64(band_id, band_hash)
    docs/       parquet (corpus_id, text)       for the exact-Jaccard verify
    meta.json   banding parameters + format tag

Scale shape of a query: the crawl is band-hashed in ONE Arrow pass
(``dedup.minhash_band_hashes``), its (id, band_key) rows BROADCAST
against the band scan — the index side is read in place with no shuffle
at any index size (the same plan property as the streaming gate's
candidate join) — and only candidate-involved index docs are ever
tokenized for the verify (``dedup._attach_texts_and_verify``'s
broadcast invariant). Bucket caps apply symmetrically: the stored bands
are capped per append batch, the query side per probe, with drops
observable through ``drop_stats`` ({'query': ..., 'index': ...} — the
same accounting parity as ``minhash_cross_near_duplicates``).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    _attach_texts_and_verify,
    _cap_buckets_eager,
    _spread,
    minhash_band_hashes,
)

MINHASH_INDEX_BUCKETS = 32


def _paths(path: str) -> tuple[str, str, str]:
    return (
        os.path.join(path, "bands"),
        os.path.join(path, "docs"),
        os.path.join(path, "meta.json"),
    )


def _band_key_rows(
    df: DataFrame,
    out_id: str,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
) -> DataFrame:
    """(out_id, band_key) rows — one Arrow pass, band id folded into a
    single join key (a cross-band xxhash64 collision only adds a
    candidate the exact verify discards)."""
    return _spread(df).select(
        F.col(id_col).alias(out_id),
        F.posexplode(
            minhash_band_hashes(text_col, num_hashes, bands, shingle_n)
        ).alias("band_id", "band_hash"),
    ).select(out_id, F.xxhash64("band_id", "band_hash").alias("band_key"))


def _load_meta(path: str) -> dict:
    _, _, meta_path = _paths(path)
    if not os.path.exists(meta_path):
        raise ValueError(
            f"no MinHash index at {path} (meta.json missing) — build one "
            "with minhash_index_write first"
        )
    with open(meta_path) as f:
        return json.load(f)


def minhash_index_write(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: int | None = 1000,
    drop_stats: dict | None = None,
) -> None:
    """Build the index from a corpus: band rows + doc texts + meta.
    Overwrites an existing index at ``path``. Oversized band buckets
    are dropped (observable via ``drop_stats``) so no stored bucket is
    ever a quadratic candidate bomb for future probes."""
    band_path, doc_path, meta_path = _paths(path)
    banded = _band_key_rows(
        df, "corpus_id", text_col, id_col, num_hashes, bands, shingle_n
    )
    if max_bucket_size is not None:
        banded = banded.persist()
        capped = _cap_buckets_eager(
            banded, ["band_key"], max_bucket_size, drop_stats
        )
    else:
        capped = banded
    os.makedirs(path, exist_ok=True)
    # rebuild ordering: retire the OLD meta before touching data, write
    # the new meta LAST. A crash mid-rebuild then leaves an index with
    # no meta.json — a loud _load_meta error — instead of new-parameter
    # bands under old-parameter meta, which would band every probe with
    # the stale parameters and silently miss every near-dup.
    if os.path.exists(meta_path):
        os.remove(meta_path)
    _write_bands_and_docs(
        capped, df, band_path, doc_path, text_col, id_col, "overwrite"
    )
    if max_bucket_size is not None:
        banded.unpersist()
    with open(meta_path, "w") as f:
        json.dump(
            {
                "num_hashes": num_hashes,
                "bands": bands,
                "shingle_n": shingle_n,
                "max_bucket_size": max_bucket_size,
                "store_format": "minhash_index_v1",
            },
            f,
        )


def minhash_index_append(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    drop_stats: dict | None = None,
) -> None:
    """Append a corpus batch to an existing index. The banding
    parameters come from meta.json — bands computed under different
    (num_hashes, bands, shingle_n) never equi-join each other, so a
    parameter drift would silently miss every cross-batch near-dup
    (same refusal contract as the streaming gate's
    ``_check_store_params``). The per-batch bucket cap is re-applied;
    note a band_key can still accrue up to cap x n_batches rows across
    appends — the same documented caveat as the gate's store."""
    meta = _load_meta(path)
    band_path, doc_path, _ = _paths(path)
    banded = _band_key_rows(
        df,
        "corpus_id",
        text_col,
        id_col,
        int(meta["num_hashes"]),
        int(meta["bands"]),
        int(meta["shingle_n"]),
    )
    cap = meta.get("max_bucket_size")
    if cap is not None:
        banded = banded.persist()
        capped = _cap_buckets_eager(
            banded, ["band_key"], int(cap), drop_stats
        )
    else:
        capped = banded
    _write_bands_and_docs(
        capped, df, band_path, doc_path, text_col, id_col, "append"
    )
    if cap is not None:
        banded.unpersist()


def _write_bands_and_docs(
    capped: DataFrame,
    df: DataFrame,
    band_path: str,
    doc_path: str,
    text_col: str,
    id_col: str,
    mode: str,
) -> None:
    """The band and doc writes touch disjoint directories from
    independent inputs — submitted as CONCURRENT jobs so a build/append
    pays one scheduling + commit latency, not two (the same shape as
    the streaming gate's per-batch appends)."""
    from concurrent.futures import ThreadPoolExecutor

    def _bands() -> None:
        capped.write.mode(mode).parquet(band_path)

    def _docs() -> None:
        df.select(
            F.col(id_col).alias("corpus_id"), F.col(text_col).alias("text")
        ).write.mode(mode).parquet(doc_path)

    with ThreadPoolExecutor(max_workers=2) as pool:
        for f in [pool.submit(_bands), pool.submit(_docs)]:
            f.result()


def minhash_index_compact(spark: SparkSession, path: str) -> None:
    """Rewrite bands into ``MINHASH_INDEX_BUCKETS`` band_key-clustered,
    key-sorted files and docs into id-clustered files (appends leave
    files per batch). Offline maintenance, crash-recoverable: the swap
    is two renames per directory; a crash inside the window parks the
    data at ``.old`` and the next compaction rolls it back (the same
    discipline as ``streaming/neardup.compact_store``)."""
    band_path, doc_path, _ = _paths(path)
    _load_meta(path)  # existence check
    for data_path, key in ((band_path, "band_key"), (doc_path, "corpus_id")):
        old = data_path + ".old"
        if not os.path.exists(data_path) and os.path.exists(old):
            os.rename(old, data_path)  # crashed mid-swap: roll back
        if not os.path.exists(data_path):
            continue
        if os.path.exists(old):
            shutil.rmtree(old)
        tmp = data_path + ".compact"
        (
            spark.read.parquet(data_path)
            .repartition(MINHASH_INDEX_BUCKETS, key)
            .sortWithinPartitions(key)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        os.rename(data_path, old)
        os.rename(tmp, data_path)
        shutil.rmtree(old)


def minhash_index_query(
    query_df: DataFrame,
    path: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = 1000,
    drop_stats: dict | None = None,
    broadcast_query: bool = True,
) -> DataFrame:
    """Near-dup pairs of a new crawl against the index: (query_id,
    corpus_id, jaccard) — the ``minhash_cross_near_duplicates`` result
    contract, computed WITHOUT re-banding the corpus. Ids are
    independent keyspaces (no self-pair exclusion); disjointness is the
    caller's contract, exactly as in the live-frames operator.

    ``broadcast_query=True`` (the default, and the point of an index —
    crawls are batch-sized, the corpus is the big side) broadcasts the
    crawl's band keys against the band scan so the index never
    shuffles. For a corpus-sized crawl pass ``False``: the candidate
    join becomes a band_key shuffle on both sides (at that scale
    ``minhash_cross_near_duplicates`` over live frames is usually the
    better tool).

    The result is localCheckpoint-ed (no lineage back to the probe
    caches, which are released before returning)."""
    meta = _load_meta(path)
    band_path, doc_path, _ = _paths(path)
    # a compaction that crashed between its swap renames parks a dir at
    # .old — recover rather than probing an absent store
    for p in (band_path, doc_path):
        if not os.path.exists(p) and os.path.exists(p + ".old"):
            os.rename(p + ".old", p)
    spark = query_df.sparkSession
    q_bands = _band_key_rows(
        query_df,
        "query_id",
        text_col,
        id_col,
        int(meta["num_hashes"]),
        int(meta["bands"]),
        int(meta["shingle_n"]),
    )
    if max_bucket_size is not None:
        q_bands = q_bands.persist()
        stats: dict = {}
        q_capped = _cap_buckets_eager(
            q_bands, ["band_key"], max_bucket_size, stats
        )
        if drop_stats is not None:
            drop_stats["query"] = stats
            # stored-side drops happened at write/append time; surface
            # the cap so callers know the symmetric guard was applied
            drop_stats["index"] = {
                "max_bucket_size": meta.get("max_bucket_size")
            }
    else:
        q_capped = q_bands
    store_bands = spark.read.parquet(band_path)
    q_side = F.broadcast(q_capped) if broadcast_query else q_capped
    cands = (
        q_side.join(store_bands, "band_key")
        .select("query_id", "corpus_id")
        .distinct()
        .persist()
    )
    n_cand = cands.count()
    verified = _attach_texts_and_verify(
        cands,
        n_cand,
        query_df.select(
            F.col(id_col).alias("__id"), F.col(text_col).alias("__t")
        ),
        spark.read.parquet(doc_path).select(
            F.col("corpus_id").alias("__id"), F.col("text").alias("__t")
        ),
        "query_id",
        "corpus_id",
        int(meta["shingle_n"]),
        threshold,
    )
    result = verified.localCheckpoint()
    cands.unpersist()
    if max_bucket_size is not None:
        q_bands.unpersist()
    return result
