"""Streaming NEAR-duplicate ingest gate — MinHash against an
accumulated store.

``streaming/dedup.py`` gates exact duplicates; this module is the next
stage of the corpus front door: drop arriving documents that are
*near*-duplicates of anything already accepted, across micro-batches.
No reference analog (dbqt has no streaming surface); the shape follows
the standard ``foreachBatch`` + state-directory pattern used by
Kafka-to-lakehouse ingest pipelines, because Structured Streaming's
built-in stateful operators cannot express a similarity join.

Per micro-batch (``minhash_gate_batch``):

1. band-hash the batch's documents (ONE Arrow pandas_udf —
   ``operators.dedup.minhash_band_hashes``),
2. equi-join those bands against the persisted band store (only
   documents sharing an LSH bucket are candidates — never all-pairs),
3. exact-verify candidates with n-gram Jaccard against the stored
   texts (broadcast of the candidate ids only),
4. greedily keep batch survivors: within the batch, earlier ids win
   (driver-side greedy over the bounded verified pair set — the same
   first-wins contract ``dropDuplicates`` gives exact dedup),
5. append the survivors' bands + texts to the store (parquet).

Scale notes: the store is parquet keyed by (band_id, band_hash) — at
100 TB bucket it by band_hash so step 2 is a co-bucketed join, and
compact it periodically. State grows with ACCEPTED (unique) docs only,
the minimum any exact-verify near-dup gate can hold. The within-batch
greedy pulls only verified pairs (not docs) to the driver, bounded by
the bucket cap.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    BROADCAST_PAIR_LIMIT,
    minhash_band_hashes,
    minhash_near_duplicates,
)


def _store_paths(store_dir: str) -> tuple[str, str]:
    return os.path.join(store_dir, "bands"), os.path.join(store_dir, "docs")


def _check_store_params(
    store_dir: str, num_hashes: int, bands: int, shingle_n: int
) -> None:
    """Persist the banding parameters with the store and refuse to mix:
    bands computed under different (num_hashes, bands, shingle_n) never
    equi-join each other, so a parameter drift would silently admit
    every cross-batch near-duplicate (same precedent as
    ``similarity.lsh_write``'s meta.json)."""
    import json

    meta_path = os.path.join(store_dir, "meta.json")
    params = {
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_n": shingle_n,
    }
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            stored = json.load(f)
        if stored != params:
            raise ValueError(
                f"near-dup store at {store_dir} was built with {stored}; "
                f"refusing to gate with {params} — matching would "
                "silently fail"
            )
        return
    os.makedirs(store_dir, exist_ok=True)
    with open(meta_path, "w") as f:
        json.dump(params, f)


def _jaccard_verified(
    cand: DataFrame,
    new_docs: DataFrame,
    old_docs: DataFrame,
    threshold: float,
    shingle_n: int,
    broadcast_cand: bool,
) -> DataFrame:
    """(new_id, old_id) pairs whose exact shingle Jaccard >= threshold.
    ``cand`` is the ids-only candidate frame; texts attach via joins
    (new side tiny = the batch; old side filtered by broadcast semi-join
    on the candidate ids, so the store is never fully read into the
    verify)."""

    @F.pandas_udf("double")
    def jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        from ..operators.dedup import _ascii_tokens

        def sh(text):
            toks = _ascii_tokens(text)
            if len(toks) >= shingle_n:
                return {
                    " ".join(toks[i : i + shingle_n])
                    for i in range(len(toks) - shingle_n + 1)
                }
            return {" ".join(toks)}

        out = []
        for a, b in zip(ta, tb):
            sa, sb = sh(a), sh(b)
            union = len(sa | sb)
            out.append(len(sa & sb) / union if union else 0.0)
        return pd.Series(out, dtype="float64")

    bcast = F.broadcast if broadcast_cand else (lambda d: d)
    with_new = cand.join(
        new_docs.select(
            F.col("id").alias("new_id"), F.col("text").alias("__tn")
        ),
        "new_id",
    )
    old_needed = old_docs.join(
        bcast(cand.select(F.col("old_id").alias("id")).distinct()),
        "id",
        "left_semi",
    )
    with_both = with_new.join(
        old_needed.select(
            F.col("id").alias("old_id"), F.col("text").alias("__to")
        ),
        "old_id",
    )
    return (
        with_both.withColumn("__j", jac("__tn", "__to"))
        .filter(F.col("__j") >= threshold)
        .select("new_id", "old_id")
    )


def minhash_gate_batch(
    batch_df: DataFrame,
    store_dir: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Run one micro-batch through the near-dup gate; returns the KEPT
    rows (eagerly — the store append must happen inside the batch) and
    appends their bands + texts to ``store_dir``. Usable directly on
    batch frames for backfills, or inside ``foreachBatch``.

    Retry-safe: self-pairs (a doc matching its own already-appended copy
    after a mid-batch failure) are excluded from the cross-store
    candidates, so a re-executed batch keeps the same survivors; the
    duplicate band/doc rows a partial retry leaves in the store are
    harmless (candidate pairs are distinct-ed). Exactly-once delivery of
    the OUTPUT is the caller's job via the batch-id marker
    (``streaming_minhash_dedup``)."""
    spark = batch_df.sparkSession
    _check_store_params(store_dir, num_hashes, bands, shingle_n)
    band_path, doc_path = _store_paths(store_dir)
    docs = batch_df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )

    # 1. survivors of the WITHIN-batch near-dup set, earlier ids win.
    #    minhash_near_duplicates emits verified (id_a < id_b) pairs; the
    #    greedy walk keeps a doc unless it pairs with an already-kept one
    #    (first-wins, same contract as dropDuplicates for exact dedup).
    pairs = minhash_near_duplicates(
        docs,
        text_col="text",
        id_col="id",
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
    )
    pair_rows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    if pairs.is_cached:
        pairs.unpersist()
    neighbors: dict = {}
    for a, b in pair_rows:
        neighbors.setdefault(b, set()).add(a)
        neighbors.setdefault(a, set()).add(b)
    dropped_within: set = set()
    for did in sorted(
        {i for pair in pair_rows for i in pair}
    ):  # ascending: earlier ids decided first
        if any(
            n < did and n not in dropped_within for n in neighbors.get(did, ())
        ):
            dropped_within.add(did)
    batch_kept = docs
    if dropped_within:
        batch_kept = docs.filter(~F.col("id").isin(sorted(dropped_within)))

    # 2. candidates vs the accumulated store: band equi-join, then exact
    #    Jaccard verify against stored texts. new_id != old_id excludes
    #    the self-pairs a retried batch's own store rows would produce.
    #    The candidate set is persisted and COUNTED (it feeds both verify
    #    joins — re-evaluation at a silent limit would be
    #    nondeterministic) and the broadcast is gated on the measured
    #    count, mirroring dedup.BROADCAST_PAIR_LIMIT.
    cand = None
    if os.path.exists(band_path):
        store_bands = spark.read.parquet(band_path)
        store_docs = spark.read.parquet(doc_path)
        new_bands = batch_kept.select(
            F.col("id").alias("new_id"),
            F.posexplode(
                minhash_band_hashes("text", num_hashes, bands, shingle_n)
            ).alias("band_id", "band_hash"),
        )
        cand = (
            new_bands.join(store_bands, ["band_id", "band_hash"])
            .filter(F.col("new_id") != F.col("old_id"))
            .select("new_id", "old_id")
            .distinct()
            .persist()
        )
        n_cand = cand.count()
        matched = _jaccard_verified(
            cand, batch_kept, store_docs, threshold, shingle_n,
            broadcast_cand=n_cand <= BROADCAST_PAIR_LIMIT,
        )
        batch_kept = batch_kept.join(
            F.broadcast(matched.select(F.col("new_id").alias("id")).distinct()),
            "id",
            "left_anti",
        )

    # 3. materialize survivors CLUSTER-SIDE (staging parquet — document
    #    bytes never route through the driver), then append their bands +
    #    texts to the store
    staging = os.path.join(store_dir, "_staging")
    batch_kept.write.mode("overwrite").parquet(staging)
    if cand is not None:
        cand.unpersist()
    kept = spark.read.parquet(staging)
    kept.select(
        F.col("id").alias("old_id"),
        F.posexplode(
            minhash_band_hashes("text", num_hashes, bands, shingle_n)
        ).alias("band_id", "band_hash"),
    ).write.mode("append").parquet(band_path)
    kept.write.mode("append").parquet(doc_path)
    return kept


def streaming_minhash_dedup(
    stream_df: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Wire the gate into a stream: every micro-batch flows through
    ``minhash_gate_batch``; survivors append to ``out_dir``. Returns the
    StreamingQuery (caller awaits termination).

    Idempotent under micro-batch retries (the foreachBatch contract): a
    per-batch marker file skips fully-processed batches, and the gate
    itself excludes self-pairs so a partially-appended store does not
    change a re-run's survivors — re-execution appends no duplicate
    output rows."""

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(store_dir, "_batches", f"{batch_id}.done")
        if os.path.exists(marker):
            return  # retried batch already fully processed
        kept = minhash_gate_batch(
            batch_df, store_dir, threshold, text_col, id_col
        )
        kept.withColumnRenamed("id", id_col).withColumnRenamed(
            "text", text_col
        ).write.mode("append").parquet(out_dir)
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as f:
            f.write("")

    return (
        stream_df.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
