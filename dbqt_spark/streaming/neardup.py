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

Scale notes: the band store is a BUCKETED external parquet table keyed
by ``band_key = xxhash64(band_id, band_hash)`` (``NEARDUP_STORE_BUCKETS``
buckets) — folding the band id into one join key lets the planner use
the bucket layout (it declines bucketed scans when bucket columns are a
strict subset of the join keys), so step 2's candidate join needs no
shuffle on the store side; only the (small) arriving batch is exchanged
to match the buckets (``test_neardup_store_join_no_store_exchange``).
A band_key collision across different bands merely adds a candidate
pair that the exact-Jaccard verify discards. Appends add one file per
bucket per batch; run ``compact_store`` periodically to rewrite them
into one file per bucket. State grows with ACCEPTED (unique) docs only,
the minimum any exact-verify near-dup gate can hold. The within-batch
greedy pulls only verified pairs (not docs) to the driver, bounded by
the bucket cap.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NEARDUP_STORE_BUCKETS = 32

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
        if {k: stored.get(k) for k in params} != params:
            raise ValueError(
                f"near-dup store at {store_dir} was built with {stored}; "
                f"refusing to gate with {params} — matching would "
                "silently fail"
            )
        band_path, _ = _store_paths(store_dir)
        if (
            stored.get("store_format") != "bucketed_bands_v2"
            and os.path.exists(band_path)
        ):
            raise ValueError(
                f"near-dup store at {store_dir} uses the pre-v2 unbucketed "
                "band layout; rebuild it (re-run the gate over the accepted "
                "docs into a fresh store_dir) before gating"
            )
        return
    os.makedirs(store_dir, exist_ok=True)
    with open(meta_path, "w") as f:
        json.dump({**params, "store_format": "bucketed_bands_v2"}, f)


def _band_keys(
    docs: DataFrame,
    out_id: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
) -> DataFrame:
    """(out_id, band_key) rows for every doc band — ONE Arrow pass via
    ``minhash_band_hashes``, band id folded into the single join key."""
    return docs.select(
        F.col("id").alias(out_id),
        F.posexplode(
            minhash_band_hashes("text", num_hashes, bands, shingle_n)
        ).alias("band_id", "band_hash"),
    ).select(
        out_id, F.xxhash64("band_id", "band_hash").alias("band_key")
    )


def _bands_table(store_dir: str) -> str:
    """Catalog name for the store's bucketed band table — derived from
    the (absolute) store path so concurrent gates on different stores
    never collide."""
    digest = hashlib.md5(os.path.abspath(store_dir).encode()).hexdigest()[:12]
    return f"neardup_bands_{digest}"


def _register_bands_table(
    spark: SparkSession, store_dir: str, band_path: str
) -> str:
    """(Re-)register the external bucketed band table for ``store_dir``.
    The files at ``band_path`` are only ever produced by the bucketed
    writer below, so declaring CLUSTERED BY (band_hash) is truthful; a
    fresh session (new metastore) re-registers from the parquet footer
    schema."""
    tbl = _bands_table(store_dir)
    if not spark.catalog.tableExists(tbl):
        schema = spark.read.parquet(band_path).schema
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
        )
        spark.sql(
            f"CREATE TABLE {tbl} ({cols}) USING PARQUET "
            f"CLUSTERED BY (band_key) SORTED BY (band_key) "
            f"INTO {NEARDUP_STORE_BUCKETS} BUCKETS "
            f"LOCATION '{band_path}'"
        )
    return tbl


def _append_bands(spark: SparkSession, store_dir: str, bands_df: DataFrame) -> None:
    """Append band rows through the bucketed writer (one file per bucket
    per append; ``compact_store`` merges them)."""
    band_path, _ = _store_paths(store_dir)
    if os.path.exists(band_path):
        _register_bands_table(spark, store_dir, band_path)
    (
        bands_df.write.mode("append")
        .bucketBy(NEARDUP_STORE_BUCKETS, "band_key")
        .sortBy("band_key")
        .option("path", band_path)
        .format("parquet")
        .saveAsTable(_bands_table(store_dir))
    )


def compact_store(spark: SparkSession, store_dir: str) -> None:
    """Rewrite the band store to ONE file per bucket (appends leave one
    file per bucket per micro-batch). Offline maintenance: run between
    gate invocations, not concurrently with one."""
    band_path, _ = _store_paths(store_dir)
    if not os.path.exists(band_path):
        return
    tbl = _register_bands_table(spark, store_dir, band_path)
    tmp = band_path + ".compact"
    compact_tbl = tbl + "_compact"
    spark.sql(f"DROP TABLE IF EXISTS {compact_tbl}")
    (
        # PLAIN parquet read, not spark.table(tbl): the bucketed scan
        # already reports HashPartitioning(band_key), so Catalyst elides
        # the repartition and every input split writes its own file —
        # the plain read + one shuffle lands exactly one file per bucket
        # (repartition and bucketBy share the Murmur3 partition id).
        spark.read.parquet(band_path)
        .repartition(NEARDUP_STORE_BUCKETS, "band_key")
        .write.mode("overwrite")
        .bucketBy(NEARDUP_STORE_BUCKETS, "band_key")
        .sortBy("band_key")
        .option("path", tmp)
        .format("parquet")
        .saveAsTable(compact_tbl)
    )
    spark.sql(f"DROP TABLE IF EXISTS {compact_tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(band_path)
    os.rename(tmp, band_path)
    _register_bands_table(spark, store_dir, band_path)


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
        # left-anti on a broadcast frame, not a literal isin() IN-list:
        # the dropped set is bounded (verified pairs <= the bucket cap)
        # but an IN-list grows the PLAN with it; the anti-join keeps the
        # plan constant-size (same shape as the store-match drop below).
        dropped_df = spark.createDataFrame(
            [(i,) for i in sorted(dropped_within)],
            schema=docs.select("id").schema,
        )
        batch_kept = docs.join(F.broadcast(dropped_df), "id", "left_anti")

    # 2. candidates vs the accumulated store: band equi-join, then exact
    #    Jaccard verify against stored texts. new_id != old_id excludes
    #    the self-pairs a retried batch's own store rows would produce.
    #    The candidate set is persisted and COUNTED (it feeds both verify
    #    joins — re-evaluation at a silent limit would be
    #    nondeterministic) and the broadcast is gated on the measured
    #    count, mirroring dedup.BROADCAST_PAIR_LIMIT.
    cand = None
    # doc_path is checked too: a first-batch retry after the bands append
    # landed but the docs append did not must not die reading a missing
    # docs dir (it skips the cross-store step — the store holds only this
    # batch's own rows, which the self-pair exclusion discards anyway).
    if os.path.exists(band_path) and os.path.exists(doc_path):
        store_bands = spark.table(
            _register_bands_table(spark, store_dir, band_path)
        )
        store_docs = spark.read.parquet(doc_path)
        new_bands = _band_keys(
            batch_kept, "new_id", num_hashes, bands, shingle_n
        )
        cand = (
            new_bands.join(store_bands, "band_key")
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
    _append_bands(
        spark,
        store_dir,
        _band_keys(kept, "old_id", num_hashes, bands, shingle_n),
    )
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

    Idempotent under micro-batch retries (the foreachBatch contract):
    each batch's survivors land in their own ``out_dir/batch_id=N``
    partition via write-to-hidden-dir + one atomic ``os.rename``, so a
    retry REPLACES a half-published batch instead of appending next to
    it — no duplicate output rows in any failure window. The per-batch
    marker then short-circuits fully-processed batches, and the gate
    itself excludes self-pairs so a partially-appended store does not
    change a re-run's survivors. Read the output with
    ``spark.read.parquet(out_dir)`` — partition discovery surfaces
    ``batch_id`` as a lineage column."""

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(store_dir, "_batches", f"{batch_id}.done")
        if os.path.exists(marker):
            return  # retried batch already fully processed
        kept = minhash_gate_batch(
            batch_df, store_dir, threshold, text_col, id_col
        )
        # stage under a dot-prefixed name (ignored by Spark's file
        # index), publish with one atomic dir rename, THEN write the
        # marker: every crash window re-runs into the same final dir.
        inflight = os.path.join(out_dir, f".inflight-{batch_id}")
        final = os.path.join(out_dir, f"batch_id={batch_id}")
        kept.withColumnRenamed("id", id_col).withColumnRenamed(
            "text", text_col
        ).write.mode("overwrite").parquet(inflight)
        if os.path.exists(final):  # half-published by a failed attempt
            shutil.rmtree(final)
        os.rename(inflight, final)
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as f:
            f.write("")

    return (
        stream_df.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
