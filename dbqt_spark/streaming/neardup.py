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

Scale notes: the band store is plain parquet keyed by
``band_key = xxhash64(band_id, band_hash)`` and step 2's candidate join
BROADCASTS the arriving batch's band keys (micro-batch x bands rows of
two longs — megabytes at any realistic trigger size), so the store side
is scanned in place with NO shuffle at any store size
(``test_neardup_store_join_no_store_exchange``). This replaced an r7
interim design that kept the store as a catalog-registered bucketed
table: the bucketed layout also avoided the store-side exchange, but
paid seconds of metastore/commit overhead PER micro-batch append —
measured 4.5-35 s per ``saveAsTable`` vs 0.2 s for the plain append —
which dwarfs the shuffle it saved; broadcast achieves the same plan
property for free. (If micro-batches ever grow past broadcastable, the
co-bucketed catalog table is the right alternative and
``partitioning.write_bucketed`` provides it.) A band_key collision
across different bands merely adds a candidate pair that the
exact-Jaccard verify discards. Appends add files per batch; run
``compact_store`` periodically to rewrite the store into
``NEARDUP_STORE_BUCKETS`` band_key-clustered files. State grows with
ACCEPTED (unique) docs only, the minimum any exact-verify near-dup gate
can hold. The within-batch greedy pulls only verified pairs (not docs)
to the driver, bounded by the bucket cap.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NEARDUP_STORE_BUCKETS = 32

from ..operators.dedup import (
    BROADCAST_PAIR_LIMIT,
    jaccard_shingle_udf,
    minhash_band_hashes,
)


def _read_meta(store_dir: str) -> dict:
    import json

    meta_path = os.path.join(store_dir, "meta.json")
    if not os.path.exists(meta_path):
        return {}
    with open(meta_path) as f:
        return json.load(f)


def _store_paths(store_dir: str) -> tuple[str, str]:
    """(bands dir, docs dir), resolved through the manifest: bands live
    under a generation-suffixed name once ``compact_store`` has run
    (generation 0 keeps the legacy plain ``bands`` name so existing
    stores read unchanged). ``docs`` is append-only and never
    compacted/renamed, so it needs no generation."""
    gen = int(_read_meta(store_dir).get("generation", 0))
    band_name = "bands" if gen == 0 else f"bands-{gen}"
    return (
        os.path.join(store_dir, band_name),
        os.path.join(store_dir, "docs"),
    )


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
        # v2 (bucketed-table) band files are plain parquet with the same
        # (old_id, band_key) schema — readable as-is; only the pre-v2
        # (band_id, band_hash) schema needs a rebuild
        if (
            stored.get("store_format")
            not in ("bucketed_bands_v2", "plain_bands_v3")
            and os.path.exists(band_path)
        ):
            raise ValueError(
                f"near-dup store at {store_dir} uses the pre-v2 band "
                "layout; rebuild it (re-run the gate over the accepted "
                "docs into a fresh store_dir) before gating"
            )
        return
    os.makedirs(store_dir, exist_ok=True)
    with open(meta_path, "w") as f:
        json.dump({**params, "store_format": "plain_bands_v3"}, f)


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


def _append_bands(spark: SparkSession, store_dir: str, bands_df: DataFrame) -> None:
    """Append band rows as plain parquet (``compact_store`` merges the
    per-batch files periodically)."""
    band_path, _ = _store_paths(store_dir)
    bands_df.write.mode("append").parquet(band_path)


def compact_store(spark: SparkSession, store_dir: str) -> None:
    """Rewrite the band store into ``NEARDUP_STORE_BUCKETS``
    band_key-clustered, key-sorted files (appends leave files per
    micro-batch). Clustering + the within-file sort give every file a
    tight band_key min/max, so future optimizations (or an engine with
    file-level zone maps) can skip files; for the broadcast candidate
    join the win is simply fewer, larger scan splits. Offline
    maintenance: run between gate invocations, not concurrently with
    one. Object-store safe (no ``os.rename`` — object stores have no
    atomic directory rename): the compacted bands land under the NEXT
    generation's directory name, ``meta.json`` is rewritten LAST as the
    commit point, and stale generations are swept afterwards. A crash
    anywhere leaves the manifest pointing at a complete generation — the
    gate can never see an absent store and silently re-admit
    near-duplicates; half-written next-generation dirs are orphans the
    next compaction removes."""
    import json

    meta = _read_meta(store_dir)
    band_path, _ = _store_paths(store_dir)
    if not os.path.exists(band_path):
        return
    old_gen = int(meta.get("generation", 0))
    new_gen = old_gen + 1
    new_path = os.path.join(store_dir, f"bands-{new_gen}")
    (
        spark.read.parquet(band_path)
        .repartition(NEARDUP_STORE_BUCKETS, "band_key")
        .sortWithinPartitions("band_key")
        .write.mode("overwrite")
        .parquet(new_path)
    )
    meta["generation"] = new_gen
    with open(os.path.join(store_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    keep = os.path.basename(new_path)
    for name in os.listdir(store_dir):
        full = os.path.join(store_dir, name)
        if (
            os.path.isdir(full)
            and (name == "bands" or name.startswith("bands-"))
            and name != keep
        ):
            shutil.rmtree(full, ignore_errors=True)


# The verify kernel is SHARED with the batch operator
# (``operators.dedup.jaccard_shingle_udf``) so the gate's verdicts, the
# batch tier's, and the DuckDB oracles' can never diverge.


def minhash_gate_batch(
    batch_df: DataFrame,
    store_dir: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: int | None = 1000,
    driver_pair_limit: int | None = None,
    corpus: "DataFrame | None" = None,
) -> DataFrame:
    """Run one micro-batch through the near-dup gate; returns the KEPT
    rows (eagerly — the store append must happen inside the batch) and
    appends their bands + texts to ``store_dir``. Usable directly on
    batch frames for backfills, or inside ``foreachBatch``.

    ``corpus`` switches the store to POINTER mode (the minhash-index
    contract, r10): verify texts for store-side candidates come from
    the supplied (id_col, text_col) frame — which must cover every
    previously ACCEPTED doc — and the store keeps ONLY bands, never a
    second copy of the corpus text (at 100 TB the text store would
    duplicate the accepted corpus the caller already persists; the
    streaming wiring points at its own published output). Candidates
    whose text the corpus cannot supply drop at the verify's inner
    join — the streaming wiring's marker protocol guarantees coverage
    (an uncovered id can only belong to the CURRENT batch's crashed
    attempt, whose pairs the within-batch candidates already carry);
    standalone callers own that coverage contract.

    Fused shape (r7): the batch is band-hashed ONCE (one Arrow pass,
    persisted) and that frame feeds (a) the within-batch candidate
    self-join, (b) the cross-store broadcast candidate join, and (c) the
    survivor band append; within- and cross-store candidates are then
    exact-Jaccard-verified in ONE job (union tagged ``from_store``, both
    text attachments ride the same broadcast). The first gate shape ran
    ``minhash_near_duplicates`` for (a) and re-banded the survivors for
    (b)/(c) — three Arrow passes over the texts and ~10 sequential jobs
    per micro-batch; per-batch LATENCY is the operative cost of a
    streaming gate, so the passes are fused. Cross-store candidates are
    drawn from the FULL batch (not the within-batch survivors): the
    extra pairs belong to docs the within-greedy already dropped, so the
    kept set is identical and no ordering between the two phases is
    needed.

    Within-batch semantics: verified (id_a < id_b) pairs feed a greedy
    first-wins walk (earlier ids live — the same contract
    ``dropDuplicates`` gives exact dedup); cross-store matches then drop
    any batch doc near-duplicating an already-accepted one. The walk is
    HYBRID (same contract as ``clusters.connected_components``): pair
    sets within ``driver_pair_limit`` (default
    ``dedup.BROADCAST_PAIR_LIMIT``) resolve driver-side — instant, one
    bounded ids-only collect; a pathologically self-similar batch that
    overflows the limit switches to the distributed wavefront
    (``clusters.first_wins_dropped``) with identical semantics instead
    of aborting — pairs then never leave the cluster.

    Retry-safe: self-pairs (a doc matching its own already-appended copy
    after a mid-batch failure) are excluded from the cross-store
    candidates, so a re-executed batch keeps the same survivors; the
    duplicate band/doc rows a partial retry leaves in the store are
    harmless (duplicate candidate pairs re-verify idempotently and the
    greedy/store-match resolution walks SETS — r16 dropped the explicit
    pair distinct for exactly this reason). Exactly-once delivery of
    the OUTPUT is the caller's job via the batch-id marker
    (``streaming_minhash_dedup``)."""
    from ..operators.dedup import _candidate_pair_plan, _cap_buckets

    spark = batch_df.sparkSession
    _check_store_params(store_dir, num_hashes, bands, shingle_n)
    band_path, doc_path = _store_paths(store_dir)
    external_texts = corpus is not None
    # NOT spread (measured, r16): fanning a single-partition micro-batch
    # out before the band hash (the r15 item-8 treatment) made the gate
    # 5x SLOWER warm (10.4 -> 53 s solo) — the gate runs ~10 sequential
    # jobs per batch, and every one of them then schedules cores x
    # tasks + Arrow workers for ~1000-row inputs; the kernel itself is
    # not the bottleneck at trigger-bounded sizes. At corpus-scale
    # triggers the batch already arrives in many splits.
    docs = batch_df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )

    # 1. band-hash the batch once (persisted; the candidate count in
    #    step 2 is the action that materializes the cache). The bucket
    #    cap stays LAZY (in-plan broadcast anti-join) here — the gate
    #    needs no drop-stats job, and a streaming operator's per-batch
    #    latency is priced in sequential jobs, so it runs the minimum.
    batch_bands = _band_keys(docs, "id", num_hashes, bands, shingle_n).persist()
    capped = batch_bands
    if max_bucket_size is not None:
        capped = _cap_buckets(batch_bands, ["band_key"], max_bucket_size)
    within_cand = _candidate_pair_plan(
        capped,
        ["band_key"],
        lambda a, b: [
            F.col("a.id").alias("qid"),
            F.col("b.id").alias("cid"),
        ],
        # the batch side is trigger-bounded (the same bound the
        # cross-store join broadcasts on), so the self-join can
        # broadcast one side — two shuffle stages fewer per
        # micro-batch; pairs never surface raw from the gate (verify
        # verdicts are per-pair idempotent, the greedy walks SETS), so
        # the cross-band dedup exchange goes too (r16, VERDICT #3)
        broadcast_self=True,
        distinct_pairs=False,
    )

    # 2. candidate pairs: within-batch (qid < cid, both batch-side) plus
    #    cross-store (qid batch-side, cid an accepted store doc) — the
    #    batch's band keys BROADCAST against the store scan, so the store
    #    is never shuffled at any size. The CAPPED frame feeds the cross
    #    join too (and the append below): capping symmetrically on every
    #    path is what keeps a retried batch's survivor set identical —
    #    an uncapped store side would resurrect exactly the pairs the
    #    within-batch cap suppressed. qid != cid excludes the self-pairs
    #    a retried batch's own store rows would produce. The union is
    #    persisted and COUNTED (it feeds both text joins; the verify
    #    broadcast is gated on the measured count, mirroring
    #    dedup.BROADCAST_PAIR_LIMIT).
    cands = within_cand.withColumn("from_store", F.lit(False))
    store_docs = None
    # doc_path is checked too (stored-texts mode): a first-batch retry
    # after the bands append landed but the docs append did not must not
    # die reading a missing docs dir (it skips the cross-store step —
    # the store holds only this batch's own rows, which the self-pair
    # exclusion discards anyway). Pointer mode needs only the bands.
    has_store = os.path.exists(band_path) and (
        external_texts or os.path.exists(doc_path)
    )
    if has_store:
        store_bands = spark.read.parquet(band_path)
        store_docs = (
            corpus.select(
                F.col(id_col).alias("id"), F.col(text_col).alias("text")
            )
            if external_texts
            else spark.read.parquet(doc_path)
        )
        cross_cand = (
            F.broadcast(capped.select(F.col("id").alias("qid"), "band_key"))
            .join(store_bands, "band_key")
            .filter(F.col("qid") != F.col("old_id"))
            .select("qid", F.col("old_id").alias("cid"))
            # no cross-band distinct (r16): duplicate pairs re-verify
            # idempotently and the store-match set dedupes; the saved
            # exchange is one stage-job per micro-batch. Duplicates
            # only inflate the broadcast-gate count conservatively.
            .withColumn("from_store", F.lit(True))
        )
        cands = cands.unionByName(cross_cand)
        # the candidate count gates the verify broadcasts when a store
        # participates (the store side must never shuffle, so cands is
        # measured before it is broadcast). The no-store first batch
        # skips this whole job: its verify joins broadcast the DOCS
        # side, which is trigger-bounded by construction.
        cands = cands.persist()
        n_cand = cands.count()
        bcast = F.broadcast if n_cand <= BROADCAST_PAIR_LIMIT else (
            lambda d: d
        )

    # 3. ONE exact-Jaccard verify job over the union: qid texts come
    #    from the batch; cid texts from the batch or the store according
    #    to the tag. The store side is pre-filtered by a semi-join on
    #    the candidate ids BEFORE its texts join anything — the store's
    #    documents are never moved in bulk (the r4 contract: texts stay
    #    off the broadcast path AND off any store-sized shuffle; only
    #    candidate-involved store rows travel).
    jac = jaccard_shingle_udf(shingle_n)
    if has_store:
        with_q = bcast(cands).join(
            docs.select(
                F.col("id").alias("qid"), F.col("text").alias("__tq")
            ),
            "qid",
        )
        c_sources = docs.select("id", "text").withColumn(
            "from_store", F.lit(False)
        )
        store_needed = store_docs.join(
            bcast(
                cands.filter("from_store")
                .select(F.col("cid").alias("id"))
                .distinct()
            ),
            "id",
            "left_semi",
        )
        c_sources = c_sources.unionByName(
            store_needed.select("id", "text").withColumn(
                "from_store", F.lit(True)
            )
        )
        with_qc = with_q.join(
            c_sources.select(
                F.col("id").alias("cid"),
                "from_store",
                F.col("text").alias("__tc"),
            ),
            ["cid", "from_store"],
        )
    else:
        # no-store fast path (stream's first batch / backfill start):
        # both text attachments broadcast the micro-batch itself, so the
        # candidate pipeline, text joins, and Jaccard verify fuse into
        # the single probe job below — no separate count job.
        with_qc = cands.join(
            F.broadcast(
                docs.select(
                    F.col("id").alias("qid"), F.col("text").alias("__tq")
                )
            ),
            "qid",
        ).join(
            F.broadcast(
                docs.select(
                    F.col("id").alias("cid"), F.col("text").alias("__tc")
                )
            ),
            "cid",
        )
    verified = (
        with_qc.withColumn("__j", jac("__tq", "__tc"))
        .filter(F.col("__j") >= threshold)
        .select("qid", "cid", "from_store")
    )
    # 4. first-wins resolution, HYBRID: the verified pair set (pairs,
    #    never docs; bucket-capped upstream) is limit-probed — within
    #    the driver limit it resolves as a driver-side greedy (instant);
    #    an over-limit (pathologically self-similar) batch switches to
    #    the distributed wavefront with identical semantics. No abort.
    limit = (
        BROADCAST_PAIR_LIMIT if driver_pair_limit is None
        else driver_pair_limit
    )
    verified = verified.persist()
    probe = verified.limit(limit + 1).collect()
    if len(probe) <= limit:
        verified.unpersist()
        vrows = [(r["qid"], r["cid"], r["from_store"]) for r in probe]
        within_rows = [(q, c) for q, c, s in vrows if not s]
        store_matched = {q for q, c, s in vrows if s}
        neighbors: dict = {}
        for a, b in within_rows:
            neighbors.setdefault(b, set()).add(a)
            neighbors.setdefault(a, set()).add(b)
        dropped_within: set = set()
        for did in sorted({i for pair in within_rows for i in pair}):
            # ascending: earlier ids decided first
            if any(
                n < did and n not in dropped_within
                for n in neighbors.get(did, ())
            ):
                dropped_within.add(did)
        dropped = dropped_within | store_matched
        dropped_df = None
        if dropped:
            # left-anti on a broadcast frame, not a literal isin()
            # IN-list: the dropped set is bounded but an IN-list grows
            # the PLAN with it; the anti-join keeps the plan
            # constant-size.
            dropped_df = F.broadcast(
                spark.createDataFrame(
                    [(i,) for i in sorted(dropped)],
                    schema=docs.select("id").schema,
                )
            )
    else:
        from ..operators.clusters import first_wins_dropped

        # distributed path: pairs stay on the cluster. The dropped
        # frame is localCheckpoint-ed (first_wins_dropped does so
        # internally per round; the union here is one more) so nothing
        # downstream references the verified lineage, then the caches
        # release. No broadcast hint on the anti-joins — the dropped
        # set is over-limit by construction, AQE picks the strategy.
        dropped_df = (
            first_wins_dropped(verified.filter(~F.col("from_store")),
                               id_a="qid", id_b="cid")
            .unionByName(
                verified.filter("from_store").select(
                    F.col("qid").alias("id")
                )
            )
            .distinct()
            .localCheckpoint()
        )
        verified.unpersist()

    batch_kept = docs
    band_append = capped
    if dropped_df is not None:
        batch_kept = docs.join(dropped_df, "id", "left_anti")
        band_append = capped.join(dropped_df, "id", "left_anti")
    if has_store:
        cands.unpersist()

    # 5. append the survivors' bands + texts to the store. The appended
    #    bands come from the cached CAPPED frame anti-joined to the
    #    dropped ids — no second band-hash pass over the texts, and the
    #    store only ever holds capped bands (symmetric with step 2, so a
    #    retry reproduces the same candidate set); the docs append
    #    executes ``batch_kept`` (one bounded micro-batch scan — document
    #    bytes never route through the driver; the survivor set is a
    #    deterministic anti-join, so the caller's later action on the
    #    returned frame re-derives the same rows). The two appends touch
    #    DISJOINT directories from independent cached inputs, so they
    #    run as CONCURRENT jobs — per-batch latency pays one append's
    #    scheduling + commit latency, not two (measured ~0.5 s/batch).
    from concurrent.futures import ThreadPoolExecutor

    def _do_bands() -> None:
        _append_bands(
            spark,
            store_dir,
            band_append.select(F.col("id").alias("old_id"), "band_key"),
        )

    def _do_docs() -> None:
        batch_kept.write.mode("append").parquet(doc_path)

    if external_texts:
        _do_bands()  # pointer mode: bands are the whole store
    else:
        with ThreadPoolExecutor(max_workers=2) as pool:
            futs = [pool.submit(_do_bands), pool.submit(_do_docs)]
            for f in futs:
                f.result()
    batch_bands.unpersist()
    return batch_kept


def streaming_minhash_dedup(
    stream_df: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    store_texts: bool = True,
):
    """Wire the gate into a stream: every micro-batch flows through
    ``minhash_gate_batch``; survivors append to ``out_dir``. Returns the
    StreamingQuery (caller awaits termination).

    Idempotent under micro-batch retries (the foreachBatch contract):
    each batch's survivors land in their own ``out_dir/batch_id=N``
    partition, committed by the manifest marker
    (``publish.publish_batch`` — object-store safe, no renames), so a
    retry REPLACES a half-published batch instead of appending next to
    it — no duplicate output rows in any failure window. The per-batch
    marker then short-circuits fully-processed batches, and the gate
    itself excludes self-pairs so a partially-appended store does not
    change a re-run's survivors. Read the output with
    ``publish.read_published`` (crash-consistent) or plain
    ``spark.read.parquet(out_dir)`` after a clean finish — both surface
    ``batch_id`` as a lineage column.

    ``store_texts=False`` switches the gate store to POINTER mode: the
    accepted corpus already lives in ``out_dir``, so verify texts come
    from the committed batches there (``read_published``) and the store
    keeps only bands — no second copy of the corpus text. Coverage is
    the marker protocol's guarantee: every accepted doc outside the
    current batch belongs to a committed batch (a crashed attempt's
    uncommitted docs can only collide with the retry of the SAME batch,
    whose pairs the within-batch candidates already carry)."""
    from .publish import committed_batches, publish_batch, read_published

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(store_dir, "_batches", f"{batch_id}.done")
        if os.path.exists(marker):
            return  # retried batch already fully processed
        corpus = None
        if not store_texts:
            corpus = (
                read_published(batch_df.sparkSession, out_dir)
                if committed_batches(out_dir)
                # first batch: nothing published yet — an EMPTY corpus
                # keeps the gate in pointer mode (no docs dir is ever
                # created); there is nothing to verify against anyway
                else batch_df.select(id_col, text_col).limit(0)
            )
        kept = minhash_gate_batch(
            batch_df, store_dir, threshold, text_col, id_col,
            corpus=corpus,
        )
        # publish the output, THEN write the gate marker: every crash
        # window re-runs into the same final state.
        publish_batch(
            kept.withColumnRenamed("id", id_col).withColumnRenamed(
                "text", text_col
            ),
            out_dir,
            batch_id,
        )
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as f:
            f.write("")

    return (
        stream_df.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
