"""Streaming DSIR selection gate — select toward the target
distribution AS SEGMENTS LAND.

Batch DSIR (operators/dsir.py, Xie et al. arXiv:2302.03169) scores a
finished corpus. A live crawl wants the same decision per arriving
micro-batch: "is this page target-like enough to keep?" — answered
against a FROZEN ratio table (``dsir_log_ratios``, fit once on a
sample / the previous snapshot) so the gate is state-free by
construction: the B-row table broadcasts into every micro-batch's
scoring join, per-doc weights are exact DECIMAL sums inside the batch,
and nothing accumulates in the streaming state store. This is the
one-pass ``ratios=`` production arm of ``dsir_weights`` lifted onto
``foreachBatch`` (the neardup/semantic gate composition precedent).

Scale shape per micro-batch: one scoring join (broadcast, B rows) +
one map-side-combined per-doc aggregate — identical to the batch
plan; throughput follows segment size, never total corpus size.
Thresholding on the DECIMAL ``log_weight`` keeps the decision
engine-portable (the dsir_weights oracle contract extends with one
WHERE clause).

Delivery is ``foreachBatch`` append — at-least-once on task retry
like the repo's other gates; publish through the marker protocol
(streaming/publish.py) when downstream needs exactly-once reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_dsir_gate(
    spark: SparkSession,
    stream_df: DataFrame,
    ratios: DataFrame,
    min_log_weight: str,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    max_n: int = 2,
) -> None:
    """Drain ``stream_df`` (availableNow) through the DSIR gate: score
    each micro-batch against the frozen ``ratios`` table
    (``dsir_log_ratios`` output — B rows, broadcast), keep rows with
    ``log_weight >= min_log_weight``, and append the surviving INPUT
    rows plus ``(n_grams, log_weight)`` to ``out_path``.

    ``min_log_weight`` is a decimal STRING (e.g. ``"0"``,
    ``"-1.5"``) — it compares against the exact DECIMAL weight, so
    the kept set is bit-stable across engines and re-runs.
    ``n_buckets``/``max_n`` must match the fit (the ratio table knows
    its row count but not the gram order — the caller owns that
    contract, as with ``dsir_weights(ratios=)``)."""
    from ..operators.dsir import dsir_weights

    thr = F.lit(str(min_log_weight)).cast("decimal(38,6)")
    ratio_rows = ratios.select("bucket", "lr6")

    def _score_batch(batch: DataFrame, _batch_id: int) -> None:
        scored = dsir_weights(
            batch,
            None,
            text_col=text_col,
            id_col=id_col,
            n_buckets=n_buckets,
            max_n=max_n,
            ratios=ratio_rows,
        )
        kept = batch.join(
            scored.filter(F.col("log_weight") >= thr),
            id_col,
            "inner",
        )
        kept.write.mode("append").parquet(out_path)

    q = (
        stream_df.writeStream.foreachBatch(_score_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
