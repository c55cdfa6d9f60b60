"""Streaming ingest deduplication — skip already-seen records.

No reference analog (dbqt has no streaming surface — SURVEY.md §1.4).
This is the training-data ingest shape: a document/event stream where
only first occurrences of a content key should pass downstream, exactly
the front gate of an LLM-corpus pipeline (exact dedup before the heavier
MinHash/SimHash near-dup stages in ``operators/dedup.py``).

Two modes, one transform:

- **Exact (global) dedup** — ``dropDuplicates(keys)``: state holds every
  key ever seen. Correct for bounded backfills (availableNow) and for
  batch frames; unbounded state on an endless stream.
- **Watermark-bounded dedup** — ``dropDuplicatesWithinWatermark(keys)``:
  state evicts keys older than the event-time watermark, so memory is
  bounded by (arrival rate x watermark horizon) regardless of total
  volume — the 100 TB/day mode. Duplicates arriving within the horizon
  are still dropped; a duplicate arriving later than the horizon is a
  documented miss (the same contract Kafka-to-Delta ingest pipelines
  use).

The transform is shared by batch and streaming callers (the standard
one-logical-plan / two-execution-modes pattern used across
``streaming/``), which is what makes the streaming path oracle-checkable
through its batch twin (``SELECT DISTINCT`` in any SQL engine).

Scale notes: dedup state shuffles on the key columns; at scale use the
RocksDB state store and a composite key that is already a fingerprint
(hash the payload before the shuffle so state rows stay small — see
``first_seen`` which keys on a 128-bit md5 rather than raw text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_keys(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """First-occurrence filter on ``key_cols``; returns the distinct key
    tuples (the columns every arrival agrees on — projecting away the
    non-key columns is what makes streaming output deterministic and
    batch-twin comparable; ``dropDuplicates`` keeps an *arbitrary* full
    row per key).

    On a streaming frame with ``watermark`` set, state is bounded via
    ``dropDuplicatesWithinWatermark``; without it, global exact dedup.
    On a batch frame this degenerates to ``SELECT DISTINCT``.
    """
    if df.isStreaming and watermark:
        return (
            df.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols)
            .select(*key_cols)
        )
    return df.dropDuplicates(key_cols).select(*key_cols)


def first_seen(
    df: DataFrame,
    content_col: str,
    id_col: str,
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Content-fingerprint variant: dedup on md5(content) so the state
    row is a fixed 32-byte key instead of an arbitrarily long document —
    the shuffle and the state store both carry the fingerprint only.
    Emits (fingerprint, id, ts) of each first occurrence."""
    keyed = df.withColumn("fingerprint", F.md5(F.col(content_col)))
    if keyed.isStreaming and watermark:
        keyed = keyed.withWatermark(ts_col, watermark)
        return keyed.dropDuplicatesWithinWatermark(["fingerprint"]).select(
            "fingerprint", id_col, ts_col
        )
    return keyed.dropDuplicates(["fingerprint"]).select(
        "fingerprint", id_col, ts_col
    )


def url_first_seen(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    watermark: str | None = None,
    strip_www: bool = False,
    prior_bloom: "DataFrame | None" = None,
    prior_bits: int = 0,
    prior_hashes: int = 0,
    blocked_domains: "list | None" = None,
) -> DataFrame:
    """Streaming URL-dedup gate — the frontier front door a live crawl
    runs BEFORE fetching/processing content: arrivals dedup on their
    CANONICAL URL (``urltools.canonical_url_col`` — tracking params,
    case, default ports, fragments all collapse), so re-announced
    spellings of an already-seen page never reach the content tiers.
    State rows carry md5(canonical) — the ``first_seen`` fixed-32-byte
    state discipline, not arbitrarily long URLs. Emits the canonical
    URL of each first occurrence; with ``watermark`` state is
    time-bounded (``dropDuplicatesWithinWatermark``), without it
    global. On a batch frame this degenerates to DISTINCT canonical
    URLs (the oracle twin).

    ``prior_bloom`` (with its ``prior_bits``/``prior_hashes`` sizing)
    is the CROSS-SNAPSHOT sidecar: a Bloom word frame
    (``operators/bloom.bloom_build``) over a previous crawl's
    canonical URLs. Each emitted first-seen URL gains a
    ``maybe_prior`` flag — false means DEFINITELY never fetched before
    (schedule it directly), true sends the row to the exact index
    check. The static word frame rides ``prior_hashes`` broadcast
    joins against the stream — per-row stream state stays the 32-byte
    fingerprint; the prior corpus never enters the state store.

    ``blocked_domains`` applies the domain-suffix blocklist
    (``urltools.domain_blocklist``, literal arm — a pure narrow map,
    streaming-safe) BEFORE keying: arrivals under a blocked domain
    never cost a state row, which is the point at crawl scale — the
    state store budgets for the frontier you will fetch, not for the
    spam you won't."""
    from ..operators.urltools import canonical_url_col

    if blocked_domains:
        from ..operators.urltools import domain_blocklist

        df = domain_blocklist(
            df, blocked_domains, url_col=url_col, drop=True
        )

    def with_prior(emitted: DataFrame) -> DataFrame:
        if prior_bloom is None:
            return emitted
        from ..operators.bloom import bloom_gate

        return bloom_gate(
            emitted, prior_bloom, "url_canon", prior_bits, prior_hashes,
            flag_col="maybe_prior",
        )

    keyed = df.withColumn(
        "url_canon",
        canonical_url_col(F.col(url_col), strip_www=strip_www),
    ).withColumn("__fp", F.md5("url_canon"))
    if keyed.isStreaming and watermark:
        from pyspark.sql.types import TimestampNTZType, TimestampType

        if not isinstance(
            df.schema[ts_col].dataType, (TimestampType, TimestampNTZType)
        ):
            # fail on the DRIVER with the fix named: withWatermark on
            # a long/micros column raises an opaque AnalysisException
            # mid-stream — raw event feeds normalize first
            # (streaming.checks.normalize_event_ts)
            raise ValueError(
                f"watermark needs a timestamp {ts_col!r} column; got "
                f"{df.schema[ts_col].dataType.simpleString()} — pass "
                "the frame through streaming.checks.normalize_event_ts"
            )
        keyed = keyed.withWatermark(ts_col, watermark)
        return with_prior(
            keyed.dropDuplicatesWithinWatermark(["__fp"]).select(
                "url_canon"
            )
        )
    return with_prior(keyed.dropDuplicates(["__fp"]).select("url_canon"))
