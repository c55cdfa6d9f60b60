"""Streaming WARC ingest — crawl segments land, curated text comes out.

No reference analog (dbqt has no streaming surface — SURVEY.md §1.4).
This is the delivery shape of every large crawl: fetchers drop finished
``*.warc.gz`` segments into a directory (Common Crawl publishes ~80k
such files per snapshot), and the pipeline must pick up NEW segments
exactly once, parse them, and gate the pages against everything already
ingested before the heavy curation tiers run.

Composition, not new machinery:

- **Source**: Structured Streaming's file source over the
  ``binaryFile`` format — Spark's own new-file tracking (checkpointed
  file log) gives exactly-once pickup; each segment is parsed ONCE by
  the same row builder the batch reader uses
  (``sources/warc.rows_from_stream``), so batch and streaming literally
  share the parse code path.
- **Projection**: ``sources/warc.corpus_view`` — the identical JVM-side
  2xx/text gate + doc_id/url/host/fetch_ts/text derivation as the
  batch corpus.
- **Gate**: canonical-URL first-occurrence
  (``streaming/dedup.url_first_seen`` semantics) — state carries
  md5(canonical-url) fingerprints only, never page bytes.

Scale notes: the unit of parallelism is the FILE (WARC is not
splittable — see ``sources/warc``), and ``maxFilesPerTrigger`` is the
backpressure knob: micro-batch memory is bounded by
(files/trigger x largest segment), state by the fingerprint count.
At 100 TB use the RocksDB state store provider; the gate state is
~48 B/page, so a 3B-page corpus is ~150 GB of state — RocksDB
territory, not heap.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from ..sources.warc import WARC_ROW_SCHEMA, corpus_view, rows_from_stream

#: binaryFile's fixed schema — the streaming file source cannot infer it.
_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)

_BATCH_ROWS = 1024


def warc_stream(
    spark: SparkSession,
    drop_dir: str,
    record_types: "tuple[str, ...] | None" = ("response",),
    max_files_per_trigger: "int | None" = None,
    with_offsets: bool = False,
) -> DataFrame:
    """Streaming frame of parsed WARC rows (WARC_ROW_SCHEMA) from a
    drop directory: every ``*.warc`` / ``*.warc.gz`` file that appears
    is parsed exactly once (file-source checkpoint log).
    ``with_offsets=True`` appends the per-record byte coordinates
    (``WARC_ROW_OFFSET_SCHEMA``) — the streaming feed for a seekable
    CDX index (``run_cdx_index_stream``)."""
    import pandas as pd

    from ..sources.warc import WARC_ROW_OFFSET_SCHEMA

    types = tuple(record_types) if record_types is not None else None
    schema = WARC_ROW_OFFSET_SCHEMA if with_offsets else WARC_ROW_SCHEMA
    cols = [c.split()[0] for c in schema.split(", ")]

    def parse(batches) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for fname, content in zip(pdf["path"], pdf["content"]):
                batch: list[tuple] = []
                for row in rows_from_stream(
                    io.BytesIO(content), fname, types,
                    with_offsets=with_offsets,
                ):
                    batch.append(row)
                    if len(batch) >= _BATCH_ROWS:
                        yield pd.DataFrame(batch, columns=cols)
                        batch = []
                if batch:
                    yield pd.DataFrame(batch, columns=cols)

    reader = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", "*.warc*")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(drop_dir).select("path", "content")
    return raw.mapInPandas(parse, schema=schema)


def warc_corpus_stream(
    spark: SparkSession,
    drop_dir: str,
    min_status: int = 200,
    max_status: int = 299,
    max_files_per_trigger: "int | None" = None,
) -> DataFrame:
    """Curate-ready streaming document frame: ``warc_stream`` through
    the SAME ``corpus_view`` projection the batch reader uses."""
    return corpus_view(
        warc_stream(
            spark, drop_dir, max_files_per_trigger=max_files_per_trigger
        ),
        min_status=min_status,
        max_status=max_status,
    )


def warc_ingest_gate(
    df: DataFrame,
    strip_www: bool = False,
) -> DataFrame:
    """First-occurrence gate on the CANONICAL URL over a corpus-shaped
    frame (batch or streaming — one logical plan, the house pattern):
    re-crawled or re-announced spellings of an already-ingested page
    never reach the curation tiers. Emits the surviving document rows
    (not just the URL — downstream needs the text), deduped on
    md5(canonical url) so shuffle keys and state rows stay 32 bytes.

    A page re-fetched at a DIFFERENT time is still a duplicate (the
    gate keys on the canonical URL alone); content-level re-ingest
    policies (accept changed pages) belong to the fingerprint tiers
    (``streaming/dedup.first_seen`` on text) downstream.

    Survivor determinism: STREAMING keeps the first ARRIVAL (state
    order); on a batch frame ``dropDuplicates`` keeps an arbitrary
    row per canonical URL — fine for the gate's keep-one contract,
    but pick explicitly first (``clusters.first_wins_dropped`` /
    ``best_quality_kept``) when WHICH spelling survives matters."""
    from pyspark.sql import functions as F

    from ..operators.urltools import canonical_url_col

    keyed = df.withColumn(
        "url_canon", canonical_url_col(F.col("url"), strip_www=strip_www)
    ).withColumn("__fp", F.md5("url_canon"))
    return keyed.dropDuplicates(["__fp"]).drop("__fp")


def run_warc_ingest(
    spark: SparkSession,
    drop_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    strip_www: bool = False,
    max_files_per_trigger: "int | None" = None,
    timeout_sec: int = 300,
) -> None:
    """Drain every unseen segment currently in ``drop_dir`` into a
    parquet corpus at ``out_dir`` (availableNow trigger — the
    scheduled-ingest execution mode; re-running with the same
    checkpoint picks up only NEW segments and the URL gate state
    persists across runs)."""
    stream = warc_corpus_stream(
        spark, drop_dir, max_files_per_trigger=max_files_per_trigger
    )
    q = (
        warc_ingest_gate(stream, strip_www=strip_www)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()


def run_cdx_index_stream(
    spark: SparkSession,
    drop_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    record_types: "tuple[str, ...] | None" = ("response",),
    max_files_per_trigger: "int | None" = None,
    timeout_sec: int = 300,
) -> None:
    """Index segments AS THEY LAND: drain every unseen archive in
    ``drop_dir`` into seekable CDXJ lines (byte offsets included)
    under ``index_dir`` — the streaming twin of ``cdx_index`` over
    ``read_warc(with_offsets=True)``, exactly-once via the file-source
    checkpoint. Lines are per-batch UNSORTED (a stream cannot sort;
    ``cdx_index(sort=False)``): read them back with ``parse_cdxj`` and
    ``cdx_store`` for the range-sorted lookup layout — the standard
    per-segment-then-merge CDX workflow. Filenames are segment
    basenames, so ``cdx_fetch(archive_dir=drop_dir)`` seeks directly."""
    from pyspark.sql import functions as F

    from ..sources.cdx import cdx_index

    parsed = warc_stream(
        spark,
        drop_dir,
        record_types=record_types,
        max_files_per_trigger=max_files_per_trigger,
        with_offsets=True,
    ).withColumn(
        "warc_file", F.element_at(F.split("warc_file", "/"), -1)
    )
    lines = cdx_index(parsed, sort=False).select(
        F.concat_ws(" ", "surt_key", "ts14", "cdxj").alias("value")
    )
    q = (
        lines.writeStream.format("text")
        .option("path", index_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()
