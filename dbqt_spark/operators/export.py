"""Training-data export sinks — JSONL (and compressed JSONL) delivery.

Beyond the reference surface (north star): curated corpora are handed to
training frameworks as JSON-Lines shards (the lingua franca of LLM data
loaders — HF datasets, Megatron/NeMo preprocessors, WebDataset-adjacent
tooling all ingest `{"text": ...}\\n` records), not parquet. The write
stays fully distributed: one shard file per partition, compression
applied per shard by the JSON writer, no driver funnel.

Spark-first notes: `df.write.json` is the whole engine here — Jackson
serialization JVM-side, column pruning upstream, shard count =
partition count. The only logic this module adds is delivery-shape
control (shard sizing via a repartition contract, deterministic
ordering within shards for reproducible hand-offs) and guardrails
(refusing binary columns JSON cannot round-trip)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Spark's TEXT-format codec registry (JSON writes) — parquet-only
# codecs (zstd) are NOT here; attempting one fails inside the JVM.
_CODECS = {"gzip", "bzip2", "deflate", "lz4", "snappy"}


def export_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    n_shards: int | None = None,
    shard_by: str | None = None,
    mode: str = "error",
) -> None:
    """Write ``df`` as JSON-Lines shards under ``path``.

    - ``compression``: one of gzip/bzip2/deflate/lz4/snappy —
      applied per shard by the JSON writer (gzip shards stay
      independently decompressible, the property loaders rely on).
    - ``n_shards``: target shard count. With ``shard_by`` the rows are
      hash-partitioned on that column (all of one doc's rows in one
      shard, stable under reruns); without it a plain repartition.
      Sizing rule at scale: aim for 100-500 MB per compressed shard —
      thousands of tiny shards slow every downstream open, one giant
      shard serializes the loader.
    - Binary columns are refused loudly: JSON cannot round-trip bytes;
      base64 them explicitly upstream if intended (`F.base64`).

    Within-shard order: when ``shard_by`` is set rows are sorted by it
    within each shard (`sortWithinPartitions` — a local sort, no extra
    exchange) so re-exports of the same frame are byte-comparable."""
    def _find_binary(dt: "T.DataType", where: str) -> "str | None":
        # recursive walk — a BinaryType NESTED in a struct/array/map is
        # just as silently base64'd by the JSON writer as a top-level
        # one (ADVICE r10), so the guard must see through containers
        if isinstance(dt, T.BinaryType):
            return where
        if isinstance(dt, T.StructType):
            for sub in dt.fields:
                hit = _find_binary(sub.dataType, f"{where}.{sub.name}")
                if hit:
                    return hit
        elif isinstance(dt, T.ArrayType):
            return _find_binary(dt.elementType, f"{where}[]")
        elif isinstance(dt, T.MapType):
            return _find_binary(
                dt.keyType, f"{where}<key>"
            ) or _find_binary(dt.valueType, f"{where}<value>")
        return None

    for f in df.schema.fields:
        hit = _find_binary(f.dataType, f.name)
        if hit:
            raise ValueError(
                f"column {hit!r} is binary — JSON cannot round-trip "
                "raw bytes; encode explicitly (e.g. F.base64) before "
                "export"
            )
    if compression is not None and compression not in _CODECS:
        raise ValueError(
            f"unknown compression {compression!r}; one of {sorted(_CODECS)}"
        )
    out = df
    if n_shards is not None:
        if n_shards < 1:
            raise ValueError(f"n_shards must be >= 1, got {n_shards}")
        if shard_by is not None:
            out = out.repartition(n_shards, F.col(shard_by))
        else:
            out = out.repartition(n_shards)
    if shard_by is not None:
        out = out.sortWithinPartitions(shard_by)
    writer = out.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl(spark, path: str, schema: "T.StructType | None" = None):
    """Read JSONL shards back (round-trip / validation path). Passing
    ``schema`` skips the inference scan — at 100 TB the inference pass
    IS a full read; production loads should always pass one."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: "str | list[str]",
) -> None:
    """Idempotent partition-level backfill: rewrite ONLY the partitions
    present in ``df``, leaving every other partition untouched — the
    reprocess-one-day operation a date-partitioned corpus needs
    (a plain ``mode("overwrite")`` would truncate the whole dataset; an
    ``append`` would duplicate the reprocessed day).

    Implementation is Spark's dynamic partition-overwrite: the session
    conf flips to ``dynamic`` for THIS write and is restored after
    (the static default stays in force for everyone else — the global
    flip is the classic foot-gun: any concurrent plain overwrite in the
    same session would silently become partial). Re-running the same
    backfill is a no-op-equivalent rewrite — idempotent by
    construction. NOTE committed per partition directory, not
    transactionally across partitions: a mid-write crash can leave a
    subset of the targeted partitions rewritten (each one internally
    consistent); re-run the backfill to converge. Cross-partition
    atomicity needs a table format (Delta/Iceberg) — out of scope for
    plain parquet."""
    cols = [partition_by] if isinstance(partition_by, str) else list(
        partition_by
    )
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*cols).parquet(path)
    finally:
        spark.conf.set(key, prev)
