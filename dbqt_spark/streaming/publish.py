"""Object-store-safe micro-batch publication for foreachBatch sinks.

The streaming sinks (``neardup``, ``curate``, ``decontaminate``) land
each micro-batch's rows in ``out_dir/batch_id=N``. The original
protocol staged under a hidden ``.inflight-N`` dir and published with
one ``os.rename`` — atomic on POSIX, but object stores (where a 100 TB
deployment's output lives) have no atomic directory rename, and plain
``os.rename`` cannot even address a remote path. This module replaces
the rename with a MANIFEST COMMIT:

1. write the batch's files directly into ``out_dir/batch_id=N``
   (mode("overwrite") — a retry truncates and rewrites the same dir);
2. commit by writing the small marker ``out_dir/_committed/N`` LAST
   (a single small PUT — atomic on every store).

A crash between (1) and (2) leaves data files without a marker: not
corruption, just an uncommitted batch the retry overwrites. Readers
that must be crash-consistent resolve through the manifest with
``read_published`` (only committed batch dirs are loaded; ``batch_id``
still surfaces via partition-style dir names). Plain
``spark.read.parquet(out_dir)`` remains correct whenever the stream
finished cleanly — the manifest is the contract for reading WHILE a
stream runs or after a crash.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_COMMITTED = "_committed"


def _marker(out_dir: str, batch_id: int) -> str:
    return os.path.join(out_dir, _COMMITTED, str(batch_id))


def publish_batch(df: DataFrame, out_dir: str, batch_id: int) -> None:
    """Write one micro-batch to ``out_dir/batch_id=N`` and commit it in
    the manifest. Idempotent under foreachBatch retries: the data write
    overwrites the whole dir, then the marker write (the commit point)
    is last — every crash window re-runs into the same final state."""
    final = os.path.join(out_dir, f"batch_id={batch_id}")
    df.write.mode("overwrite").parquet(final)
    os.makedirs(os.path.join(out_dir, _COMMITTED), exist_ok=True)
    with open(_marker(out_dir, batch_id), "w") as f:
        f.write("")


def committed_batches(out_dir: str) -> list[int]:
    """Batch ids with a commit marker, ascending."""
    d = os.path.join(out_dir, _COMMITTED)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        try:
            out.append(int(name))
        except ValueError:
            continue
    return sorted(out)


def read_published(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read ONLY manifest-committed batches (crash-consistent view).
    ``batch_id`` surfaces as a column exactly as with whole-dir
    partition discovery."""
    ids = committed_batches(out_dir)
    if not ids:
        raise ValueError(
            f"no committed batches under {out_dir} — nothing published, "
            "or the sink never ran"
        )
    return spark.read.option("basePath", out_dir).parquet(
        *[os.path.join(out_dir, f"batch_id={i}") for i in ids]
    )
