"""Multimodal (image/audio/video) column plumbing.

North-star operator (no reference analog). Media are opaque ``binary``
columns plus a typed metadata struct; decode / feature-extraction run as
Arrow-batched ``mapInPandas`` stages. The actual codec step is STUBBED
(image/audio libraries are not in this container): ``decode_stub=True``
produces a deterministic fake derived from the bytes, while
``decode_stub=False`` raises NotImplementedError where a real pillow/ffmpeg
call would go. Everything Spark-side — schema, batch iteration, partition
sizing — is real and tested.

Scale notes: binary payloads should be size-bounded per row (<~100 MB,
parquet/Arrow cell limits); big media belongs in object storage with a
path column, which ``attach_media_meta`` also supports. ``mapInPandas``
processes Arrow batches, so per-row Python overhead is amortized; tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` for large payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image/audio/video
        T.StructField("format", T.StringType(), True),  # png/wav/mp4/...
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("uri", T.StringType(), True),  # when payload is external
    ]
)


def attach_media_meta(
    df: DataFrame,
    content_col: str = "content",
    media_type: str = "image",
    fmt: str = "bin",
) -> DataFrame:
    """Derive the metadata struct from an inline binary column."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(F.col(content_col)).cast("long").alias("size_bytes"),
            F.lit(None).cast("string").alias("uri"),
        ),
    )


_FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: byte histogram
    folded to _FEATURE_DIM buckets, L1-normalized."""
    buckets = [0] * _FEATURE_DIM
    for b in payload:
        buckets[b % _FEATURE_DIM] += 1
    total = sum(buckets) or 1
    return [round(x / total, 6) for x in buckets]


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    decode_stub: bool = True,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real pipeline shape: mapInPandas consumes column-pruned batches of
    (id, content) and emits fixed-dim feature vectors. Swap
    ``_fake_decode_features`` for a real decoder (PIL/torchvision/ffmpeg)
    when available.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires image/audio libs not present "
                    "in this container; use decode_stub=True"
                )
            payloads = pdf[content_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "size_bytes": payloads.map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "features": payloads.map(
                        lambda p: _fake_decode_features(p)
                        if p is not None
                        else None
                    ),
                }
            )

    return df.select(id_col, content_col).mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Frame-sampling plumbing: emit one row per sampled "frame" offset —
    a mapInPandas fan-out (1 input row -> N output rows), the shape a real
    video frame sampler uses."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("offset", T.LongType(), False),
            T.StructField("frame_hash", T.LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "offset": [], "frame_hash": []}
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                if payload is None:
                    continue
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    chunk = payload[off : off + every_n_bytes]
                    out["media_id"].append(int(mid))
                    out["frame_no"].append(i)
                    out["offset"].append(off)
                    out["frame_hash"].append(hash(chunk) & 0x7FFFFFFFFFFFFFFF)
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(run, schema)
