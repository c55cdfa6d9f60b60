"""Partitioning, bucketing, and skew utilities — the shuffle-management
toolkit for 100 TB operation.

- ``write_bucketed`` / co-located joins: persist both sides of a
  recurring join bucketed on the join key; Spark then plans the join
  with NO Exchange on either side (verified in tests/test_plans.py
  style assertions).
- ``salted_agg``: two-stage aggregation for skewed keys — partial
  aggregate on (key, salt), then merge on key. Bounds the size of any
  single reducer at ``salt_buckets`` times fewer rows.
- ``salted_join``: replicate the small side per salt bucket so one hot
  key spreads over many tasks (AQE's skew-join handles most cases;
  this is the explicit fallback for extreme generator-style skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGEABLE = {"sum", "min", "max", "count"}


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table: joins/aggregations on the
    bucket columns between co-bucketed tables need no shuffle."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def _content_salt(df: DataFrame, salt_buckets: int) -> "F.Column":
    """Deterministic per-row salt: hash of every column, mod buckets.
    Retry-safe as a shuffle key (same row always re-hashes to the same
    salt), unlike monotonically_increasing_id-derived salts."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: ``aggs`` maps output name ->
    (column, fn) with fn in {sum, min, max, count}.

    Equivalent to ``df.groupBy(keys).agg(...)`` but no single reducer
    ever sees all rows of a hot key: stage 1 groups on (keys, salt)
    where salt spreads each key's rows over ``salt_buckets`` partitions
    (map-side combine still applies), stage 2 merges the partials.
    """
    for fn in (fn for _, fn in aggs.values()):
        if fn not in _MERGEABLE:
            raise ValueError(f"non-mergeable aggregate: {fn}")

    # Deterministic salt from ROW CONTENT, never monotonically_increasing_id:
    # a non-deterministic salt used as a shuffle key re-salts rows when a map
    # task is recomputed after a fetch failure (SPARK-23207-class), silently
    # double-counting/dropping rows in the partial aggregation. Content
    # hashing makes recomputation idempotent; duplicate rows hashing to the
    # same salt is fine (the partial agg merges them correctly).
    salt = _content_salt(df, salt_buckets)
    stage1_aggs = []
    for name, (col, fn) in aggs.items():
        partial = (
            F.count(F.col(col)) if fn == "count" else getattr(F, fn)(F.col(col))
        )
        stage1_aggs.append(partial.alias(f"__p_{name}"))
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*stage1_aggs)
    )
    stage2_aggs = []
    for name, (_, fn) in aggs.items():
        merge = "sum" if fn in ("sum", "count") else fn
        stage2_aggs.append(getattr(F, merge)(F.col(f"__p_{name}")).alias(name))
    return stage1.groupBy(*keys).agg(*stage2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across all salt values, join on (key, salt). Use when one key holds
    a disproportionate share of the big side and broadcast isn't
    possible.

    Limitation of the content-hash salt: FULLY identical duplicate rows
    all hash to one salt value, so a hot key made of exact-duplicate rows
    is not spread (correctness is unaffected — one task just stays hot).
    For that shape, pre-aggregate the exact duplicates to (row, count)
    before the join and expand after, or run ``dedup_exact`` upstream;
    for distinct-row skew (the common case) the salt spreads fine, and
    AQE's skew-join split is the runtime backstop."""
    big_s = big.withColumn("__salt", _content_salt(big, salt_buckets))
    small_s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt_buckets).select(
                F.col("id").cast("long").alias("__salt")
            )
        )
    )
    joined = big_s.join(small_s, on=[on, "__salt"], how=how)
    return joined.drop("__salt")
