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


def zorder_column(
    df: DataFrame,
    cols: "list[str]",
    bits_per_col: int = 8,
    approx_accuracy: int = 10_000,
) -> "F.Column":
    """Z-order (Morton) key over ``cols``: each column is RANK-quantized
    into ``2^bits_per_col`` buckets (split points from one
    ``approx_percentile`` aggregate — rank quantization is what makes
    the interleave skew-proof; value-scaling would collapse a skewed
    column into two buckets) and the bucket bits are interleaved, so
    rows close in the Z key are close in EVERY column.

    The split points are plan literals (one bounded aggregate job, at
    most ``2^bits - 1`` doubles per column); bucket assignment is a
    codegen ``F.aggregate`` count-of-splits-below, and the interleave
    is pure bit arithmetic — no UDF anywhere."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    # the interleave's highest shift is (bits_per_col-1)*len(cols) +
    # len(cols)-1 = bits_per_col*len(cols) - 1; at bit 63 it reaches
    # the long SIGN bit (negative keys break Morton order silently) and
    # past 64 shiftleft wraps mod 64 (truncated keys, same silent
    # breakage) — refuse instead
    if bits_per_col * len(cols) > 63:
        raise ValueError(
            f"bits_per_col={bits_per_col} x {len(cols)} columns needs "
            f"{bits_per_col * len(cols)} interleaved bits, but only 63 "
            "fit a signed long — lower bits_per_col to "
            f"{63 // len(cols)} or fewer for {len(cols)} columns"
        )
    n_buckets = 1 << bits_per_col
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        *[
            F.percentile_approx(
                F.col(c).cast("double"),
                F.array(*[F.lit(q) for q in qs]),
                F.lit(approx_accuracy),
            ).alias(c)
            for c in cols
        ]
    ).collect()[0]
    buckets = []
    for c in cols:
        splits = [s for s in (row[c] or []) if s is not None]
        arr = F.array(*[F.lit(float(s)) for s in splits])
        buckets.append(
            F.aggregate(
                arr,
                F.lit(0),
                lambda acc, s: acc
                + F.when(
                    F.col(c).cast("double") > s, F.lit(1)
                ).otherwise(F.lit(0)),
            ).cast("long")
        )
    return _interleave(buckets, bits_per_col)


def _interleave(buckets: "list[F.Column]", bits_per_col: int) -> "F.Column":
    """Morton interleave of per-column bucket codes: bit ``b`` of
    column ``ci`` lands at position ``b * n_cols + ci`` — pure long
    bit arithmetic, shared by the rank-quantized and integer-exact
    Z-key arms."""
    n = len(buckets)
    z = F.lit(0).cast("long")
    for ci, bucket in enumerate(buckets):
        for bit in range(bits_per_col):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, bit).bitwiseAND(F.lit(1)),
                    bit * n + ci,
                )
            )
    return z


def zorder_key_int(
    df: DataFrame,
    cols: "list[str]",
    bits_per_col: int = 8,
) -> "F.Column":
    """EXACT integer-domain Z-order key — the engine-portable sibling
    of ``zorder_column``: each column (cast to long) min-max quantizes
    into ``2^bits_per_col`` uniform buckets with PURE INTEGER
    arithmetic — ``bucket = ((c - min) * n_buckets) div
    (max - min + 1)`` — so any engine replays the key bit-for-bit (no
    percentile sketch, no float rounding anywhere). The trade:
    uniform value bucketing, not rank bucketing — right for integer /
    date-day / id domains without extreme value skew;
    ``zorder_column``'s rank quantization stays the skew-proof
    production arm. One bounded (min, max) aggregate per call; NULLs
    sort to bucket 0; the interleave is the shared ``_interleave``."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits_per_col * len(cols) > 63:
        raise ValueError(
            f"bits_per_col={bits_per_col} x {len(cols)} columns needs "
            f"{bits_per_col * len(cols)} interleaved bits, but only 63 "
            "fit a signed long — lower bits_per_col to "
            f"{63 // len(cols)} or fewer for {len(cols)} columns"
        )
    n_buckets = 1 << bits_per_col
    row = df.agg(
        *[
            F.min(F.col(c).cast("long")).alias(f"__mn_{i}")
            for i, c in enumerate(cols)
        ],
        *[
            F.max(F.col(c).cast("long")).alias(f"__mx_{i}")
            for i, c in enumerate(cols)
        ],
    ).collect()[0]
    buckets = []
    for i, c in enumerate(cols):
        mn, mx = row[f"__mn_{i}"], row[f"__mx_{i}"]
        if mn is None:  # all-NULL column: one bucket, no information
            buckets.append(F.lit(0).cast("long"))
            continue
        rng = int(mx) - int(mn) + 1
        if rng * n_buckets >= 1 << 63:
            raise ValueError(
                f"column {c}: range {rng} x {n_buckets} buckets "
                "overflows a signed long — lower bits_per_col or "
                "pre-scale the column"
            )
        # integer `div`, not double `/` (the repo's exactness rule:
        # double division loses bit-for-bit parity past 2^53)
        buckets.append(
            F.expr(
                f"((coalesce(cast(`{c}` as long), {int(mn)}) "
                f"- {int(mn)}) * {n_buckets}) div {rng}"
            )
        )
    return _interleave(buckets, bits_per_col)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: "list[str]",
    n_files: int = 32,
    bits_per_col: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order key of ``cols``
    — the multi-column file-skipping layout (Delta ``OPTIMIZE ZORDER``
    / Iceberg sort-order analog). A single-column sort gives perfect
    min/max pruning on that column and NONE on any other; Z-order
    clustering gives every interleaved column partial pruning
    (~n_files^(1/k) of the files overlap a point filter on any one of
    k columns), which is what ad-hoc multi-dimension scans at 100 TB
    need from plain parquet min/max stats.

    ``repartitionByRange`` on the key assigns contiguous Z ranges to
    files; the within-file sort tightens every file's per-column
    min/max envelope. The key column itself is dropped before writing
    — the layout, not an extra column, carries the clustering."""
    z = zorder_column(df, cols, bits_per_col=bits_per_col)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(df: DataFrame, basename_only: bool = True) -> DataFrame:
    """Per-file layout statistics of a file-backed DataFrame: row count
    and on-disk size from the scan's ``_metadata`` hidden column — the
    observability half of the layout toolkit above. At 100 TB the two
    layout killers are small files (driver-side listing + per-task
    overhead swamps IO) and skewed files (one straggler task per
    oversized file); this reports both without a separate listing job,
    riding the same distributed scan the query would do.

    ``_metadata`` is generated per-row AT SCAN TIME by the file source
    (constant within a file, no IO beyond the scan itself), so the plan
    is scan -> map-side-combined hash aggregate on the file name: one
    shuffle whose cardinality is the file count, not the row count.

    Must be called on a frame read directly from files (parquet / orc /
    csv / json); frames that have passed through joins or aggregations
    no longer carry ``_metadata``.
    """
    name = (
        F.col("_metadata.file_name")
        if basename_only
        else F.col("_metadata.file_path")
    )
    return (
        df.select(
            name.alias("file_name"),
            F.col("_metadata.file_size").alias("__size"),
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.first("__size").cast("long").alias("file_bytes"),
        )
        .orderBy("file_name")
    )


def skew_report(
    df: DataFrame, key_cols: list[str], top_k: int = 20
) -> DataFrame:
    """Pre-join skew diagnosis for a prospective shuffle key: the
    ``top_k`` heaviest key values with their share of all rows and
    their size relative to the mean key (``x_avg``). The planning
    companion to ``salted_agg``/``salted_join`` above — at 100 TB you
    run this BEFORE the join to decide whether a key needs salting or
    AQE skew-split will do (a key at 1000x the mean is one straggler
    task; at roughly uniform x_avg the plain shuffle is fine).

    Scale shape: one map-side-combined count per key (the only
    row-level shuffle), then the totals reduce over the keyspace-sized
    count frame and broadcast back as a 1-row join; the top-k cut is a
    TakeOrdered with a deterministic (count desc, key asc) order, not
    a full sort.
    """
    if not key_cols:
        raise ValueError("skew_report needs at least one key column")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    key = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("__null__"))
            for c in key_cols
        ],
    )
    counts = (
        df.select(key.alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    totals = counts.groupBy().agg(
        F.sum("n_rows").cast("double").alias("__total"),
        F.count(F.lit(1)).cast("double").alias("__nkeys"),
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("n_rows") / (F.col("__total") / F.col("__nkeys")), 4
            ).alias("x_avg"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(top_k)
    )


def rowgroup_stats(spark, paths: "list[str]") -> DataFrame:
    """Per-ROW-GROUP parquet layout report: (file_name, row_group_id,
    n_rows, n_cols, compressed_bytes, uncompressed_bytes,
    n_stats_cols) — the level below ``file_stats`` and the knob that
    actually decides 100 TB scan behavior: row-group size vs
    ``spark.sql.files.maxPartitionBytes`` sets split granularity,
    per-column min/max presence (``n_stats_cols``) decides whether
    predicate pushdown can prune the group at all, and a file whose
    groups are tiny pays footer+seek overhead per group.

    Scale shape: the FILE LIST distributes (one row per file,
    repartitioned), and each task reads only its files' FOOTERS via
    pyarrow (``ParquetFile.metadata`` — no data pages touched), so the
    cost is one metadata RPC per file regardless of data volume. No
    SQL-view oracle exists for footer internals (the ``file_bytes``
    precedent) — the unit test cross-checks every value against
    DuckDB's ``parquet_metadata()`` instead.

    ``paths`` are individual parquet FILES (expand directories with
    the caller's listing; ``df.inputFiles()`` is the usual source)."""
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    files = spark.createDataFrame(
        [(p,) for p in paths], "file_path string"
    ).repartition(max(1, min(len(paths), 64)))

    def read_footers(batches):
        import os

        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = {
                "file_name": [], "row_group_id": [], "n_rows": [],
                "n_cols": [], "compressed_bytes": [],
                "uncompressed_bytes": [], "n_stats_cols": [],
            }
            for path in pdf["file_path"]:
                local = path
                for prefix in ("file://", "file:"):
                    if local.startswith(prefix):
                        local = local[len(prefix):]
                        break
                meta = pq.ParquetFile(local).metadata
                base = os.path.basename(local)
                for g in range(meta.num_row_groups):
                    rg = meta.row_group(g)
                    comp = unc = stats = 0
                    for c in range(rg.num_columns):
                        col = rg.column(c)
                        comp += col.total_compressed_size
                        unc += col.total_uncompressed_size
                        st = col.statistics
                        if st is not None and st.has_min_max:
                            stats += 1
                    out["file_name"].append(base)
                    out["row_group_id"].append(g)
                    out["n_rows"].append(rg.num_rows)
                    out["n_cols"].append(rg.num_columns)
                    out["compressed_bytes"].append(comp)
                    out["uncompressed_bytes"].append(unc)
                    out["n_stats_cols"].append(stats)
            yield pd.DataFrame(out)

    return files.mapInPandas(
        read_footers,
        "file_name string, row_group_id int, n_rows long, n_cols int, "
        "compressed_bytes long, uncompressed_bytes long, "
        "n_stats_cols int",
    ).orderBy("file_name", "row_group_id")
