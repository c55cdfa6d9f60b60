"""Incremental profile store — MERGEABLE per-batch statistics.

Beyond the reference surface (north star). The profilers
(``operators/profile.py``) rescan the table per run; at 100 TB with
daily appends that is a full-corpus pass for statistics that are
algebraically mergeable. This store persists ONE segment of per-column
partial aggregates per ingest batch:

    (table_name, col_name, segment rows: n_rows, null_count,
     min_value, max_value, distinct_sketch)

where every statistic merges exactly (sum/sum/min/max) or within
sketch error (Apache DataSketches HLL via Spark's ``hll_sketch_agg`` /
``hll_union_agg`` — unions are error-bounded under ANY grouping of
batches, though not bit-identical to a directly-built sketch).
Profiling the grown corpus then reads only the tiny segment rows —
cost proportional to segments x columns, independent of corpus size.

Scale shape: each write is one wide aggregate over the batch (chunked
at ``profile.MAX_AGG_EXPRS_PER_SCAN`` like the other wide profilers),
unpivoted to one row per column; the merged profile is a groupBy over
segment rows — kilobytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .profile import _chunk, _union_all


def stats_store_append(
    df: DataFrame,
    path: str,
    table_name: str,
    columns: list[str] | None = None,
    segment_id: str | None = None,
) -> None:
    """Append one segment of per-column partial statistics for ``df``
    (an ingest batch). Numeric columns carry min/max as double;
    non-numeric columns carry NULL min/max (their counts and distinct
    sketch still merge). ``segment_id`` (e.g. the ingest date or batch
    id) labels the segment so ``stats_store_trend`` can chart metrics
    over time; segments written without one still merge into the
    profile but are invisible to the trend report."""
    from pyspark.sql.types import NumericType

    fields = [
        f
        for f in df.schema.fields
        if columns is None or f.name in columns
    ]
    if not fields:
        raise ValueError("no columns to profile")
    numeric = {
        f.name for f in fields if isinstance(f.dataType, NumericType)
    }
    parts = []
    for chunk in _chunk(fields, 5):
        aggs = [F.count(F.lit(1)).alias("__n")]
        for f in chunk:
            c, col = f.name, F.col(f.name)
            aggs.append(
                F.count(F.when(col.isNull(), 1)).alias(f"__null_{c}")
            )
            if c in numeric:
                aggs.append(F.min(col).cast("double").alias(f"__min_{c}"))
                aggs.append(F.max(col).cast("double").alias(f"__max_{c}"))
            else:
                aggs.append(F.lit(None).cast("double").alias(f"__min_{c}"))
                aggs.append(F.lit(None).cast("double").alias(f"__max_{c}"))
            # hll_sketch_agg skips NULLs; all-NULL columns yield a NULL
            # sketch, which hll_union_agg ignores on merge. Values are
            # sketched through their (injective) string rendering —
            # hll_sketch_agg only accepts int/bigint/string/binary, and
            # the uniform cast keeps every batch's sketch merge-
            # compatible regardless of the column's native type.
            aggs.append(
                F.expr(f"hll_sketch_agg(CAST(`{c}` AS STRING))").alias(
                    f"__hll_{c}"
                )
            )
        wide = df.agg(*aggs)
        structs = [
            F.struct(
                F.lit(f.name).alias("col_name"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__null_{f.name}").cast("long").alias("null_count"),
                F.col(f"__min_{f.name}").alias("min_value"),
                F.col(f"__max_{f.name}").alias("max_value"),
                F.col(f"__hll_{f.name}").alias("distinct_sketch"),
            )
            for f in chunk
        ]
        parts.append(
            wide.select(
                F.lit(table_name).alias("table_name"),
                F.lit(segment_id).cast("string").alias("segment_id"),
                F.inline(F.array(*structs)),
            )
        )
    _union_all(parts).write.mode("append").parquet(path)


def stats_store_profile(spark: SparkSession, path: str) -> DataFrame:
    """Merged profile over every appended segment: (table_name,
    col_name, n_rows, null_count, min_value, max_value,
    approx_distinct). Exact statistics merge exactly; approx_distinct
    is the unioned-HLL estimate (DataSketches HLL_4, ~2% typical
    relative error, exact-ish at small cardinalities). Cost: a scan of
    the segment rows only — never the profiled data."""
    segs = _read_segments(spark, path)
    return (
        segs.groupBy("table_name", "col_name")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("null_count").cast("long").alias("null_count"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.expr(
                "CASE WHEN count(distinct_sketch) > 0 THEN "
                "CAST(hll_sketch_estimate(hll_union_agg(distinct_sketch))"
                " AS BIGINT) ELSE CAST(0 AS BIGINT) END"
            ).alias("approx_distinct"),
        )
        .orderBy("table_name", "col_name")
    )


def _read_segments(spark: SparkSession, path: str) -> DataFrame:
    """Segment rows with schema merging (stores written before
    ``segment_id`` existed read as NULL-labeled segments)."""
    segs = spark.read.option("mergeSchema", "true").parquet(path)
    if "segment_id" not in segs.columns:
        segs = segs.withColumn("segment_id", F.lit(None).cast("string"))
    return segs


def stats_store_trend(
    spark: SparkSession,
    path: str,
    table_name: str,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-segment metric control chart — data quality OVER TIME from
    the store alone (no corpus rescans): every labeled segment's row
    count and NULL count z-score against a LEAVE-ONE-OUT baseline of
    the column's other segments. LOO matters: a baseline that includes
    the point under test bounds |z| by (n-1)/sqrt(n) (~2 at six
    segments), so a 3-sigma threshold could never fire — the exact trap
    this function's first draft shipped and its test caught. A feed
    that suddenly shrinks, floods, or starts nulling a field flags here
    the moment its batch's segment lands.

    Determinism: both metrics are INTEGERS, so the baseline moments are
    exact DECIMAL sums (order-independent) and x^2 stays exact in
    double at any realistic segment size; the z chain is then the same
    IEEE expression in any engine (the DuckDB oracle reproduces it).
    Flat-baseline rule: when the other segments are constant
    (std == 0), any deviation is flagged directly (z itself is NULL —
    sigma-distance from a zero-variance baseline is undefined, but the
    deviation is the clearest possible anomaly).

    Scale shape: the input is segment rows (segments x columns —
    kilobytes); one groupBy + one broadcast join back. Returns
    (segment_id, col_name, n_rows, null_count, null_rate, z_rows,
    z_nulls, is_anomaly) ordered by (col_name, segment_id)."""
    segs = (
        _read_segments(spark, path)
        .filter(F.col("table_name") == table_name)
        .filter(F.col("segment_id").isNotNull())
        .select(
            "segment_id",
            "col_name",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("null_count").cast("long").alias("null_count"),
        )
    )

    def _moments(c: str, out: str):
        x = F.col(c).cast("decimal(38,0)")
        return [
            F.count(F.lit(1)).cast("double").alias(f"__n_{out}"),
            F.sum(x).cast("double").alias(f"__s_{out}"),
            F.sum(x * x).cast("double").alias(f"__q_{out}"),
        ]

    stats = segs.groupBy("col_name").agg(
        *_moments("n_rows", "r"), *_moments("null_count", "m")
    )
    joined = segs.join(F.broadcast(stats), "col_name")

    def _parts(value, n, s, q):
        x = value.cast("double")
        n1 = n - F.lit(1.0)
        s1 = s - x
        q1 = q - x * x
        mean1 = s1 / n1
        var1 = F.greatest(
            (q1 - s1 * s1 / n1) / (n1 - F.lit(1.0)), F.lit(0.0)
        )
        std1 = F.sqrt(var1)
        z = F.when((n1 >= 2) & (std1 > 0), (x - mean1) / std1)
        flat_dev = (n1 >= 2) & (std1 == 0) & (x != mean1)
        return z, flat_dev

    z_r, flat_r = _parts(
        F.col("n_rows"), F.col("__n_r"), F.col("__s_r"), F.col("__q_r")
    )
    z_m, flat_m = _parts(
        F.col("null_count"), F.col("__n_m"), F.col("__s_m"),
        F.col("__q_m"),
    )
    return joined.select(
        "segment_id",
        "col_name",
        "n_rows",
        "null_count",
        F.round(
            F.col("null_count").cast("double")
            / F.col("n_rows").cast("double"),
            8,
        ).alias("null_rate"),
        F.round(z_r, 4).alias("z_rows"),
        F.round(z_m, 4).alias("z_nulls"),
        (
            F.coalesce(F.abs(z_r) > z_threshold, F.lit(False))
            | F.coalesce(F.abs(z_m) > z_threshold, F.lit(False))
            | flat_r
            | flat_m
        ).alias("is_anomaly"),
    ).orderBy("col_name", "segment_id")
