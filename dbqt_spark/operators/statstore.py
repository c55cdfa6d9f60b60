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
) -> None:
    """Append one segment of per-column partial statistics for ``df``
    (an ingest batch). Numeric columns carry min/max as double;
    non-numeric columns carry NULL min/max (their counts and distinct
    sketch still merge)."""
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
    segs = spark.read.parquet(path)
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
