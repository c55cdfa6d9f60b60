"""As-of (point-in-time) join — a time-series operator Spark lacks as a
built-in, composed from existing DataFrame ops (no reference analog;
north-star time-series extension).

Semantics match DuckDB/pandas ``ASOF JOIN`` with ``direction='backward'``:
for every left row, attach the single right row with the greatest
``right.ts <= left.ts`` among rows sharing the ``by`` keys; left rows with
no such right row keep NULLs (left outer).

Scale design: the naive formulation is a range join (``l.ts >= r.ts`` +
per-key max), which Catalyst plans as a quadratic-per-key nested loop. This
implementation is the standard union trick instead — tag both sides, union,
and carry the latest right payload forward with
``last(ignorenulls) OVER (PARTITION BY key ORDER BY ts, side)``:
ONE hash shuffle on the key + ONE per-partition sort, linear in rows, no
pair blowup, and skewed keys are still bounded by their own row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: str | list[str] = "user_id",
    right_prefix: str = "right_",
    tolerance_seconds: "int | None" = None,
) -> DataFrame:
    """Backward as-of join: all ``left`` columns plus every non-key
    ``right`` column renamed ``{right_prefix}{name}``.

    Ties (``right.ts == left.ts``) match, like DuckDB ``ON l.ts >= r.ts``;
    among the tied-or-earlier right rows the greatest ``ts`` wins
    (deterministic given unique (by, ts) on the right — enforce upstream
    when the right side can hold duplicates).

    ``tolerance_seconds`` voids matches older than the window (pandas
    ``merge_asof`` tolerance contract): a left row whose best match is
    further back than the tolerance keeps NULLs instead. Inclusive at
    the boundary. For TIMESTAMP ts columns the gap is computed in
    integer microseconds (``unix_micros`` — exact, engine-portable);
    for numeric ts columns the tolerance is in the column's own units.
    """
    keys = [by] if isinstance(by, str) else list(by)
    rpayload = [c for c in right.columns if c not in keys]
    lpayload = [c for c in left.columns if c not in keys]

    # one unioned relation: __r is the right payload (NULL on left rows)
    r_side = right.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*rpayload).alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lpayload],
    )
    l_side = left.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_side.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in lpayload],
    )
    unioned = r_side.unionByName(l_side)

    # ORDER BY (ts, side): a right row at exactly left.ts sorts first, so
    # the running last() sees it — the "<=" tie rule.
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    if tolerance_seconds is not None:
        from pyspark.sql.types import TimestampNTZType, TimestampType

        # the carried struct holds the matched right row's own ts; a
        # match further back than the window is voided wholesale
        if isinstance(
            left.schema[ts_col].dataType, (TimestampType, TimestampNTZType)
        ):
            gap = F.unix_micros(F.col("__ts")) - F.unix_micros(
                F.col("__m")[ts_col]
            )
            limit = F.lit(int(tolerance_seconds) * 1_000_000)
        else:
            gap = F.col("__ts") - F.col("__m")[ts_col]
            limit = F.lit(tolerance_seconds)
        matched = matched.withColumn(
            "__m",
            F.when(F.col("__m").isNotNull() & (gap <= limit), F.col("__m")),
        )

    out_cols = (
        [F.col(k) for k in keys]
        + [F.col(f"__l_{c}").alias(c) for c in lpayload]
        + [F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in rpayload]
    )
    return matched.filter(F.col("__side") == 1).select(*out_cols)
