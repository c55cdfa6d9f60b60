"""Declarative data-quality check framework.

Implements the reference's planned check suite (README.md:360-367:
completeness, uniqueness, format/regex, range/boundary, value validation,
statistical analysis, dependency checks) as a Spark-first framework the
reference itself never shipped:

- Checks are declarative specs (dataclass / YAML-friendly dicts).
- All single-table checks against one table compile into ONE
  ``groupBy().agg`` — a single scan regardless of how many checks the
  table carries (the reference's "parallel check execution" plan becomes
  map-side parallelism).
- Dependency (referential-integrity) checks are anti-join counts —
  broadcast when the referenced side is a dimension.
- Results are rows (check, table, column, kind, total, violations,
  passed, detail) — error-as-data like every other operator.

Example YAML suite::

    checks:
      - {name: ok_null,  table: orders,   kind: not_null, column: o_orderkey}
      - {name: ok_uni,   table: orders,   kind: unique,   column: o_orderkey}
      - {name: status_ok, table: orders,  kind: in_set,   column: o_orderstatus,
         params: {values: [O, F, P]}}
      - {name: price_rng, table: orders,  kind: range,    column: o_totalprice,
         params: {min: 0}}
      - {name: fk,       table: lineitem, kind: ref_integrity, column: l_orderkey,
         params: {ref_table: orders, ref_column: o_orderkey}}
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("check_name", T.StringType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("column_name", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("total_rows", T.LongType(), True),
        T.StructField("violations", T.LongType(), True),
        T.StructField("passed", T.BooleanType(), True),
        T.StructField("detail", T.StringType(), True),
    ]
)


@dataclass
class Check:
    name: str
    table: str
    kind: str
    column: str | None = None
    params: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "Check":
        return cls(
            name=d["name"],
            table=d["table"],
            kind=d["kind"],
            column=d.get("column"),
            params=d.get("params", {}) or {},
        )


_AGG_KINDS = {"not_null", "unique", "regex", "range", "in_set", "stats_range"}


def _violation_agg(check: Check):
    c = F.col(check.column)
    p = check.params
    if check.kind == "not_null":
        return F.count(F.when(c.isNull(), 1))
    if check.kind == "unique":
        # duplicate rows: total non-null minus distinct (NULLs are the
        # not_null check's concern)
        return F.count(c) - F.countDistinct(c)
    if check.kind == "regex":
        return F.count(F.when(c.isNotNull() & ~c.rlike(p["pattern"]), 1))
    if check.kind == "range":
        cond = F.lit(False)
        if "min" in p:
            cond = cond | (c < F.lit(p["min"]))
        if "max" in p:
            cond = cond | (c > F.lit(p["max"]))
        return F.count(F.when(c.isNotNull() & cond, 1))
    if check.kind == "in_set":
        return F.count(
            F.when(c.isNotNull() & ~c.isin(list(p["values"])), 1)
        )
    if check.kind == "stats_range":
        # statistical analysis: bound an aggregate statistic; "violations"
        # is 1 when the statistic is out of bounds
        stat = p.get("stat", "avg")
        agg = {"avg": F.avg, "min": F.min, "max": F.max, "stddev": F.stddev}[stat](c)
        cond = F.lit(False)
        if "min" in p:
            cond = cond | (agg < F.lit(p["min"]))
        if "max" in p:
            cond = cond | (agg > F.lit(p["max"]))
        return F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("long")
    raise ValueError(f"unknown check kind: {check.kind}")


def run_table_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """All aggregate-expressible checks for ONE table in ONE scan."""
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, check in enumerate(checks):
        aggs.append(_violation_agg(check).cast("long").alias(f"__v_{i}"))
    one = df.groupBy().agg(*aggs)
    structs = [
        F.struct(
            F.lit(c.name).alias("check_name"),
            F.lit(c.table).alias("table_name"),
            F.lit(c.column).cast("string").alias("column_name"),
            F.lit(c.kind).alias("kind"),
            F.col("__total").cast("long").alias("total_rows"),
            F.col(f"__v_{i}").alias("violations"),
            (F.col(f"__v_{i}") == 0).alias("passed"),
            F.lit(_detail(c)).cast("string").alias("detail"),
        )
        for i, c in enumerate(checks)
    ]
    return one.select(F.inline(F.array(*structs)))


def _detail(check: Check) -> str | None:
    return str(check.params) if check.params else None


def run_ref_integrity(
    spark: SparkSession,
    df: DataFrame,
    check: Check,
    ref_df: DataFrame,
) -> DataFrame:
    """Dependency check: rows whose FK value has no match in the
    referenced column (left_anti join; the ref side is deduplicated and
    broadcast when small)."""
    fk, rc = check.column, check.params["ref_column"]
    ref_keys = ref_df.select(F.col(rc).alias(fk)).distinct()
    orphans = df.select(fk).filter(F.col(fk).isNotNull()).join(
        F.broadcast(ref_keys), fk, "left_anti"
    )
    totals = df.groupBy().agg(
        F.count(F.lit(1)).alias("__total")
    ).crossJoin(orphans.groupBy().agg(F.count(F.lit(1)).alias("__viol")))
    return totals.select(
        F.lit(check.name).alias("check_name"),
        F.lit(check.table).alias("table_name"),
        F.lit(fk).cast("string").alias("column_name"),
        F.lit(check.kind).alias("kind"),
        F.col("__total").cast("long").alias("total_rows"),
        F.col("__viol").cast("long").alias("violations"),
        (F.col("__viol") == 0).alias("passed"),
        F.lit(_detail(check)).cast("string").alias("detail"),
    )


def run_drift_check(
    spark: SparkSession,
    df: DataFrame,
    check: Check,
    baseline_df: DataFrame,
) -> DataFrame:
    """Distribution-drift check: total PSI of ``check.column`` in the
    checked table against the baseline table's distribution
    (operators/datadiff.py). ``params``: ``baseline_table`` (required),
    ``threshold`` (default 0.25 — the standard action level), ``bins``
    (numeric, default 10) or ``categorical: true`` with ``top_k``.
    The measured PSI lands in ``detail`` (computed, not static — unlike
    the fused aggregate checks this one owns its plan, like
    ref_integrity)."""
    from .datadiff import psi_drift, psi_drift_categorical

    p = check.params
    threshold = float(p.get("threshold", 0.25))
    if p.get("categorical"):
        rep = psi_drift_categorical(
            baseline_df, df, check.column, top_k=int(p.get("top_k", 20))
        )
    else:
        rep = psi_drift(
            baseline_df, df, check.column, bins=int(p.get("bins", 10))
        )
    tot = rep.groupBy().agg(
        F.round(F.sum("psi_contrib"), 6).alias("__psi"),
        F.sum("n_target").cast("long").alias("__total"),
    )
    return tot.select(
        F.lit(check.name).alias("check_name"),
        F.lit(check.table).alias("table_name"),
        F.lit(check.column).cast("string").alias("column_name"),
        F.lit(check.kind).alias("kind"),
        F.col("__total").cast("long").alias("total_rows"),
        F.when(F.col("__psi") > threshold, 1)
        .otherwise(0)
        .cast("long")
        .alias("violations"),
        (F.col("__psi") <= threshold).alias("passed"),
        F.concat(
            F.lit("psi="),
            F.col("__psi").cast("string"),
            F.lit(f" threshold={threshold}"),
        ).cast("string").alias("detail"),
    )


def run_checks(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    checks: list[Check],
) -> DataFrame:
    """Run a full suite: per-table fused aggregation passes + anti-join
    dependency checks, unioned into one result frame. Unknown tables or
    bad specs become failed rows with the error in ``detail``
    (error-as-data)."""
    parts: list[DataFrame] = []
    errors: list[tuple] = []
    by_table: dict[str, list[Check]] = {}
    ref_checks: list[Check] = []
    drift_checks: list[Check] = []
    for c in checks:
        if c.kind == "ref_integrity":
            ref_checks.append(c)
        elif c.kind == "drift":
            drift_checks.append(c)
        elif c.kind in _AGG_KINDS:
            by_table.setdefault(c.table, []).append(c)
        else:
            errors.append(
                (c.name, c.table, c.column, c.kind, None, None, False,
                 f"ERROR: unknown check kind {c.kind}")
            )
    for table, tchecks in by_table.items():
        if table not in tables:
            errors.extend(
                (c.name, c.table, c.column, c.kind, None, None, False,
                 "ERROR: unknown table")
                for c in tchecks
            )
            continue
        parts.append(run_table_checks(tables[table], tchecks))
    for c in ref_checks:
        if c.table not in tables or c.params.get("ref_table") not in tables:
            errors.append(
                (c.name, c.table, c.column, c.kind, None, None, False,
                 "ERROR: unknown table")
            )
            continue
        parts.append(
            run_ref_integrity(
                spark, tables[c.table], c, tables[c.params["ref_table"]]
            )
        )
    for c in drift_checks:
        if (
            c.table not in tables
            or c.params.get("baseline_table") not in tables
        ):
            errors.append(
                (c.name, c.table, c.column, c.kind, None, None, False,
                 "ERROR: unknown table")
            )
            continue
        parts.append(
            run_drift_check(
                spark, tables[c.table], c, tables[c.params["baseline_table"]]
            )
        )
    if errors:
        parts.append(spark.createDataFrame(errors, RESULT_SCHEMA))
    if not parts:
        return spark.createDataFrame([], RESULT_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def load_check_suite(path: str) -> list[Check]:
    """YAML suite file: ``checks: [{name, table, kind, column, params}]``."""
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    return [Check.from_dict(d) for d in cfg.get("checks", [])]
