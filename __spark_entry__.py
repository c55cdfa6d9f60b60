"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; ``queries()``/``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 plus the north-star extension
operators (see dbqt_spark/queries.py for the registry and the determinism
rules that make Spark results hash-match the DuckDB oracles).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: data-quality summary of the sf0.001 star schema — per
    table: row count, column count, all-NULL and low-distinct column
    counts (dbstats + nullcheck in one result)."""
    from dbqt_spark.catalog import TPCH_TABLES, load_tables
    from dbqt_spark.operators.profile import profile_tables
    from dbqt_spark.operators.rowcount import table_row_counts

    sf_dir = "/root/testdata/sf0.001"
    tables = load_tables(spark, sf_dir, TPCH_TABLES)
    counts = table_row_counts(spark, sf_dir, TPCH_TABLES)
    prof = (
        profile_tables(tables)
        .groupBy("table_name")
        .agg(
            F.count(F.lit(1)).alias("n_columns"),
            F.count(F.when(F.col("status") == "NULL column", 1)).alias(
                "n_null_columns"
            ),
            F.count(F.when(F.col("status") == "Low distinct", 1)).alias(
                "n_low_distinct_columns"
            ),
        )
    )
    return counts.join(prof, "table_name", "left").orderBy("table_name")


def _driver_checked_names() -> set:
    """Query keys some committed driver correctness file
    (CORRECTNESS_r*.json) has already hard-verified — rows AND schema
    AND hash green, no error (VERDICT r12 #2: a driver FAIL must stay
    in the never-verified front half until it actually passes). Used
    to ROTATE the registry order below; empty on any read problem."""
    import glob
    import json
    import os

    seen: set = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(p) as f:
                for name, row in json.load(f).items():
                    if (
                        isinstance(row, dict)
                        and row.get("rows_match")
                        and row.get("schema_match")
                        and row.get("hash_match")
                        and not row.get("err")
                    ):
                        seen.add(name)
        except Exception:
            continue
    return seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry ordered for DRIVER-GATE ROTATION (VERDICT r10 process
    note: the driver samples a prefix of this dict, and its key set had
    not rotated since r9, leaving new queries covered only by the local
    sweeps). Queries the driver has never hard-verified interleave 1:1
    with already-verified ones, never-verified first — any prefix
    window now samples both new surface and regression coverage, and
    the ordering self-maintains as driver files accumulate. The
    rows-only-by-construction queries (no oracle_sql entry — the
    driver can only count their rows) sort LAST so every driver
    prefix slot goes to a hash-checkable query (VERDICT r12 #2)."""
    from itertools import zip_longest

    from dbqt_spark.queries import ORACLES, QUERIES

    seen = _driver_checked_names()
    fresh = [n for n in QUERIES if n not in seen and n in ORACLES]
    checked = [n for n in QUERIES if n in seen and n in ORACLES]
    rows_only = [n for n in QUERIES if n not in ORACLES]
    out: dict = {}
    for a, b in zip_longest(fresh, checked):
        if a is not None:
            out[a] = QUERIES[a]
        if b is not None:
            out[b] = QUERIES[b]
    for n in rows_only:
        out[n] = QUERIES[n]
    return out


def oracle_sql() -> dict[str, str]:
    from dbqt_spark.queries import ORACLES

    return dict(ORACLES)
