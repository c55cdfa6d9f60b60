"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same parquet
tables, compare row count + column names + order-insensitive values.

Run against sf0.01 (the driver's t2 scale) with
DBQT_SPARK_TEST_SF_DIR=/root/testdata/sf0.01; defaults to sf0.001 for
speed in the regular suite.
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from dbqt_spark.catalog import TPCH_TABLES, table_path

ORACLE_NAMES = sorted(entry_mod.oracle_sql())
ALL_NAMES = sorted(entry_mod.queries())

# Two-tier parametrization (VERDICT r15 #6): the driver replays the FULL
# oracle gate itself (and check_correctness.py mirrors it on demand), so
# the default suite pins a SMOKE subset spanning every engine surface —
# core SQL, windows, text ops, a banded dedup tier, similarity, a
# streaming drain, a store lifecycle, WARC/CDX synthesis, the portable
# float contracts (pagerank/dsir: the historically gate-contested ones),
# and the two array-to-scalar conversions from the r15 driver ERRs.
# DBQT_SPARK_SLOW_TESTS=1 restores the full 186-query sweep.
PARITY_SMOKE = [
    "rowcounts",
    "agg_compare",
    "event_funnel",
    "repetition_stats",
    "minhash_near_dups",
    "ivf_topk",
    "streaming_dedup",
    "incremental_profile",
    "wat_metadata",
    "anchor_texts",
    "dsir_weights",
    "dsir_select",
    "pagerank_dangling",
    "cdx_dedup",
]


def _tiered(names):
    return [
        n if n in PARITY_SMOKE
        else pytest.param(n, marks=pytest.mark.slow)
        for n in names
    ]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    return con


def _canon_value(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return f"{v:.10g}"
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon_value(r[i]) for i in order) for r in rows
    )


@pytest.mark.parametrize("name", _tiered(ORACLE_NAMES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = entry_mod.queries()[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]

    res = duck.execute(entry_mod.oracle_sql()[name])
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    )
    s_can = _canon_rows(scols, srows)
    d_can = _canon_rows(dcols, drows)
    if s_can != d_can:
        diffs = [
            (a, b) for a, b in zip(s_can, d_can) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


# ---------------------------------------------------------------------------
# Oracle TYPE parity — the driver's value hasher is typed, so a DuckDB
# HUGEINT (uncast SUM of an integer column) hash-mismatches a Spark BIGINT
# even when every value is identical (this bit corpus_summary in r6).
# Map each DuckDB result type to the Spark dtype it must equal; types with
# no Spark twin (HUGEINT, UHUGEINT, unsigned ints) demand an explicit CAST
# in the oracle SQL and fail here.
# ---------------------------------------------------------------------------

_DUCK_SCALAR_TO_SPARK = {
    "TINYINT": {"tinyint"},
    "SMALLINT": {"smallint"},
    "INTEGER": {"int"},
    "BIGINT": {"bigint"},
    "FLOAT": {"float"},
    "DOUBLE": {"double"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "DATE": {"date"},
    "BLOB": {"binary"},
    # Spark's TIMESTAMP/TIMESTAMP_NTZ both serialize the same wall-clock
    # instants under the session-UTC contract (catalog.load_table).
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp"},
}


def _spark_twins(duck_type: str):
    """Spark dtypes that hash identically to ``duck_type``; None if the
    DuckDB type has no Spark twin (the oracle must CAST)."""
    duck_type = duck_type.strip()
    if duck_type.endswith("[]"):
        inner = _spark_twins(duck_type[:-2])
        if inner is None:
            return None
        return {f"array<{t}>" for t in inner}
    if duck_type.startswith("DECIMAL"):
        return {duck_type.lower().replace(" ", "")}
    return _DUCK_SCALAR_TO_SPARK.get(duck_type)


@pytest.mark.parametrize("name", _tiered(ORACLE_NAMES))
def test_oracle_types_match_spark(name, spark, sf_dir, duck):
    """Schema-only comparison — but building a lifecycle query's frame
    (store writes, stream drains, ``_localized`` collects) executes its
    eager work, so this sweep is NOT cheap; tiered like the value
    parity above."""
    sdf = entry_mod.queries()[name](spark, sf_dir)
    spark_types = {c.lower(): t for c, t in sdf.dtypes}

    rel = duck.sql(entry_mod.oracle_sql()[name])
    for col, dtype in zip(rel.columns, rel.types):
        col = col.lower()
        assert col in spark_types, f"{name}: oracle col {col} missing in Spark"
        twins = _spark_twins(str(dtype))
        assert twins is not None, (
            f"{name}.{col}: DuckDB type {dtype} has no Spark twin — add an "
            f"explicit CAST in the oracle SQL (typed hash would mismatch)"
        )
        assert spark_types[col] in twins, (
            f"{name}.{col}: Spark dtype {spark_types[col]} vs DuckDB {dtype} "
            f"(expected one of {sorted(twins)}) — typed hash would mismatch"
        )


@pytest.mark.parametrize("name", [n for n in ALL_NAMES if n not in ORACLE_NAMES])
def test_rows_only_queries_run(name, spark, sf_dir):
    df = entry_mod.queries()[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == len(TPCH_TABLES)
    assert all(r["row_count"] > 0 for r in rows)
