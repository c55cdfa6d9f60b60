"""Declarative check framework: per-kind semantics + suite plumbing."""

import re

import pytest
from pyspark.sql import functions as F

from dbqt_spark.operators.checks import Check, load_check_suite, run_checks


@pytest.fixture()
def frames(spark):
    people = spark.createDataFrame(
        [
            (1, "a@x.com", 30, "US"),
            (2, "bad-email", 200, "US"),
            (2, None, -5, "XX"),
        ],
        "id long, email string, age int, country string",
    )
    countries = spark.createDataFrame([("US",), ("DE",)], "code string")
    return {"people": people, "countries": countries}


def _run(spark, frames, checks):
    rows = run_checks(spark, frames, [Check.from_dict(c) for c in checks]).collect()
    return {r["check_name"]: r for r in rows}


def test_check_kinds(spark, frames):
    out = _run(
        spark,
        frames,
        [
            {"name": "nn", "table": "people", "kind": "not_null", "column": "email"},
            {"name": "uq", "table": "people", "kind": "unique", "column": "id"},
            {"name": "fmt", "table": "people", "kind": "regex", "column": "email",
             "params": {"pattern": r"^[^@]+@[^@]+\.[a-z]+$"}},
            {"name": "rng", "table": "people", "kind": "range", "column": "age",
             "params": {"min": 0, "max": 120}},
            {"name": "set", "table": "people", "kind": "in_set", "column": "country",
             "params": {"values": ["US", "DE"]}},
            {"name": "avg", "table": "people", "kind": "stats_range", "column": "age",
             "params": {"stat": "avg", "min": 0, "max": 80}},
            {"name": "fk", "table": "people", "kind": "ref_integrity",
             "column": "country",
             "params": {"ref_table": "countries", "ref_column": "code"}},
        ],
    )
    assert out["nn"]["violations"] == 1 and not out["nn"]["passed"]
    assert out["uq"]["violations"] == 1  # id=2 twice
    assert out["fmt"]["violations"] == 1  # 'bad-email' (NULL not counted)
    assert out["rng"]["violations"] == 2  # 200 and -5
    assert out["set"]["violations"] == 1  # XX
    assert out["avg"]["violations"] == 0 and out["avg"]["passed"]  # avg=75
    assert out["fk"]["violations"] == 1  # XX not in countries


def test_single_scan_per_table(spark, frames):
    from dbqt_spark.plans import formatted_plan

    df = run_checks(
        spark,
        {"people": frames["people"]},
        [
            Check("a", "people", "not_null", "email"),
            Check("b", "people", "range", "age", {"min": 0}),
            Check("c", "people", "in_set", "country", {"values": ["US"]}),
        ],
    )
    # localrelation input -> no parquet, but assert one aggregate subtree:
    assert len(re.findall(r"\(\d+\) (?:Hash|ObjectHash|SortBased)?Aggregate", formatted_plan(df))) <= 4


def test_error_as_data(spark, frames):
    out = _run(
        spark,
        frames,
        [
            {"name": "bad_table", "table": "nope", "kind": "not_null", "column": "x"},
            {"name": "bad_kind", "table": "people", "kind": "wat", "column": "x"},
        ],
    )
    assert not out["bad_table"]["passed"]
    assert "unknown table" in out["bad_table"]["detail"]
    assert not out["bad_kind"]["passed"]
    assert "unknown check kind" in out["bad_kind"]["detail"]


def test_yaml_suite(tmp_path, spark, frames):
    p = tmp_path / "suite.yaml"
    p.write_text(
        "checks:\n"
        "  - {name: nn, table: people, kind: not_null, column: id}\n"
        "  - name: rng\n"
        "    table: people\n"
        "    kind: range\n"
        "    column: age\n"
        "    params: {min: 0}\n"
    )
    checks = load_check_suite(str(p))
    assert [c.name for c in checks] == ["nn", "rng"]
    out = run_checks(spark, frames, checks).collect()
    assert len(out) == 2


def test_drift_check_kind(spark):
    baseline = spark.range(1000).selectExpr(
        "CAST(id % 100 AS DOUBLE) AS v", "CAST(id % 5 AS STRING) AS g"
    )
    same = baseline
    shifted = spark.range(1000).selectExpr(
        "CAST(90 + id % 10 AS DOUBLE) AS v", "'9' AS g"
    )
    frames = {"base": baseline, "same": same, "shifted": shifted}
    got = _run(spark, frames, [
        {"name": "stable", "table": "same", "kind": "drift", "column": "v",
         "params": {"baseline_table": "base"}},
        {"name": "drifted", "table": "shifted", "kind": "drift",
         "column": "v", "params": {"baseline_table": "base"}},
        {"name": "cat_drift", "table": "shifted", "kind": "drift",
         "column": "g",
         "params": {"baseline_table": "base", "categorical": True,
                    "top_k": 3}},
        {"name": "no_base", "table": "same", "kind": "drift", "column": "v",
         "params": {"baseline_table": "missing"}},
    ])
    assert got["stable"]["passed"] is True
    assert got["stable"]["detail"].startswith("psi=0.0 ")
    assert got["drifted"]["passed"] is False
    assert got["drifted"]["violations"] == 1
    assert float(got["drifted"]["detail"].split()[0][4:]) > 0.25
    assert got["cat_drift"]["passed"] is False
    assert got["no_base"]["detail"] == "ERROR: unknown table"
