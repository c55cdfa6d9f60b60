"""Type-compat semantics — must-pass/must-fail pairs from FIXTURES.md F-5
(reference: dbqt/tools/colcompare.py:29-39,134-153)."""

from dbqt_spark.typecompat import are_types_compatible, canonicalize


def test_canonicalize():
    assert canonicalize("decimal(10,2)") == "DECIMAL"
    assert canonicalize(" varchar(255) ") == "VARCHAR"
    assert canonicalize("BIGINT") == "BIGINT"


def test_must_pass_pairs():
    assert are_types_compatible("INT", "BIGINT")
    assert are_types_compatible("NUMBER", "DECIMAL(10,2)")
    assert are_types_compatible("TIMESTAMP_NTZ", "DATETIME")
    assert are_types_compatible("TIMESTAMP_LTZ", "TIMESTAMP(9)")
    assert are_types_compatible("VARCHAR(255)", "TEXT")
    assert are_types_compatible("BOOL", "BIT")
    assert are_types_compatible("ENUM", "STRING")
    assert are_types_compatible("NUMBER", "INT")  # NUMBER in two groups
    assert are_types_compatible("DOUBLE PRECISION", "REAL")


def test_must_fail_pairs():
    assert not are_types_compatible("INT", "VARCHAR")
    assert not are_types_compatible("DECIMAL", "DATE")
    assert not are_types_compatible("DOUBLE", "DECIMAL")
    assert not are_types_compatible("BOOLEAN", "INT")


def test_timestamp_regex_rule():
    assert are_types_compatible("TIMESTAMP_WEIRD", "TIMESTAMPTZ")
    assert not are_types_compatible("TIMESTAMP", "DATE")


def test_spark_expression_variant(spark):
    from pyspark.sql import functions as F

    from dbqt_spark.typecompat import compat_condition

    pairs = [
        ("INT", "BIGINT", True),
        ("NUMBER", "DECIMAL(10,2)", True),
        ("TIMESTAMP_NTZ", "DATETIME", True),
        ("VARCHAR(255)", "TEXT", True),
        ("TIMESTAMP_X", "TIMESTAMPLTZ", True),
        ("INT", "VARCHAR", False),
        ("DECIMAL", "DATE", False),
        ("DOUBLE", "DECIMAL", False),
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in pairs], ["a", "b"]
    ).withColumn("compat", compat_condition(F.col("a"), F.col("b")))
    got = [r["compat"] for r in df.collect()]
    assert got == [e for _, _, e in pairs]
