"""User-overridable type mappings (YAML) — reference colcompare.py:42-49."""


def test_load_type_mappings_yaml(tmp_path):
    from dbqt_spark.typecompat import are_types_compatible, load_type_mappings

    p = tmp_path / "types.yaml"
    p.write_text(
        "type_mappings:\n"
        "  weird_group:\n"
        "    - INT\n"
        "    - varchar\n"
    )
    mappings = load_type_mappings(str(p))
    assert mappings == {"weird_group": ["INT", "VARCHAR"]}
    # override changes compatibility decisions
    assert are_types_compatible("INT", "VARCHAR", mappings)
    assert not are_types_compatible("INT", "BIGINT", mappings)
    # default behavior unchanged without the override
    assert not are_types_compatible("INT", "VARCHAR")


def test_compare_columns_with_override(spark):
    from dbqt_spark.operators.colcompare import compare_columns
    from dbqt_spark.schema_df import _SCHEMA_IR_SPARK_SCHEMA

    rows = [("T", "A", 1, "INT", None, None, None)]
    src = spark.createDataFrame(rows, _SCHEMA_IR_SPARK_SCHEMA)
    tgt = spark.createDataFrame(
        [("T", "A", 1, "VARCHAR", None, None, None)], _SCHEMA_IR_SPARK_SCHEMA
    )
    default = compare_columns(src, tgt).collect()[0]["status"]
    assert default == "Different Types"
    overridden = compare_columns(
        src, tgt, type_mappings={"g": ["INT", "VARCHAR"]}
    ).collect()[0]["status"]
    assert overridden == "Matching"
