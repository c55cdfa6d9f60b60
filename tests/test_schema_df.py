"""Schema IR: canonical type names + nested flattening (FIXTURES.md F-6)."""

from pyspark.sql import types as T

from dbqt_spark.catalog import load_tables
from dbqt_spark.schema_df import build_schema_df, canonical_type, schema_rows


def test_canonical_types():
    assert canonical_type(T.LongType())[0] == "BIGINT"
    assert canonical_type(T.IntegerType()) == ("INTEGER", None, 32, 0)
    assert canonical_type(T.StringType())[0] == "VARCHAR"
    assert canonical_type(T.DoubleType()) == ("DOUBLE", None, 53, 0)
    assert canonical_type(T.TimestampType())[0] == "TIMESTAMP"
    assert canonical_type(T.DecimalType(10, 2)) == ("DECIMAL(10,2)", None, 10, 2)
    assert canonical_type(T.ArrayType(T.FloatType()))[0] == "FLOAT[]"


def test_nested_flattening_f6():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "profile",
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("age", T.IntegerType()),
                    ]
                ),
            ),
            T.StructField(
                "events",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("ts", T.TimestampType()),
                            T.StructField("kind", T.StringType()),
                        ]
                    )
                ),
            ),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    rows = schema_rows("t", schema, flatten=True)
    names = [r[1] for r in rows]
    assert names == [
        "ID",
        "PROFILE__NAME",
        "PROFILE__AGE",
        "EVENTS__TS",
        "EVENTS__KIND",
        "TAGS",
        "ATTRS",
    ]
    by_name = {r[1]: r[3] for r in rows}
    assert by_name["PROFILE__AGE"] == "INTEGER"
    assert by_name["EVENTS__TS"] == "TIMESTAMP"
    assert by_name["TAGS"] == "VARCHAR[]"
    assert by_name["ATTRS"] == "MAP(VARCHAR, VARCHAR)"


def test_build_schema_df_testdata(spark, sf_dir):
    tables = load_tables(spark, sf_dir, ["lineitem", "embeddings"])
    ir = build_schema_df(spark, tables)
    rows = {(r["SCH_TABLE"], r["COL_NAME"]): r for r in ir.collect()}
    assert rows[("LINEITEM", "L_ORDERKEY")]["DATA_TYPE"] == "BIGINT"
    assert rows[("LINEITEM", "L_SHIPDATE")]["DATA_TYPE"] == "TIMESTAMP"
    assert rows[("EMBEDDINGS", "EMBEDDING")]["DATA_TYPE"] == "FLOAT[]"
    assert rows[("LINEITEM", "L_LINENUMBER")]["ORDINAL_POSITION"] == 4
