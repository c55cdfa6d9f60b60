"""The schema-DataFrame IR — this engine's "information_schema".

The reference's central intermediate representation is a 6-column frame
``SCH_TABLE, COL_NAME, DATA_TYPE, DATETIME_PRECISION, NUMERIC_PRECISION,
NUMERIC_SCALE`` built from information_schema queries, CSV dumps, or parquet
footers, with all names upper-cased (reference: dbqt/tools/utils.py:345-448,
dbqt/connections.py:65-78). Here it is built from Spark ``StructType``
schemas — a driver-side walk (schemas are tiny) producing a small Spark
DataFrame that downstream comparison operators join on.

Type names are canonicalized to ANSI-ish SQL names (the same names DuckDB's
information_schema reports) so that schema comparisons are
engine-independent — matching the reference's treatment of types as
upper-cased SQL name strings (dbqt/tools/colcompare.py:139-141).

Nested flattening mirrors the reference's parquet handling
(dbqt/tools/colcompare.py:161-217): struct → ``parent__child`` leaves,
array<struct> → recurse into the element struct, array<primitive> and map →
one opaque leaf named after the parent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SCHEMA_IR_COLUMNS = [
    "SCH_TABLE",
    "COL_NAME",
    "ORDINAL_POSITION",
    "DATA_TYPE",
    "DATETIME_PRECISION",
    "NUMERIC_PRECISION",
    "NUMERIC_SCALE",
]

_SCHEMA_IR_SPARK_SCHEMA = T.StructType(
    [
        T.StructField("SCH_TABLE", T.StringType(), False),
        T.StructField("COL_NAME", T.StringType(), False),
        T.StructField("ORDINAL_POSITION", T.IntegerType(), False),
        T.StructField("DATA_TYPE", T.StringType(), False),
        T.StructField("DATETIME_PRECISION", T.IntegerType(), True),
        T.StructField("NUMERIC_PRECISION", T.IntegerType(), True),
        T.StructField("NUMERIC_SCALE", T.IntegerType(), True),
    ]
)

# Spark atomic type -> (SQL name, numeric_precision, numeric_scale).
# Precision values follow information_schema conventions (bit width for
# integers, mantissa bits for floats) as DuckDB reports them.
_ATOMIC = {
    T.ByteType: ("TINYINT", 8, 0),
    T.ShortType: ("SMALLINT", 16, 0),
    T.IntegerType: ("INTEGER", 32, 0),
    T.LongType: ("BIGINT", 64, 0),
    T.FloatType: ("FLOAT", 24, 0),
    T.DoubleType: ("DOUBLE", 53, 0),
    T.StringType: ("VARCHAR", None, None),
    T.CharType: ("CHAR", None, None),
    T.VarcharType: ("VARCHAR", None, None),
    T.BooleanType: ("BOOLEAN", None, None),
    T.BinaryType: ("BLOB", None, None),
    T.DateType: ("DATE", None, None),
    T.TimestampType: ("TIMESTAMP", None, None),
    T.TimestampNTZType: ("TIMESTAMP", None, None),
    T.NullType: ("NULL", None, None),
}


def canonical_type(dt: T.DataType) -> tuple[str, int | None, int | None, int | None]:
    """Map a Spark DataType to (sql_name, datetime_prec, num_prec, num_scale)."""
    if isinstance(dt, T.DecimalType):
        return (f"DECIMAL({dt.precision},{dt.scale})", None, dt.precision, dt.scale)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return ("TIMESTAMP", None, None, None)
    if isinstance(dt, T.ArrayType):
        inner, _, _, _ = canonical_type(dt.elementType)
        return (f"{inner}[]", None, None, None)
    if isinstance(dt, T.MapType):
        k, _, _, _ = canonical_type(dt.keyType)
        v, _, _, _ = canonical_type(dt.valueType)
        return (f"MAP({k}, {v})", None, None, None)
    if isinstance(dt, T.StructType):
        return (dt.simpleString().upper(), None, None, None)
    for cls, (name, p, s) in _ATOMIC.items():
        if isinstance(dt, cls):
            return (name, None, p, s)
    return (dt.simpleString().upper(), None, None, None)


def _is_nested(dt: T.DataType) -> bool:
    return isinstance(dt, (T.ArrayType, T.MapType, T.StructType))


def _flatten_field(
    name: str, dt: T.DataType, out: list[tuple[str, T.DataType]]
) -> None:
    """Reference flattening semantics (dbqt/tools/colcompare.py:161-217):
    struct and array<struct> recurse with ``parent__child`` names;
    array<primitive> and map collapse to one leaf named after the parent."""
    if isinstance(dt, T.ArrayType):
        elem = dt.elementType
        if isinstance(elem, T.StructType):
            for f in elem.fields:
                child = f"{name}__{f.name}" if name else f.name
                if _is_nested(f.dataType):
                    _flatten_field(child, f.dataType, out)
                else:
                    out.append((child, f.dataType))
        else:
            out.append((name, dt))
    elif isinstance(dt, T.StructType):
        for f in dt.fields:
            child = f"{name}__{f.name}" if name else f.name
            if _is_nested(f.dataType):
                _flatten_field(child, f.dataType, out)
            else:
                out.append((child, f.dataType))
    elif isinstance(dt, T.MapType):
        out.append((name, dt))
    else:
        out.append((name, dt))


def schema_rows(
    table_name: str, schema: T.StructType, flatten: bool = False
) -> list[tuple]:
    """One IR row per (flattened) column. Names upper-cased per reference
    (dbqt/tools/utils.py:433-435)."""
    leaves: list[tuple[str, T.DataType]] = []
    if flatten:
        for f in schema.fields:
            if _is_nested(f.dataType):
                _flatten_field(f.name, f.dataType, leaves)
            else:
                leaves.append((f.name, f.dataType))
    else:
        leaves = [(f.name, f.dataType) for f in schema.fields]

    rows = []
    for i, (col, dt) in enumerate(leaves, start=1):
        sql_name, dtp, np_, ns = canonical_type(dt)
        rows.append(
            (table_name.upper(), col.upper(), i, sql_name, dtp, np_, ns)
        )
    return rows


def schema_df_from_csv(
    spark: SparkSession, path: str, default_data_type: str = "N/A"
) -> DataFrame:
    """Schema-dump CSV (FIXTURES.md F-3; reference colcompare.py:259-284):
    required TABLE_NAME/COL_NAME, optional SCH (concatenated into
    SCH_TABLE with '.') and DATA_TYPE (defaults 'N/A'). Driver-side read —
    schema dumps are small."""
    import csv

    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    out = []
    for i, r in enumerate(rows, start=1):
        r = {k.upper(): (v or "").strip() for k, v in r.items()}
        table = r.get("TABLE_NAME", "")
        sch = r.get("SCH", "")
        sch_table = f"{sch}.{table}" if sch else table
        out.append(
            (
                sch_table.upper(),
                r.get("COL_NAME", "").upper(),
                i,
                (r.get("DATA_TYPE") or default_data_type).upper(),
                None,
                None,
                None,
            )
        )
    return spark.createDataFrame(out, schema=_SCHEMA_IR_SPARK_SCHEMA)


def schema_df_from_parquet_file(
    spark: SparkSession, path: str, label: str | None = None
) -> DataFrame:
    """Footer-only schema read of one parquet file, nested types flattened
    (reference colcompare.py:246-251 + §2.8)."""
    import os

    name = label or os.path.splitext(os.path.basename(path))[0]
    schema = spark.read.parquet(path).schema
    rows = schema_rows(name, schema, flatten=True)
    return spark.createDataFrame(rows, schema=_SCHEMA_IR_SPARK_SCHEMA)


def build_schema_df(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    flatten: bool = False,
) -> DataFrame:
    """Build the schema IR for a set of tables.

    Driver-side walk over ``df.schema`` (footer-only reads — no data I/O),
    then a tiny DataFrame. At 100 TB this stays tiny: it scales with column
    count, not rows, exactly like the reference's one-query-per-schema
    metadata fetch (dbqt/tools/utils.py:391-448).
    """
    rows: list[tuple] = []
    for name, df in tables.items():
        rows.extend(schema_rows(name, df.schema, flatten=flatten))
    return spark.createDataFrame(rows, schema=_SCHEMA_IR_SPARK_SCHEMA)
