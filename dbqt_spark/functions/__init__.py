"""SQL-registered engine functions.

The reference's extensibility points (YAML type mappings, %-wildcard
patterns) become plain SQL functions here so `spark.sql` users can call
them inline — SURVEY.md §4: no Catalyst extensions needed, just
``spark.udf.register``. These are driver/metadata-path helpers (schema
rows, name lists); data-path hot loops keep using the pure-expression
equivalents in `typecompat`/`patterns`.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def register_engine_functions(
    spark: SparkSession, type_mappings: dict[str, list[str]] | None = None
) -> list[str]:
    """Register dbqt helper functions for SQL use. Returns the names."""
    from ..patterns import matches_any_pattern
    from ..typecompat import are_types_compatible, canonicalize

    def _compat(a: str, b: str) -> bool:
        if a is None or b is None:
            return False
        return are_types_compatible(a, b, type_mappings)

    def _canon(a: str) -> str:
        return canonicalize(a) if a is not None else None

    def _excluded(name: str, patterns: str) -> bool:
        if name is None:
            return False
        pats = [p for p in (patterns or "").split(",") if p]
        return matches_any_pattern(name, pats)

    spark.udf.register("dbqt_type_compatible", _compat, T.BooleanType())
    spark.udf.register("dbqt_canonical_type", _canon, T.StringType())
    spark.udf.register("dbqt_name_excluded", _excluded, T.BooleanType())
    return ["dbqt_type_compatible", "dbqt_canonical_type", "dbqt_name_excluded"]
