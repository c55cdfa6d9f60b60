"""Type canonicalization + compatibility groups.

Reimplements the reference's type-compatibility semantics
(dbqt/tools/colcompare.py:29-49, :134-153): types are upper-cased SQL name
strings, parameters stripped (``DECIMAL(10,2)`` → ``DECIMAL``); two types
are compatible iff equal after canonicalization, both match ``^TIMESTAMP``,
or they share a named equivalence group. Groups are user-overridable via
YAML (``load_type_mappings``).

Two call surfaces:
- ``are_types_compatible(a, b)`` — plain Python, for driver-side use and
  tests.
- ``compat_condition(col_a, col_b)`` — a Spark Column expression built from
  the same tables, so classification of millions of schema rows stays
  JVM-side inside whole-stage codegen (no Python UDF).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference defaults, mirrored VERBATIM (dbqt/tools/colcompare.py:29-39).
# NUMBER appears in both INTEGER and DECIMAL groups; ENUM in VARCHAR;
# membership is "share at least one group". Notable reference semantics
# preserved here: the DATE group also contains the TIMESTAMP variants, so
# DATE <-> TIMESTAMP classifies as *Matching* (a date column compared to a
# timestamp column is reported compatible); the DATETIME and ENUM groups
# exist but are redundant under the shared-group rule (their members
# already co-occur in TIMESTAMP / VARCHAR groups).
DEFAULT_TYPE_MAPPINGS: dict[str, list[str]] = {
    "INTEGER": ["INT", "INTEGER", "BIGINT", "SMALLINT", "TINYINT", "NUMBER"],
    "VARCHAR": ["VARCHAR", "TEXT", "CHAR", "STRING", "NVARCHAR", "VARCHAR2", "ENUM"],
    "DECIMAL": ["DECIMAL", "NUMERIC", "NUMBER"],
    "FLOAT": ["FLOAT", "REAL", "DOUBLE", "DOUBLE PRECISION"],
    "TIMESTAMP": ["TIMESTAMP", "DATETIME", "TIMESTAMP_NTZ", "TIMESTAMP_LTZ"],
    "DATE": ["DATE", "TIMESTAMP", "TIMESTAMP_NTZ", "TIMESTAMP_LTZ"],
    "DATETIME": ["TIMESTAMP", "TIMESTAMP_NTZ", "TIMESTAMP_LTZ"],
    "BOOLEAN": ["BOOLEAN", "BOOL", "BIT"],
    "ENUM": ["TEXT"],
}


def load_type_mappings(path: str | None) -> dict[str, list[str]]:
    """YAML override, shape ``type_mappings: {group: [types...]}`` —
    reference: dbqt/tools/colcompare.py:42-49."""
    if not path:
        return DEFAULT_TYPE_MAPPINGS
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    mappings = cfg.get("type_mappings", cfg)
    out = {
        g: [t.upper() for t in types] for g, types in mappings.items()
    }
    return out or DEFAULT_TYPE_MAPPINGS


def generate_config_file(output_path: str = "colcompare_config.yaml") -> bool:
    """Write the default type-mapping YAML a user can edit and pass back
    via ``--config`` (reference: dbqt/tools/colcompare.py:98-131). Returns
    False (and writes nothing) if the file already exists — the CLI is
    non-interactive, so "overwrite?" is answered by deleting the file."""
    import os

    import yaml

    if os.path.exists(output_path):
        return False
    with open(output_path, "w") as f:
        f.write(
            "# Column comparison type mappings configuration.\n"
            "# Each key represents a type group, and the list contains"
            " equivalent types.\n"
        )
        yaml.dump(
            {"type_mappings": DEFAULT_TYPE_MAPPINGS},
            f,
            default_flow_style=False,
            sort_keys=False,
        )
        f.write(
            "\n# Column names to exclude from comparison (case-insensitive)\n"
            "excluded_cols:\n"
            "  # - CREATED_AT\n"
            "  # - UPDATED_AT\n"
        )
    return True


def canonicalize(type_name: str) -> str:
    """UPPER + strip parenthesized parameters + trim
    (dbqt/tools/colcompare.py:139-141)."""
    return type_name.upper().split("(")[0].strip()


def are_types_compatible(
    type1: str, type2: str, type_mappings: dict[str, list[str]] | None = None
) -> bool:
    mappings = type_mappings or DEFAULT_TYPE_MAPPINGS
    t1, t2 = canonicalize(type1), canonicalize(type2)
    if t1 == t2:
        return True
    if re.match(r"^TIMESTAMP.*", t1) and re.match(r"^TIMESTAMP.*", t2):
        return True
    return any(t1 in group and t2 in group for group in mappings.values())


# ---------------------------------------------------------------------------
# Spark-expression variant: same semantics, fully JVM-side.
# ---------------------------------------------------------------------------


def canonicalize_col(c: Column) -> Column:
    return F.trim(F.regexp_replace(F.upper(c), r"\(.*$", ""))


def _groups_of(type_name: str, mappings: dict[str, list[str]]) -> list[str]:
    return [g for g, types in mappings.items() if type_name in types]


def groups_array_col(c: Column, mappings: dict[str, list[str]] | None = None) -> Column:
    """Map a canonicalized type-name column to the array of group names it
    belongs to — a generated CASE chain (stays in codegen; no UDF, no join
    needed for a bounded vocabulary)."""
    mappings = mappings or DEFAULT_TYPE_MAPPINGS
    all_types = sorted({t for types in mappings.values() for t in types})
    expr = F.array().cast("array<string>")
    result = None
    for t in all_types:
        groups = F.array(*[F.lit(g) for g in _groups_of(t, mappings)])
        result = (
            F.when(c == t, groups) if result is None else result.when(c == t, groups)
        )
    return result.otherwise(expr) if result is not None else expr


def compat_condition(
    a: Column, b: Column, mappings: dict[str, list[str]] | None = None
) -> Column:
    """Column predicate: are the two (raw) type-name columns compatible?

    Equivalent to ``are_types_compatible`` but evaluated by Catalyst: exact
    match OR both ^TIMESTAMP OR overlapping group arrays."""
    ca, cb = canonicalize_col(a), canonicalize_col(b)
    both_ts = ca.rlike("^TIMESTAMP") & cb.rlike("^TIMESTAMP")
    ga, gb = groups_array_col(ca, mappings), groups_array_col(cb, mappings)
    return (ca == cb) | both_ts | F.arrays_overlap(ga, gb)
