"""YAML config compatibility with the reference CLI.

Accepts the reference's config shapes (README.md:164-229: ``connection:``
block, ``tables_file``, ``max_workers``, ``excluded_tables``,
``excluded_cols``) so existing dbqt configs drive this engine. Connection
types map to Spark sources (sources.py); database-server types become
JDBC reads instead of driver-managed socket connections.
"""

from __future__ import annotations

import csv
import logging
from dataclasses import dataclass, field

import yaml

logger = logging.getLogger(__name__)


def load_config(path: str) -> dict:
    """yaml.safe_load — reference: dbqt/tools/utils.py:19-22."""
    with open(path) as f:
        return yaml.safe_load(f) or {}


@dataclass
class EngineConfig:
    connection: dict = field(default_factory=dict)
    tables_file: str | None = None
    max_workers: int = 4
    excluded_tables: list[str] = field(default_factory=list)
    excluded_cols: list[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, cfg: dict) -> "EngineConfig":
        return cls(
            connection=cfg.get("connection", {}) or {},
            tables_file=cfg.get("tables_file"),
            max_workers=int(cfg.get("max_workers", 4) or 4),
            excluded_tables=list(cfg.get("excluded_tables", []) or []),
            excluded_cols=list(cfg.get("excluded_cols", []) or []),
        )

    @classmethod
    def load(cls, path: str) -> "EngineConfig":
        return cls.from_dict(load_config(path))


def read_tables_csv(path: str) -> tuple[str, list[dict]]:
    """Tables-list CSV (FIXTURES.md F-1/F-2; reference utils.py:227-327).

    Returns ("single", [{"table_name": ...}]) or
    ("dual", [{"source_table": ..., "target_table": ..., **extras}]).
    Extra columns pass through (dbstats.py:181-186).
    """
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    if not rows:
        return "single", []
    cols = {c.lower() for c in rows[0]}
    if {"source_table", "target_table"} <= cols:
        return "dual", [
            {k.lower(): (v or "").strip() for k, v in r.items()} for r in rows
        ]
    if "table_name" in cols:
        return "single", [
            {"table_name": (r.get("table_name") or "").strip()} for r in rows
        ]
    raise ValueError(
        f"{path}: expected 'table_name' or 'source_table'/'target_table' columns"
    )


def read_csv_list(path: str, column_name: str) -> list[str]:
    """Single-column value list with header-skip heuristic
    (utils.py:25-36)."""
    values: list[str] = []
    with open(path) as f:
        for line in f:
            v = line.strip()
            if v:
                values.append(v)
    if values and values[0].lower() == column_name.lower():
        values = values[1:]
    return values


def discover_common_tables(
    source_names: list[str], target_names: list[str]
) -> list[dict]:
    """Dual-database auto-discovery with case-insensitive intersection and
    _discovery_status tagging (FIXTURES.md F-12; utils.py:264-317)."""
    src_by_upper = {n.upper(): n for n in source_names}
    tgt_by_upper = {n.upper(): n for n in target_names}
    out = []
    for u in sorted(set(src_by_upper) | set(tgt_by_upper)):
        if u in src_by_upper and u in tgt_by_upper:
            status = "common"
        elif u in src_by_upper:
            status = "source_only"
        else:
            status = "target_only"
        out.append(
            {
                "source_table": src_by_upper.get(u, ""),
                "target_table": tgt_by_upper.get(u, ""),
                "_discovery_status": status,
            }
        )
    return out
