"""Parquet combine / validate — schema-gated union + file utilities.

Reference behavior: ``pa.concat_tables`` of schema-identical parquet files,
mismatched schemas skipped with a warning (dbqt/tools/combine.py:71-119);
``is_parquet_file`` checks PAR1 magic bytes (dbqt/tools/parquetizer.py:6-20);
``add_parquet_extension`` renames extension-less parquet files
(parquetizer.py:23-49).

Spark design: schema gating happens on footer-only reads (no data I/O), the
combine itself is ``unionByName`` + a distributed parquet write — at 100 TB
this is a pure scan→write with no shuffle (``spark.read.parquet(*paths)``
of the conformant files). ``single_file=True`` coalesces to 1 task for the
reference's single-output-file behavior — only sensible for small outputs.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

logger = logging.getLogger(__name__)


def is_parquet_file(filepath: str) -> bool:
    """PAR1 magic-byte sniff, no parsing (parquetizer.py:6-20)."""
    try:
        size = os.path.getsize(filepath)
        if size < 8:
            return False
        with open(filepath, "rb") as f:
            if f.read(4) != b"PAR1":
                return False
            f.seek(-4, os.SEEK_END)
            return f.read(4) == b"PAR1"
    except OSError:
        return False


def add_parquet_extension(directory: str, dry_run: bool = False) -> list[str]:
    """Rename extension-less parquet files to ``*.parquet``
    (parquetizer.py:23-49). Driver-side utility."""
    renamed = []
    for name in sorted(os.listdir(directory)):
        path = os.path.join(directory, name)
        if not os.path.isfile(path) or "." in name:
            continue
        if is_parquet_file(path):
            new_path = path + ".parquet"
            if not dry_run:
                os.rename(path, new_path)
            renamed.append(new_path)
    return renamed


@dataclass
class CombineResult:
    combined: DataFrame | None
    included: list[str] = field(default_factory=list)
    skipped: list[tuple[str, str]] = field(default_factory=list)  # (path, reason)


def combine_parquet(
    spark: SparkSession,
    paths: list[str],
    output_path: str | None = None,
    single_file: bool = False,
) -> CombineResult:
    """Union schema-identical parquet files; skip mismatches with a warning
    (error-as-data: skips are returned, not raised — combine.py:96-103)."""
    result = CombineResult(combined=None)
    reference_schema = None
    dfs = []
    for path in paths:
        if os.path.isfile(path) and not is_parquet_file(path):
            result.skipped.append((path, "not a parquet file"))
            logger.warning("Skipping non-parquet file %s", path)
            continue
        try:
            df = spark.read.parquet(path)  # footer-only until an action
        except Exception as exc:
            result.skipped.append((path, f"unreadable: {exc}"))
            continue
        if reference_schema is None:
            reference_schema = df.schema
        elif df.schema != reference_schema:
            result.skipped.append((path, "schema mismatch"))
            logger.warning("Skipping %s: schema mismatch", path)
            continue
        dfs.append(df)
        result.included.append(path)

    if not dfs:
        return result
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    result.combined = out
    if output_path:
        writer = out.coalesce(1) if single_file else out
        writer.write.mode("overwrite").parquet(output_path)
    return result
