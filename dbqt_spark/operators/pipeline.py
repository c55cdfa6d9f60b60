"""End-to-end corpus curation: the standard training-data pipeline as
ONE composed DataFrame plan.

Beyond the reference surface (BASELINE.json north star). Stage order is
the one large-corpus pipelines converge on, cheapest-filter-first so
each later (more expensive) stage sees fewer rows:

    1. quality gate     — per-group exact-quantile threshold
                          (textstats.quality_quantile_filter)
    2. exact dedup      — md5 keep-min-id (dedup.dedup_exact)
    3. PII redaction    — ordered regexp masking (redact.redact_pii)
    4. split assignment — portable hash-mod (sampling.hash_split)

Every stage is a narrow declarative transformation, so Catalyst fuses
the whole chain: the corpus is scanned ONCE, shuffled only where a
stage semantically requires it (the dedup groupBy; the quality
thresholds are a broadcast, redaction and split are pure maps). The
result is deterministic — a pure function of (corpus, config, seed) —
which is what makes 100 TB curation re-runnable and auditable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CurateConfig:
    quality_quantile: float = 0.5
    group_col: str = "lang"
    text_col: str = "text"
    id_col: str = "doc_id"
    dedup: str = "exact"  # "exact" | "none"
    redact: bool = True
    seed: int = 42
    split_weights: "list[tuple[str, float]]" = field(
        default_factory=lambda: [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    )


def curate(df: DataFrame, config: CurateConfig | None = None) -> DataFrame:
    """Run the four-stage curation chain; returns the surviving rows
    with ``quality_score``, ``split``, and (if enabled) the redacted
    text appended. Original columns are preserved."""
    from .dedup import dedup_exact
    from .redact import redact_pii
    from .sampling import hash_split
    from .textstats import quality_quantile_filter

    cfg = config or CurateConfig()
    if cfg.dedup not in ("exact", "none"):
        raise ValueError(f"unknown dedup mode {cfg.dedup!r}")

    # 1. quality gate — survivors only, score carried along via semi-ish
    # inner join on the id (the filter frame is (id, group, score))
    scored = quality_quantile_filter(
        df,
        quantile=cfg.quality_quantile,
        group_col=cfg.group_col,
        text_col=cfg.text_col,
        id_col=cfg.id_col,
    ).select(cfg.id_col, "quality_score")
    kept = df.join(scored, cfg.id_col)

    # 2. exact dedup
    if cfg.dedup == "exact":
        kept = dedup_exact(kept, text_col=cfg.text_col, id_col=cfg.id_col)

    # 3. PII redaction
    if cfg.redact:
        kept = redact_pii(kept, text_col=cfg.text_col, id_col=cfg.id_col)

    # 4. deterministic split
    return hash_split(
        kept, id_col=cfg.id_col, weights=cfg.split_weights, seed=cfg.seed
    )


def curate_and_write(
    df: DataFrame,
    out_dir: str,
    config: CurateConfig | None = None,
) -> "dict[str, int]":
    """Curate and publish partitioned by split (the layout a trainer
    consumes directly); returns per-split row counts."""
    out = curate(df, config)
    out.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    written = (
        df.sparkSession.read.parquet(out_dir)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r["split"]: r["n"] for r in written}
