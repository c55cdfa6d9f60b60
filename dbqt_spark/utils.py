"""Small driver-side utilities mirrored from the reference's toolbox."""

from __future__ import annotations

import logging
import time


def format_runtime(seconds: float) -> str:
    """Human-readable runtime (reference: dbqt/tools/utils.py:157-169)."""
    seconds = int(seconds)
    hours, rem = divmod(seconds, 3600)
    minutes, secs = divmod(rem, 60)
    if hours:
        return f"{hours}h {minutes}m {secs}s"
    if minutes:
        return f"{minutes}m {secs}s"
    return f"{secs}s"


class Timer:
    """Context-manager timer logging elapsed runtime on exit
    (reference: dbqt/tools/utils.py Timer usage across tools)."""

    def __init__(self, label: str = "run", logger: logging.Logger | None = None):
        self.label = label
        self.logger = logger or logging.getLogger("dbqt_spark")
        self.elapsed = 0.0

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self._t0
        self.logger.info("%s completed in %s", self.label, format_runtime(self.elapsed))


def spread_small_scan(df, factor: int = 2):
    """Repartition up to ``factor`` x the cluster's parallelism when the
    input frame has fewer partitions than cores — a SMALL-INPUT fix,
    not a scale behavior (guide idiom: one huge unsplittable file /
    single-row-group table -> repartition immediately after the read).

    A table stored as one parquet row group (this repo's testdata)
    reaches Spark as ONE scan partition, so a heavy narrow map
    (tokenize, regex canonicalization, synth parse) runs on a single
    core no matter how many the machine has. At corpus scale inputs
    arrive in >= cores splits (maxPartitionBytes) and this is a no-op.
    Streaming frames (no .rdd) pass through untouched — checked
    explicitly so genuine analysis errors propagate with their own
    stack instead of being swallowed (ADVICE r15). The 2x-cores
    target halves per-task walls, doubling FAIR-preemption granularity
    for latency-bound chain queries sharing the pool (BENCH_NOTES
    #10).

    The ``df.rdd.getNumPartitions()`` probe converts the plan to an
    RDD on the driver — measured ~1 ms per call at the wrapped
    operators' plan sizes (r16, 20-call average on scan and
    scan+projection frames), accepted: it is the one partitioning
    source that sees the ACTUAL scan split (post maxPartitionBytes/
    openCost packing), which a file-size estimate would have to
    re-derive."""
    if df.isStreaming:
        return df
    n = df.rdd.getNumPartitions()
    cores = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(factor * cores) if n < cores else df
