"""Cache-lifetime helpers for operators that return persisted frames.

Several near-dup operators (``minhash_near_duplicates``,
``simhash_near_duplicates``, ``embedding_near_dup_pairs`` /
``embedding_blocked_nn`` with the block cap enabled) eagerly materialize
and RETURN a persisted DataFrame — the banded intermediate feeds multiple
jobs and must be released inside the operator, so the (small) result is
cached instead and handed to the caller still pinned. The contract is
that the caller releases it: either ``result.unpersist()`` directly, or
scope it with ``released``::

    with released(minhash_near_duplicates(docs)) as pairs:
        pairs.write.parquet(out)
    # cached blocks are gone here

At 100 TB cached-block leaks are an executor-memory bleed across a long
driver program — this makes the release a scoped guarantee instead of a
remember-to-call.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame


@contextmanager
def released(*dfs: DataFrame):
    """Yield the frame(s), unpersist them on exit (even on error).

    ``with released(df) as df:`` for one frame,
    ``with released(a, b) as (a, b):`` for several. Unpersisting a
    never-persisted frame is a no-op, so this is safe to wrap around
    operators whose persistence depends on options (e.g. the embedding
    ops persist only when ``max_block_size`` is set).
    """
    try:
        yield dfs[0] if len(dfs) == 1 else dfs
    finally:
        for df in dfs:
            df.unpersist()
