"""Benchmark-decontamination for training corpora.

Beyond the reference surface (north-star LLM-pipeline operator): flag or
drop training documents that share a word n-gram with an evaluation /
benchmark set — the standard exact-substring decontamination used for
LLM training data (GPT-3 appendix C uses 13-grams; Llama and the Pile
use the same shape), here as an exact inverted-index membership test.

Scale shape (the part that matters at 100 TB): the EVAL side is small by
construction (benchmarks are thousands of documents), so its distinct
n-gram hash set BROADCASTS; the corpus side is one narrow scan +
explode, the join is a BroadcastHashJoin, and the only shuffle carries
the matched (doc_id, hash) hits — near-zero rows for a clean corpus.
The corpus is never shuffled and never carries text past the hash
projection: each n-gram travels as one portable 60-bit md5-prefix
bigint (``operators.dedup.portable_token_hash`` family), which a
DuckDB/Trino oracle reproduces exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exploded_ngram_hashes(
    df: DataFrame, text_col: str, n: int, keep: list[str]
) -> DataFrame:
    """One row per DISTINCT word ``n``-gram per doc: ``keep`` columns
    plus ``__h``, the gram's portable 60-bit md5-prefix hash (see
    ``operators.dedup.portable_token_hash`` — engine-portable so a
    DuckDB/Trino oracle reproduces it bit-for-bit). Lowercased
    whitespace tokens; docs shorter than ``n`` tokens hash their whole
    token sequence (the shingle convention ``minhash_near_duplicates``
    uses); empty docs contribute nothing. The token array materializes
    per ROW (explode of a computed array), never per gram."""
    toks = F.expr(
        f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"
    )
    grams = F.expr(
        f"CASE WHEN size(__toks) = 0 THEN array() "
        f"ELSE array_distinct(transform("
        f"sequence(1, greatest(size(__toks) - {n} + 1, 1)), "
        f"i -> cast(conv(substring(md5(array_join(slice(__toks, i, {n}), "
        f"' ')), 1, 15), 16, 10) as bigint))) END"
    )
    return (
        df.select(*keep, toks.alias("__toks"))
        .select(*keep, F.explode(grams).alias("__h"))
    )


def eval_ngram_hashes(
    eval_df: DataFrame, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """The eval set's distinct n-gram hash frame — precompute (and
    persist) this once when checking MANY corpora/batches against the
    same benchmark (e.g. the streaming sink), instead of re-tokenizing
    the eval set per call."""
    return exploded_ngram_hashes(eval_df, text_col, n, keep=[]).distinct()


def contamination_check(
    corpus: DataFrame,
    eval_df: DataFrame | None = None,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_hashes: DataFrame | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """(id_col, n_hit_ngrams) for every corpus doc sharing at least one
    word ``n``-gram with the eval set. n=13 is the published GPT-3
    decontamination window; smaller n is stricter (more collisions on
    common phrases). Pass ``eval_hashes`` (from ``eval_ngram_hashes``,
    with the SAME ``n``) to reuse a precomputed eval side.

    ``broadcast_eval=True`` (the default, and the right shape — eval
    sets are thousands of documents by construction) forces the
    broadcast hash join so the corpus never shuffles. Pass ``False``
    only for a pathologically large eval side (tens of millions of
    distinct n-grams): the join becomes a shuffle on the gram hash and
    AQE picks the strategy — the corpus pays one hash shuffle, which
    still never moves text, only (id, hash) pairs."""
    if eval_hashes is None:
        if eval_df is None:
            raise ValueError("pass eval_df or a precomputed eval_hashes")
        eval_hashes = eval_ngram_hashes(eval_df, n, eval_text_col or text_col)
    corpus_hashes = exploded_ngram_hashes(corpus, text_col, n, keep=[id_col])
    eval_side = F.broadcast(eval_hashes) if broadcast_eval else eval_hashes
    return (
        corpus_hashes.join(eval_side, "__h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit_ngrams"))
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame | None = None,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_hashes: DataFrame | None = None,
) -> DataFrame:
    """Corpus rows with every contaminated document REMOVED (left-anti
    against ``contamination_check``). The anti-join side is the (small)
    contaminated id set, so the corpus still streams through one scan."""
    hits = contamination_check(
        corpus, eval_df, n, text_col, id_col, eval_text_col, eval_hashes
    )
    return corpus.join(
        F.broadcast(hits.select(id_col)), id_col, "left_anti"
    )


def contamination_overlap(
    corpus: DataFrame,
    eval_df: DataFrame | None = None,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_hashes: DataFrame | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-doc contamination STRENGTH: (id_col, n_ngrams,
    n_hit_ngrams, overlap_frac) for EVERY corpus doc — the fraction of
    the doc's distinct word n-grams that appear in the eval set
    (rounded to 4 places; 0.0 for clean docs and docs too short to
    produce a gram). ``contamination_check``'s boolean flag is the
    remove-it gate; the fraction is what decontamination REPORTS need
    (GPT-3 appendix C grades 'dirty' docs by overlap level, and a
    near-1.0 doc is an eval copy while a 0.01 doc shares one idiom).

    Scale shape: ONE corpus scan and ONE doc-keyed shuffle. Each
    exploded (doc, gram-hash) row is marked by a broadcast LEFT join
    against the eval hash set, then a single map-side-combinable
    groupBy(doc) counts total and hit grams together — the corpus is
    never scanned twice (the naive totals-join-hits formulation pays a
    second explode because the branches diverge before their
    exchanges). The final left join back to the id list only moves
    (id, counts) rows. ``broadcast_eval`` has the same contract as
    ``contamination_check``."""
    if eval_hashes is None:
        if eval_df is None:
            raise ValueError("pass eval_df or a precomputed eval_hashes")
        eval_hashes = eval_ngram_hashes(eval_df, n, eval_text_col or text_col)
    marked_side = eval_hashes.select("__h", F.lit(1).alias("__hit"))
    if broadcast_eval:
        marked_side = F.broadcast(marked_side)
    per_doc = (
        exploded_ngram_hashes(corpus, text_col, n, keep=[id_col])
        .join(marked_side, "__h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ngrams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_hit_ngrams"),
        )
    )
    return (
        corpus.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("n_hit_ngrams", F.lit(0))
            .cast("long")
            .alias("n_hit_ngrams"),
            F.when(
                F.coalesce(F.col("n_ngrams"), F.lit(0)) > 0,
                F.round(
                    F.col("n_hit_ngrams").cast("double")
                    / F.col("n_ngrams"),
                    4,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("overlap_frac"),
        )
    )
