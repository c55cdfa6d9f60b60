"""On-engine unigram-LM tokenizer induction (SentencePiece-shaped).

The second tokenizer-induction surface next to BPE (``bpe.py``): Kudo
2018 (arXiv:1804.10959) trains a UNIGRAM language model over a seed
vocabulary of substrings and segments text by maximum likelihood —
the algorithm behind SentencePiece's default mode. The engine carries
the pipeline's simplified, engine-portable variant:

- **Seed** (``substring_seed``): one corpus scan builds the distinct
  ``(word, freq)`` working set (the BPE discipline — vocabulary-sized,
  not corpus-sized); every substring up to ``max_piece_len`` is
  counted with multiplicity weighted by word frequency; the vocab is
  ALL single characters plus the top multi-char substrings under a
  (count desc, piece asc) total order.
- **Scores** (``piece_scores``): piece log-probabilities
  ``ln(count / total)`` computed through the PORTABLE ln chain
  (``functions/portable_math`` — bit-identical across engines) and
  quantized to integer PICO log-units (BIGINT), so every downstream
  comparison and sum is exact integer arithmetic — the DSIR/PageRank
  fixed-point discipline applied to Viterbi DP.
- **Viterbi** (``viterbi_best``): per distinct word, the max-
  likelihood segmentation under the scored vocab as a pure JVM
  ``aggregate`` fold over character positions (O(L * max_piece_len)
  per word); ties prefer the SHORTEST piece (smallest k) — a total,
  engine-portable rule. A DuckDB oracle replays the same fold via
  ``list_reduce``.
- **EM** (``unigram_em_round`` / ``unigram_train``): hard-EM rounds —
  re-count pieces from the Viterbi segmentation, drop multi-char
  pieces below ``min_count`` (single chars are never dropped: every
  word must stay segmentable), re-score. Eager BY CONTRACT (the
  bpe_train/pagerank_tol precedent: round r+1's scores depend on
  round r's counts).

Scale shape: the corpus is scanned ONCE (word frequencies); every
round is vocab-bounded work — candidate substrings join the piece
table BROADCAST (a tokenizer vocab is ~10^4-10^5 rows, kilobytes to
megabytes), the DP is a narrow per-row fold, and counts are map-side-
combined aggregates. No UDF, no driver loop over rows, no corpus
re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import WORD_RE

#: pico log-units per natural-log unit: BIGINT scores, exact sums
PICO = 1_000_000_000_000


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan -> the distinct-word working set
    ``(word, freq, wlen)``; the induction loop never reads the corpus
    again (map-side-combined aggregate, output is vocabulary-sized)."""
    return (
        df.select(
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}),"
                    f" '{WORD_RE}', 0)"
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("wlen", F.length("word"))
    )


def substring_candidates(
    words: DataFrame, max_piece_len: int = 4
) -> DataFrame:
    """Every substring of length 1..max_piece_len of every distinct
    word, counted with multiplicity x word frequency — the unigram
    seed-candidate table. Pure JVM explode of a bounded per-word
    array (<= wlen * max_piece_len entries)."""
    # substr with dynamic pos/len needs the SQL form (F.substring
    # takes literal args)
    subs = F.expr(
        f"""flatten(transform(sequence(1, {int(max_piece_len)}),
          k -> filter(transform(sequence(1, wlen),
                 s -> case when s + k - 1 <= wlen
                      then substr(word, s, k) end),
               x -> x is not null)))"""
    )
    return (
        words.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )


def substring_seed(
    words: DataFrame,
    max_piece_len: int = 4,
    seed_size: int = 200,
) -> DataFrame:
    """The seed piece table ``(piece, cnt)``: ALL single characters
    (a word must always be segmentable) plus the top ``seed_size``
    multi-char substrings under the (cnt desc, piece asc) total
    order — deterministic at any parallelism (TakeOrdered shape, no
    full sort materializes)."""
    cands = substring_candidates(words, max_piece_len)
    chars = cands.filter(F.length("piece") == 1)
    multi = (
        cands.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(int(seed_size))
    )
    return chars.unionByName(multi)


def piece_scores(pieces: DataFrame) -> DataFrame:
    """Attach integer pico log-prob scores to a ``(piece, cnt)``
    table: ``score_p = round_half_up(ln(cnt / total) * 1e12)`` with
    the PORTABLE ln chain — bit-identical across engines, so Viterbi
    sums and comparisons downstream are exact BIGINT arithmetic.
    One 1-row total broadcast-joins the vocab frame (the pico-mass
    discipline)."""
    from ..functions.portable_math import apply_steps, ln_ratio_steps

    total = pieces.agg(
        F.sum("cnt").cast("long").alias("__tot")
    )
    joined = pieces.crossJoin(F.broadcast(total))
    stepped = apply_steps(
        joined, ln_ratio_steps("cnt", "__tot", "__ll", "spark")
    )
    return stepped.select(
        "piece",
        "cnt",
        F.expr(
            f"cast(floor(__ll * 1.0e12 + 0.5e0) as bigint)"
        ).alias("score_p"),
    )


#: scores below any real log-prob: pieces missing from the vocab (the
#: DP's "impossible" arm). Far above int64 overflow when summed over
#: any realistic word length.
SENTINEL_P = -(10 ** 15)


def dp_best_expr(dialect: str, max_piece_len: int, g: str = "g") -> str:
    """The Viterbi best-score DP as ONE fold expression, emitted per
    dialect from this single template (the portable_math discipline —
    two engines, one generator): ``best[i] = max over k<=min(i,K) of
    best[i-k] + score(piece ending at i with length k)``, all BIGINT
    pico arithmetic. Returns the full best array (index i+1 holds
    best[i]; index 1 is the 0 seed)."""
    K = int(max_piece_len)
    if dialect == "spark":
        return f"""aggregate(
  sequence(1, wlen),
  array(cast(0 as bigint)),
  (acc, x) -> concat(acc, array(
    array_max(transform(sequence(1, least(x, {K})),
      k -> element_at(acc, x - k + 1)
           + element_at({g}, (x - 1) * {K} + k))))))"""
    if dialect == "duckdb":
        return f"""list_reduce(
  list_prepend([0::BIGINT],
               list_transform(range(1, wlen + 1), i -> [i])),
  (acc, x) -> list_append(acc,
    list_max(list_transform(range(1, least(x[1], {K}) + 1),
      k -> acc[x[1] - k + 1] + {g}[(x[1] - 1) * {K} + k]))))"""
    raise ValueError(f"unknown dialect {dialect!r}")


def _kstar(dialect: str, max_piece_len: int, j: str, g: str, best: str) -> str:
    """The chosen piece length at end position ``j``: the SMALLEST k
    whose backstep reproduces best[j] (the DP's tie rule — total and
    engine-portable because the sums are exact integers)."""
    K = int(max_piece_len)
    if dialect == "spark":
        return (
            f"element_at(filter(sequence(1, least({j}, {K})), "
            f"k -> element_at({best}, {j} - k + 1) "
            f"+ element_at({g}, ({j} - 1) * {K} + k) "
            f"= element_at({best}, {j} + 1)), 1)"
        )
    return (
        f"list_filter(range(1, least({j}, {K}) + 1), "
        f"k -> {best}[{j} - k + 1] + {g}[({j} - 1) * {K} + k] "
        f"= {best}[{j} + 1])[1]"
    )


def dp_pieces_expr(
    dialect: str, max_piece_len: int, g: str = "g", best: str = "best"
) -> str:
    """Segmentation RECONSTRUCTION as a second fold: walk back from
    position wlen, at each step re-deriving the chosen k from the
    best array (same tie rule as the forward pass — backpointers
    never materialize), prepending the piece. Yields the piece list
    in order."""
    if dialect == "spark":
        ks = _kstar(dialect, max_piece_len, "acc.j", g, best)
        return f"""aggregate(
  sequence(1, wlen),
  named_struct('j', cast(wlen as int),
               'ps', cast(array() as array<string>)),
  (acc, x) -> CASE WHEN acc.j <= 0 THEN acc ELSE named_struct(
     'j', acc.j - {ks},
     'ps', concat(array(substr(word,
              cast(acc.j - {ks} + 1 as int), cast({ks} as int))),
           acc.ps)) END,
  acc -> acc.ps)"""
    if dialect == "duckdb":
        # Deliberately unsupported: DuckDB 1.0's vectorized
        # list_reduce MIXES ROWS' LANES when a fold's step depends on
        # accumulator-derived values that vary within a row (found
        # while building this oracle — two rows with different karr
        # strings return the same row's pieces; uniform steps are
        # fine). The oracle replays the walk as a RECURSIVE CTE
        # instead (queries._sql_unigram_ctes), which has no such
        # hazard. karr_str_expr stays the shared kstar carrier.
        raise ValueError(
            "dp_pieces_expr has no duckdb arm: DuckDB 1.0 list_reduce"
            " lane-mixing — replay the walk as a recursive CTE over"
            " karr_str_expr (see queries._sql_unigram_ctes)"
        )
    raise ValueError(f"unknown dialect {dialect!r}")


def karr_str_expr(dialect: str, max_piece_len: int, g: str = "g", best: str = "best") -> str:
    """Per-position chosen piece length as a DIGIT STRING (position j
    -> character j): the safe carrier for dp_pieces_expr's DuckDB
    walk (see the lane-mixing note there). ``list_transform`` with a
    position-derived index binds outer columns correctly, so kstar
    computes here, once per position, outside any fold."""
    if int(max_piece_len) > 9:
        raise ValueError("karr digit encoding needs max_piece_len <= 9")
    ks = _kstar(dialect, max_piece_len, "jj", g, best)
    if dialect == "duckdb":
        return (
            "array_to_string(list_transform(range(1, wlen + 1), "
            f"jj -> cast({ks} as varchar)), '')"
        )
    raise ValueError(f"unknown dialect {dialect!r}")


def viterbi_segment(
    words: DataFrame,
    scored: DataFrame,
    max_piece_len: int = 4,
) -> DataFrame:
    """Maximum-likelihood segmentation of every distinct word under a
    scored piece table: ``(word, freq, wlen, best_p, pieces)`` where
    ``best_p`` is the exact BIGINT pico log-likelihood and ``pieces``
    the argmax segmentation.

    Scale shape: the word explodes to its <= wlen * K (end, len)
    substring candidates — a NARROW (word, idx, piece) projection —
    which broadcast-join the vocab for scores and regroup into a
    positional score grid; both folds are then pure per-row JVM
    expressions. Cost O(wlen * K) per DISTINCT word; the corpus text
    is never touched."""
    K = int(max_piece_len)
    cands = words.select(
        "word",
        "freq",
        "wlen",
        F.expr(
            f"""explode(flatten(transform(sequence(1, wlen),
        i -> transform(sequence(1, {K}),
          k -> named_struct('idx', (i - 1) * {K} + k,
                'piece', case when k <= i
                         then substr(word, i - k + 1, k) end)))))"""
        ).alias("c"),
    ).select(
        "word",
        "freq",
        "wlen",
        F.col("c.idx").alias("idx"),
        F.col("c.piece").alias("piece"),
    )
    sc = scored.select(
        F.col("piece").alias("__vp"), F.col("score_p").alias("__vs")
    )
    grid = (
        cands.join(F.broadcast(sc), cands["piece"] == sc["__vp"], "left")
        .groupBy("word")
        .agg(
            F.first("freq").alias("freq"),
            F.first("wlen").alias("wlen"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("idx").alias("i"),
                        F.coalesce(F.col("__vs"), F.lit(SENTINEL_P))
                        .alias("s"),
                    )
                )
            ).alias("gs"),
        )
        .withColumn("g", F.expr("transform(gs, x -> x.s)"))
        .drop("gs")
    )
    out = grid.withColumn(
        "best", F.expr(dp_best_expr("spark", K))
    )
    return out.select(
        "word",
        "freq",
        "wlen",
        F.expr("element_at(best, cast(wlen + 1 as int))").alias(
            "best_p"
        ),
        F.expr(dp_pieces_expr("spark", K)).alias("pieces"),
    )


def unigram_em_round(
    words: DataFrame,
    scored: DataFrame,
    max_piece_len: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """One hard-EM round: Viterbi-segment the distinct-word table
    under the current scores, re-count pieces weighted by word
    frequency, DROP multi-char pieces under ``min_count`` (single
    chars always survive — every word must stay segmentable), and
    re-score. Returns the next ``(piece, cnt, score_p)`` table."""
    seg = viterbi_segment(words, scored, max_piece_len)
    counts = (
        seg.select(F.explode("pieces").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    kept = counts.filter(
        (F.length("piece") == 1) | (F.col("cnt") >= int(min_count))
    )
    # single chars the segmentation stopped using re-enter with a
    # floor count of 1: the vocab must keep EVERY character of the
    # working set or unseen text becomes unsegmentable (SentencePiece
    # keeps required chars for the same reason)
    chars = words.select(
        F.explode(
            F.expr("transform(sequence(1, wlen), i -> substr(word, i, 1))")
        ).alias("piece")
    ).distinct()
    floor = chars.join(kept, "piece", "left_anti").select(
        "piece", F.lit(1).cast("long").alias("cnt")
    )
    return piece_scores(kept.unionByName(floor))


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    n_rounds: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 200,
    min_count: int = 2,
) -> DataFrame:
    """End-to-end unigram-LM induction: corpus -> distinct-word
    working set (ONE scan) -> substring seed vocab -> ``n_rounds``
    hard-EM refinement rounds. Eager BY CONTRACT per round (the
    bpe_train precedent: round r+1's grid joins round r's scores);
    ``localCheckpoint`` truncates the per-round plan (the PageRank
    discipline) so the DP expression never re-derives prior rounds."""
    words = word_freqs(df, text_col).localCheckpoint(eager=True)
    scored = piece_scores(
        substring_seed(words, max_piece_len, seed_size)
    ).localCheckpoint(eager=True)
    for _ in range(int(n_rounds)):
        scored = unigram_em_round(
            words, scored, max_piece_len, min_count
        ).localCheckpoint(eager=True)
    return scored
