"""On-engine BPE merge learning (tokenizer induction).

Beyond the reference surface (north-star training-data pipeline): the
pipeline already APPLIES a BPE vocabulary (``functions/tokenize.py``:
``simple_bpe`` counting, ``simple_bpe_segmenter`` for sequence
packing), but inducing that vocabulary from the corpus itself is the
missing first step — Sennrich et al. 2016 (arXiv:1508.07909): start
from characters, repeatedly merge the most frequent adjacent symbol
pair. At 100 TB the induction input is the corpus, but the working
set after one scan is the WORD-FREQUENCY table (vocabulary-sized, not
corpus-sized) — exactly the shape Spark handles well:

- one corpus scan builds ``(word, freq)`` via a map-side-combined
  aggregate; payload text never moves again;
- each merge round is one vocab-bounded job: adjacent-pair counts
  (``zip_with`` over the split symbol sequence — a JVM lambda, no
  UDF), a map-side-combined ``sum(freq)`` per pair, and a
  ``TakeOrdered(1)`` for the winner;
- the winning merge applies as a JVM ``aggregate`` fold over each
  word's symbol list — EXACT left-to-right greedy BPE (the string-
  replace shortcut miscounts self-adjacent runs like ``a a a``, so we
  fold), then ``localCheckpoint`` truncates the per-round lineage
  (the PageRank discipline, linkgraph.py).

The loop is eager BY CONTRACT (pagerank_tol precedent): round r+1's
pair counts depend on round r's winner, so each round collects exactly
one row to the driver. Symbols stay in ``[a-z]`` plus the ``</w>``
end-of-word marker — ASCII, so Spark's and any oracle engine's string
ordering agree and the (count desc, pair asc) tie-break is total and
engine-portable. A DuckDB oracle replays every round bit-for-bit
(``list_reduce`` is the same fold).

The learned merges round-trip into ``functions/tokenize.simple_bpe``/
``simple_bpe_segmenter`` (same greedy-merge application), closing the
loop: induce on-engine, then denominate token budgets and sequence
packing in the induced vocabulary.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: pretokenizer: lowercased ASCII letter runs. Deliberately simple —
#: the induction machinery is the operator; swap the regex for a
#: byte-level pretokenizer without touching the loop.
WORD_RE = "[a-z]+"

_SAFE_SYMBOL = re.compile(r"^[a-z</>w]+$")


def _fold_expr(left: str, right: str) -> str:
    """Exact greedy left-to-right BPE merge application as a JVM
    ``aggregate`` fold over the space-split symbol sequence: merge
    when the accumulated string's LAST symbol equals ``left`` and the
    next symbol equals ``right`` (appending ``right`` with no space ==
    replacing the pair, since the accumulator already ends in
    ``left``). ``endswith(acc, ' left')`` cannot false-positive on a
    longer symbol — the space anchors a whole-symbol match."""
    return f"""aggregate(
      slice(split(seq, ' '), 2, size(split(seq, ' ')) - 1),
      element_at(split(seq, ' '), 1),
      (acc, x) -> CASE
        WHEN (acc = '{left}' OR endswith(acc, ' {left}')) AND x = '{right}'
        THEN acc || x ELSE acc || ' ' || x END
    )"""


def _word_seqs(df: DataFrame, text_col: str) -> DataFrame:
    """One corpus scan -> the vocabulary working set ``(seq, freq)``:
    per distinct word, its frequency and the initial symbol sequence
    (space-joined characters + the ``</w>`` end-of-word marker)."""
    words = (
        df.select(
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)"
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return words.select(
        F.concat(
            F.regexp_replace("w", "(.)", "$1 "), F.lit("</w>")
        ).alias("seq"),
        "freq",
    )


def bpe_apply(
    words: DataFrame, merges: "list[tuple[str, str]]"
) -> DataFrame:
    """Apply a ranked merge list to a ``(seq, freq)`` symbol frame as
    chained JVM folds — one ``aggregate`` expression per merge, in
    rank order. For BPE merge lists this equals the priority-queue
    application (merge k's operands are built only from merges < k,
    so applying 0..k-1 exhaustively first exposes every occurrence k
    can consume); the segmenter round-trip test pins the equivalence
    against ``functions/tokenize.simple_bpe_segmenter``. No UDF, no
    shuffle — a narrow projection per merge."""
    out = words
    for left, right in merges:
        if not (_SAFE_SYMBOL.match(left) and _SAFE_SYMBOL.match(right)):
            raise ValueError(f"unsafe merge symbols: {(left, right)}")
        out = out.select(
            F.expr(_fold_expr(left, right)).alias("seq"),
            *[c for c in words.columns if c != "seq"],
        )
    return out


def bpe_piece_stats(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Corpus piece-frequency table under an induced vocabulary: the
    apply side of ``bpe_train`` rolled up — segment every vocabulary
    word with the ranked merges, weight each piece by the word's
    corpus frequency, return the top ``top_k`` pieces
    ``(piece, n desc, piece asc)``. The induce->apply->account loop
    (token budgeting under the vocabulary you just learned) in two
    vocab-bounded jobs after the single corpus scan."""
    if top_k < 1:
        raise ValueError("bpe_piece_stats needs top_k >= 1")
    segmented = bpe_apply(_word_seqs(df, text_col), merges)
    return (
        segmented.select(
            F.explode(F.split("seq", " ")).alias("piece"), "freq"
        )
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("piece").asc())
        .limit(top_k)
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_count: int = 2,
    min_word_freq: int = 1,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    merge table ``(merge_rank int, lhs, rhs, merged, pair_count)`` —
    feed ``[(r.lhs, r.rhs) for r in out.collect()]`` straight into
    ``functions/tokenize.simple_bpe``/``simple_bpe_segmenter`` with
    ``end_of_word=True`` (the learned ranks are ``</w>``-aware).

    ``min_word_freq`` floors the vocabulary working set: at corpus
    scale the word-frequency table is dominated by a hapax tail
    (typos, ids, noise) that contributes ~nothing to any pair count
    but multiplies every round's cost — ``min_word_freq=2`` routinely
    shrinks the working set several-fold with near-identical merges.
    Default 1 keeps exact full-corpus semantics.

    Fails fast (ValueError) if a round's best pair falls under
    ``min_count`` — a silent short vocabulary would corrupt every
    downstream token accounting; reduce ``n_merges`` instead."""
    if n_merges < 1:
        raise ValueError("bpe_train needs n_merges >= 1")
    if min_word_freq < 1:
        raise ValueError("bpe_train needs min_word_freq >= 1")
    spark = df.sparkSession
    # corpus scanned exactly once
    work = _word_seqs(df, text_col)
    if min_word_freq > 1:
        work = work.where(F.col("freq") >= min_word_freq)
    work = work.localCheckpoint()

    rows: list[tuple] = []
    for r in range(n_merges):
        toks = F.split("seq", " ")
        pairs = work.select(
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("pair"),
            "freq",
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0].n < min_count:
            raise ValueError(
                f"bpe_train: round {r} has no pair with count >= "
                f"{min_count} — the corpus supports only {r} merges; "
                "reduce n_merges"
            )
        pair, n = top[0].pair, int(top[0].n)
        left, right = pair.split(" ")
        # symbols are [a-z] + '</w>' compositions by construction; the
        # assert keeps a future pretokenizer change from silently
        # injecting quote/backslash chars into the fold SQL literal
        assert _SAFE_SYMBOL.match(left) and _SAFE_SYMBOL.match(right), pair
        rows.append((r, left, right, left + right, n))
        work = work.select(
            F.expr(_fold_expr(left, right)).alias("seq"), "freq"
        ).localCheckpoint()

    return spark.createDataFrame(
        rows,
        "merge_rank int, lhs string, rhs string, merged string, "
        "pair_count bigint",
    )
