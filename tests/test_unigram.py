"""Unigram-LM tokenizer induction (operators/unigram): seed vocab,
portable pico scores, Viterbi fold + reconstruction, hard-EM loop."""

import pytest
from pyspark.sql import functions as F


def test_word_freqs_and_seed(spark):
    from dbqt_spark.operators.unigram import (
        substring_seed,
        word_freqs,
    )

    df = spark.createDataFrame(
        [(1, "aa ab aa"), (2, "AB! aa")], "id long, text string"
    )
    w = {r.word: r.freq for r in word_freqs(df).collect()}
    assert w == {"aa": 3, "ab": 2}

    seed = {
        r.piece: r.cnt
        for r in substring_seed(
            word_freqs(df), max_piece_len=2, seed_size=1
        ).collect()
    }
    # chars a (3*2 + 2), b (2); top-1 multi: 'aa' (3) beats 'ab' (2)
    assert seed == {"a": 8, "b": 2, "aa": 3}


def test_viterbi_known_segmentation(spark):
    """Hand-scored vocab: the DP must pick the higher-likelihood
    split, expose exact pico sums, and break ties on the shortest
    piece."""
    from dbqt_spark.operators.unigram import viterbi_segment

    words = spark.createDataFrame(
        [("dup", 2, 3), ("dd", 1, 2)], "word string, freq long, wlen int"
    )
    scored = spark.createDataFrame(
        [
            ("d", 5, -2_000_000),
            ("u", 5, -2_000_000),
            ("p", 5, -2_000_000),
            ("up", 9, -1_000_000),
            ("dd", 1, -4_000_000),
        ],
        "piece string, cnt long, score_p long",
    )
    out = {r.word: r for r in viterbi_segment(words, scored, 4).collect()}
    # 'd'+'up' = -3e6 beats 'd'+'u'+'p' = -6e6
    assert out["dup"].pieces == ["d", "up"]
    assert out["dup"].best_p == -3_000_000
    # 'dd' as one piece (-4e6) ties 'd'+'d' (-4e6): shortest-k rule
    # picks the single-char split
    assert out["dd"].pieces == ["d", "d"]
    assert out["dd"].best_p == -4_000_000


def test_viterbi_missing_piece_sentinel(spark):
    """A word containing a character absent from the vocab still
    segments (sentinel arm) and its best_p carries the sentinel."""
    from dbqt_spark.operators.unigram import (
        SENTINEL_P,
        viterbi_segment,
    )

    words = spark.createDataFrame(
        [("ax", 1, 2)], "word string, freq long, wlen int"
    )
    scored = spark.createDataFrame(
        [("a", 1, -1_000_000)], "piece string, cnt long, score_p long"
    )
    (r,) = viterbi_segment(words, scored, 2).collect()
    # one sentinel piece 'ax' (cost S) beats 'a'+'x' (cost -1e6 + S):
    # the DP minimizes sentinel exposure like any other score
    assert r.pieces == ["ax"]
    assert r.best_p == SENTINEL_P


def test_em_round_prunes_and_floors(spark):
    """EM re-counts from the segmentation, drops cold multi-char
    pieces, and re-enters unused single chars at the floor count."""
    from dbqt_spark.operators.unigram import (
        piece_scores,
        substring_seed,
        unigram_em_round,
        word_freqs,
    )

    df = spark.createDataFrame(
        [(1, "hello hello world")], "id long, text string"
    )
    words = word_freqs(df)
    p0 = piece_scores(substring_seed(words, 4, 20))
    p1 = unigram_em_round(words, p0, 4, min_count=2)
    rows = {r.piece: r.cnt for r in p1.collect()}
    # every character of the working set survives
    for ch in set("helloworld"):
        assert ch in rows, ch
    # multi-char pieces present are only those the segmentation used
    # at count >= 2
    assert all(
        len(p) == 1 or c >= 2 for p, c in rows.items()
    ), rows


def test_unigram_train_runs_and_shrinks(spark):
    from dbqt_spark.operators.unigram import unigram_train

    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        "id long, text string",
    )
    out = unigram_train(df, n_rounds=2, seed_size=15, min_count=2)
    rows = out.collect()
    assert {"score_p", "cnt", "piece"} <= {c for c in out.columns}
    # scores are negative pico log-probs, counts positive
    assert all(r.score_p < 0 and r.cnt >= 1 for r in rows)
    # the trained vocab is smaller than chars + seed
    assert len(rows) < 15 + 26


def test_dp_pieces_duckdb_arm_refused():
    from dbqt_spark.operators.unigram import (
        dp_pieces_expr,
        karr_str_expr,
    )

    with pytest.raises(ValueError, match="lane-mixing"):
        dp_pieces_expr("duckdb", 4)
    with pytest.raises(ValueError, match="max_piece_len"):
        karr_str_expr("duckdb", 12)


def test_unigram_segmenter_matches_engine(spark):
    """The driver-side segmenter (functions/tokenize.unigram_segmenter)
    reproduces the engine Viterbi fold piece-for-piece on the trained
    vocab — one DP contract, two execution sites."""
    from dbqt_spark.functions.tokenize import unigram_segmenter
    from dbqt_spark.operators.unigram import (
        unigram_train,
        viterbi_segment,
        word_freqs,
    )

    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        "id long, text string",
    )
    final = unigram_train(df, n_rounds=1, seed_size=12, min_count=2)
    scores = {r.piece: r.score_p for r in final.collect()}
    words = word_freqs(df)
    engine = {
        r.word: list(r.pieces)
        for r in viterbi_segment(words, final, 4).collect()
    }
    seg = unigram_segmenter(scores, max_piece_len=4)
    for w, pieces in engine.items():
        assert seg(w) == pieces, w
    # whitespace attachment + lossless concatenation over full text
    text = "low  newest\tlower"
    pieces = seg(text)
    assert "".join(pieces) == text
    # plugs into a tokenizer seat
    from dbqt_spark.operators.textstats import token_stats

    out = token_stats(df, id_col="id", tokenizer=seg).collect()
    assert all(r.n_tokens > 0 for r in out)
