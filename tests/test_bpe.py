"""On-engine BPE merge learning (operators/bpe.py)."""

import pytest

from dbqt_spark.operators.bpe import bpe_train


def _ref_bpe(word_freqs: dict, n_merges: int):
    """Reference greedy BPE (Sennrich et al. 2016), pure Python."""
    seqs = {tuple(w) + ("</w>",): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for seq, f in seqs.items():
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        merges.append((l, r, l + r, n))
        out = {}
        for seq, f in seqs.items():
            new = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            out[tuple(new)] = out.get(tuple(new), 0) + f
        seqs = out
    return merges


def test_bpe_train_matches_reference_on_classic_corpus(spark):
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(text,)], "text string")
    got = [
        (r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_train(docs, n_merges=6).orderBy("merge_rank").collect()
    ]
    ref = _ref_bpe({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 6)
    assert got == ref


def test_bpe_train_self_adjacent_run_is_exact_greedy(spark):
    """'aaaaa' under merge (a,a): the fold must produce classic greedy
    [aa, aa, a] — NOT the string-replace shortcut's [aa, a, aa] — so
    round-2 pair counts include (aa,aa) with full weight."""
    docs = spark.createDataFrame([("aaaaa " * 4,)], "text string")
    got = [
        (r.lhs, r.rhs, r.pair_count)
        for r in bpe_train(docs, n_merges=2).orderBy("merge_rank").collect()
    ]
    ref = [(m[0], m[1], m[3]) for m in _ref_bpe({"aaaaa": 4}, 2)]
    assert got == ref
    assert got[0] == ("a", "a", 16)  # 4 adjacent pairs x freq 4
    # round 2 ties at 4 between (a,</w>), (aa,a), (aa,aa) — the
    # lexicographic tie-break picks (a,</w>); the string-replace
    # shortcut's [aa, a, aa] would instead see (a,aa) pairs here
    assert got[1] == ("a", "</w>", 4)


def test_bpe_train_merges_feed_simple_bpe_segmenter(spark):
    """The induced merge list round-trips into the apply side
    (functions/tokenize): segmenting a training word reproduces the
    trained symbol sequence."""
    from dbqt_spark.functions.tokenize import simple_bpe_segmenter

    text = " ".join(["newest"] * 6 + ["widest"] * 3 + ["low"] * 5)
    docs = spark.createDataFrame([(text,)], "text string")
    merges = [
        (r.lhs, r.rhs)
        for r in bpe_train(docs, n_merges=4).orderBy("merge_rank").collect()
    ]
    seg = simple_bpe_segmenter(merges, end_of_word=True)
    pieces = seg("newest")
    assert "".join(pieces) == "newest"  # marker stripped, lossless
    assert len(pieces) < len("newest")  # merges actually applied


def test_bpe_train_fails_fast_when_corpus_exhausted(spark):
    docs = spark.createDataFrame([("ab",)], "text string")
    # one word, freq 1: no pair ever reaches min_count=2
    with pytest.raises(ValueError, match="supports only 0 merges"):
        bpe_train(docs, n_merges=1)
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(docs, n_merges=0)


def test_bpe_train_tiebreak_is_lexicographic(spark):
    """Equal-count pairs: (count desc, pair asc) — 'ab' and 'cd' both
    appear twice; 'a b' < 'c d' so (a,b) must win round 1."""
    docs = spark.createDataFrame([("ab ab cd cd",)], "text string")
    first = (
        bpe_train(docs, n_merges=1).orderBy("merge_rank").collect()[0]
    )
    assert (first.lhs, first.rhs) == ("a", "b")


def test_bpe_apply_equals_segmenter_on_unseen_words(spark):
    """Chained rank-order folds == the priority-based greedy segmenter
    (functions/tokenize.simple_bpe_segmenter), including on words NOT
    in the training corpus."""
    from dbqt_spark.functions.tokenize import simple_bpe_segmenter
    from dbqt_spark.operators.bpe import _word_seqs, bpe_apply, bpe_train

    train = spark.createDataFrame(
        [(" ".join(["low"] * 5 + ["newest"] * 6 + ["widest"] * 3),)],
        "text string",
    )
    merges = [
        (r.lhs, r.rhs)
        for r in bpe_train(train, n_merges=5).orderBy("merge_rank").collect()
    ]
    # apply to a DIFFERENT corpus (slowest/lowest unseen at train time)
    apply_corpus = spark.createDataFrame(
        [("slowest lowest newest widest low",)], "text string"
    )
    segmented = {
        r.seq: None
        for r in bpe_apply(_word_seqs(apply_corpus, "text"), merges)
        .select("seq").collect()
    }
    # the learned ranks are marker-aware -> end_of_word=True; the fold
    # output keeps the marker, the segmenter strips it
    seg = simple_bpe_segmenter(merges, end_of_word=True)
    stripped = set()
    for s in segmented:
        pieces = s.split(" ")
        if pieces[-1] == "</w>":
            pieces = pieces[:-1]
        elif pieces[-1].endswith("</w>"):
            pieces[-1] = pieces[-1][:-4]
        stripped.add(" ".join(pieces))
    for word in ["slowest", "lowest", "newest", "widest", "low"]:
        assert " ".join(seg(word)) in stripped, word


def test_bpe_piece_stats_weighted_rollup(spark):
    from dbqt_spark.operators.bpe import bpe_piece_stats

    docs = spark.createDataFrame(
        [("ab ab ab ba",)], "text string"
    )
    out = {
        r.piece: r.n
        for r in bpe_piece_stats(docs, [("a", "b")], top_k=10).collect()
    }
    # 'ab' x3 segments to [ab, </w>]; 'ba' to [b, a, </w>]
    assert out == {"ab": 3, "</w>": 4, "a": 1, "b": 1}


def test_bpe_apply_rejects_unsafe_symbols(spark):
    from dbqt_spark.operators.bpe import _word_seqs, bpe_apply

    docs = spark.createDataFrame([("ab",)], "text string")
    import pytest

    with pytest.raises(ValueError, match="unsafe"):
        bpe_apply(_word_seqs(docs, "text"), [("a'", "b")])


def test_bpe_train_min_word_freq_floors_the_vocab(spark):
    """A hapax word ('zzq') is the only source of the (z,z) pair; with
    min_word_freq=2 it leaves the working set and the learned merges
    come from the frequent words alone."""
    docs = spark.createDataFrame(
        [("low low low low zzq",)], "text string"
    )
    with_hapax = [
        (r.lhs, r.rhs)
        for r in bpe_train(docs, n_merges=2).orderBy("merge_rank").collect()
    ]
    floored = [
        (r.lhs, r.rhs)
        for r in bpe_train(docs, n_merges=2, min_word_freq=2)
        .orderBy("merge_rank").collect()
    ]
    assert floored == [("l", "o"), ("lo", "w")]
    assert with_hapax == floored  # zzq never outweighs low anyway
    import pytest

    with pytest.raises(ValueError, match="min_word_freq"):
        bpe_train(docs, n_merges=1, min_word_freq=0)
