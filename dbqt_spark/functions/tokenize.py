"""Pluggable tokenizer hook for token accounting.

``token_stats``, ``token_budget_sample``, and ``sequence_pack`` count
whitespace tokens by default — engine-portable (any SQL engine
reproduces the numbers, which is what keeps their DuckDB oracles
bit-for-bit) and pure JVM. But training budgets and sequence packing
are denominated in REAL tokenizer tokens (BPE), so each of those
operators takes an optional ``tokenizer=`` that swaps the counting
column while leaving the whitespace arm untouched.

Resolution (mirrors ``operators/multimodal.resolve_decoder``'s
optional-import + fail-fast-on-the-driver pattern):

- ``None`` / ``"whitespace"``  -> the JVM whitespace expression
  (default; zero behavior change, all oracles unchanged);
- a Python callable ``text -> int`` (count) or ``text -> list``
  (encode; its length is counted) -> wrapped in ONE Arrow-batched
  ``pandas_udf`` — never a row-at-a-time Python UDF;
- ``"hf:<name>"`` -> a HuggingFace ``tokenizers``/``transformers``
  fast tokenizer if importable, else ``NotImplementedError`` raised on
  the driver before any job runs;
- ``simple_bpe(merges)`` -> a tiny self-contained greedy-merge BPE
  (deterministic, dependency-free) for tests and air-gapped runs.

Scale note: a real BPE pass is ~10-100x the cost of the whitespace
count, but it is embarrassingly parallel (one Arrow batch map, no
shuffle) and each operator applies it exactly once per doc in the same
single corpus scan the whitespace arm uses — the plan shape does not
change, only the per-row kernel.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


#: Sennrich end-of-word marker — the symbol ``operators/bpe.bpe_train``
#: appends to every word before learning merges.
EOW = "</w>"


def simple_bpe(
    merges: list[tuple[str, str]], end_of_word: bool = False
) -> Callable[[str], int]:
    """A minimal, dependency-free BPE token counter: whitespace
    pretokenize, split each word into characters, then greedily apply
    the LOWEST-RANK merge from ``merges`` until none applies (the core
    of Sennrich et al. 2016 / GPT-2's encoder, minus byte-mapping and
    regex pretokenization). Deterministic for a fixed merge list —
    suitable as a test vocabulary and as the documented shape a real
    tokenizer hook must have (``text -> int``).

    ``end_of_word=True`` appends the ``</w>`` marker before merging
    (and strips it from the count) — REQUIRED for merge lists learned
    by ``operators/bpe.bpe_train``, whose ranks are marker-aware; the
    default stays marker-less so existing vocabularies and every
    oracle are unchanged."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def _count(text: str) -> int:
        return sum(
            len(_bpe_parts(w, ranks, end_of_word))
            for w in (text or "").split()
        )

    return _count


def _counter_udf(fn: Callable) -> Callable[[Column], Column]:
    """Wrap a per-text counting/encoding callable into an Arrow-batched
    pandas_udf producing a bigint column. ``fn`` may return an int
    (count) or a sequence (its length is used)."""

    def _normalize(text: str) -> int:
        out = fn(text)
        try:
            return len(out)  # encode-style: a sequence of token ids
        except TypeError:
            return int(out)  # count-style: int / numpy integer

    @F.pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        return s.fillna("").map(_normalize).astype("int64")

    return lambda col: _count(col)


def resolve_token_counter(
    tokenizer: str | Callable | None,
) -> Callable[[Column], Column] | None:
    """Resolve a ``tokenizer=`` spec to a Column->Column token-count
    factory, or ``None`` for the default JVM whitespace arm. Raises on
    the DRIVER (before any job) when a requested backend is missing —
    the ``multimodal.resolve_decoder`` contract."""
    if tokenizer is None or tokenizer == "whitespace":
        return None
    if callable(tokenizer):
        return _counter_udf(tokenizer)
    if isinstance(tokenizer, str) and tokenizer.startswith("hf:"):
        name = tokenizer[3:]
        try:
            from tokenizers import Tokenizer  # type: ignore
        except ImportError as exc:
            raise NotImplementedError(
                f"tokenizer={tokenizer!r} needs the 'tokenizers' package; "
                "install it, or pass a callable (e.g. "
                "functions.tokenize.simple_bpe(merges))"
            ) from exc
        tok = Tokenizer.from_pretrained(name)

        def _hf_count(text: str) -> int:
            return len(tok.encode(text or "").ids)

        return _counter_udf(_hf_count)
    raise ValueError(
        f"unrecognized tokenizer spec {tokenizer!r}: use None, "
        "'whitespace', 'hf:<name>', or a callable text -> int/sequence"
    )


def _bpe_parts(
    word: str,
    ranks: "dict[tuple[str, str], int]",
    end_of_word: bool = False,
) -> list[str]:
    """Greedy lowest-rank merges of a word's characters — the shared
    kernel of ``simple_bpe`` (counts) and ``simple_bpe_segmenter``
    (pieces). With ``end_of_word`` the ``</w>`` marker participates in
    merging (Sennrich semantics, what ``bpe_train`` ranks assume) and
    is stripped from the returned pieces afterwards so the lossless-
    concatenation contract holds either way."""
    parts = list(word) + ([EOW] if end_of_word else [])
    while len(parts) > 1:
        best, best_rank = None, None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        parts[best: best + 2] = [parts[best] + parts[best + 1]]
    if end_of_word:
        if parts[-1] == EOW:
            parts.pop()
        elif parts[-1].endswith(EOW):
            parts[-1] = parts[-1][: -len(EOW)]
    return parts


def simple_bpe_segmenter(
    merges: list[tuple[str, str]], end_of_word: bool = False
) -> Callable[[str], list[str]]:
    """The SEGMENTER twin of ``simple_bpe``: ``text -> list of string
    pieces`` under the lossless-concatenation contract
    (``resolve_token_segmenter``) — each word's leading whitespace is
    attached to its first piece (the GPT-2 convention), so
    ``"".join(pieces) == text`` up to trailing whitespace, and
    ``len(pieces)`` equals ``simple_bpe(merges)(text)``.
    ``end_of_word`` as in ``simple_bpe`` — set it when the merges come
    from ``operators/bpe.bpe_train``."""
    import re

    ranks = {pair: i for i, pair in enumerate(merges)}

    def _segment(text: str) -> list[str]:
        out: list[str] = []
        for m in re.finditer(r"(\s*)(\S+)", text or ""):
            ws, word = m.group(1), m.group(2)
            parts = _bpe_parts(word, ranks, end_of_word)
            parts[0] = ws + parts[0]
            out += parts
        return out

    return _segment


def _segmenter_udf(fn: Callable) -> Callable[[Column], Column]:
    """Wrap a per-text segmenter (``text -> list[str]`` pieces) into an
    Arrow-batched pandas_udf producing ``array<string>``."""

    @F.pandas_udf("array<string>")
    def _seg(s: pd.Series) -> pd.Series:
        return s.fillna("").map(lambda t: list(fn(t)))

    return lambda col: _seg(col)


def resolve_token_segmenter(
    tokenizer: str | Callable | None,
) -> Callable[[Column], Column] | None:
    """Resolve a ``tokenizer=`` spec to a Column->Column SEGMENTER
    factory (``array<string>`` of token pieces), or ``None`` for the
    default whitespace arm. Same resolution rules and driver-side
    fail-fast as ``resolve_token_counter``, but for operators that
    need token BOUNDARIES, not just counts (``chunk_documents``):
    chunks must start and end on real token indices, which whitespace
    windows cannot guarantee under a BPE budget.

    Piece contract (encode-slice-decode without a decode round-trip):
    the segmenter returns string pieces whose CONCATENATION reproduces
    the input text up to trailing whitespace — each token carries its
    preceding separator (the GPT-2 space-attachment convention), so
    slicing a window of pieces and joining with '' yields exactly the
    text that window of tokens decodes to. The ``hf:`` arm derives
    pieces from the fast tokenizer's char offsets (piece i spans from
    the previous token's end through token i's end, so skipped
    whitespace rides with the following token)."""
    if tokenizer is None or tokenizer == "whitespace":
        return None
    if callable(tokenizer):
        # DRIVER-side probe (the module's fail-fast contract): a
        # COUNT-style callable (``simple_bpe``) works in the counter
        # seats but would die executor-side here with an opaque
        # "'int' object is not iterable" Py4J traceback — refuse it
        # with the fix in the message before any job launches
        probe = tokenizer("a b")
        if not (
            isinstance(probe, (list, tuple))
            and all(isinstance(p, str) for p in probe)
        ):
            raise ValueError(
                "this operator needs a SEGMENTER callable "
                "(text -> list[str] pieces, e.g. "
                "simple_bpe_segmenter(merges)); got one returning "
                f"{type(probe).__name__} — a count-style tokenizer "
                "(simple_bpe) only fits count seats (token_stats, "
                "sequence_pack)"
            )
        return _segmenter_udf(tokenizer)
    if isinstance(tokenizer, str) and tokenizer.startswith("hf:"):
        name = tokenizer[3:]
        try:
            from tokenizers import Tokenizer  # type: ignore
        except ImportError as exc:
            raise NotImplementedError(
                f"tokenizer={tokenizer!r} needs the 'tokenizers' package; "
                "install it, or pass a callable text -> list[str] (e.g. "
                "functions.tokenize.simple_bpe_segmenter(merges))"
            ) from exc
        tok = Tokenizer.from_pretrained(name)

        def _hf_segment(text: str) -> list[str]:
            text = text or ""
            enc = tok.encode(text)
            pieces, prev = [], 0
            for _, end in enc.offsets:
                pieces.append(text[prev:end])
                prev = end
            return pieces

        return _segmenter_udf(_hf_segment)
    raise ValueError(
        f"unrecognized tokenizer spec {tokenizer!r}: use None, "
        "'whitespace', 'hf:<name>', or a callable text -> list[str]"
    )


def _uni_parts(
    word: str,
    scores: "dict[str, int]",
    max_piece_len: int,
    sentinel: int,
) -> list[str]:
    """Viterbi max-likelihood split of one word under integer pico
    piece scores — the driver-side twin of
    ``operators/unigram.viterbi_segment``'s JVM folds: same DP, same
    shortest-piece tie rule, same sentinel for out-of-vocab
    substrings, so engine and driver segmentation agree exactly."""
    L = len(word)
    K = max_piece_len
    best: list[int] = [0] + [0] * L
    for i in range(1, L + 1):
        b = None
        for k in range(1, min(K, i) + 1):
            s = best[i - k] + scores.get(word[i - k:i], sentinel)
            if b is None or s > b:  # strict >: smallest k wins ties
                b = s
        best[i] = b  # type: ignore[assignment]
    pieces: list[str] = []
    j = L
    while j > 0:
        for k in range(1, min(K, j) + 1):
            if (
                best[j - k] + scores.get(word[j - k:j], sentinel)
                == best[j]
            ):
                pieces.insert(0, word[j - k:j])
                j -= k
                break
    return pieces


def unigram_segmenter(
    scores: "dict[str, int]", max_piece_len: int = 4
) -> Callable[[str], list[str]]:
    """Segmenter under a unigram-LM piece table (``operators/unigram.
    unigram_train`` output collected to ``{piece: score_p}``) — the
    unigram sibling of ``simple_bpe_segmenter``, pluggable into every
    ``tokenizer=`` seat (token_stats, sequence_pack, packed_sequences,
    chunk_documents). Same lossless-concatenation contract: each
    word's leading whitespace attaches to its first piece. Substrings
    missing from the table (uppercase, digits, punctuation if the
    table was trained on [a-z]+ words) fall to the sentinel arm and
    group into maximal-length unknown pieces — deterministic, never
    dropped."""
    import re

    from ..operators.unigram import SENTINEL_P

    sc = {str(k): int(v) for k, v in scores.items()}
    K = int(max_piece_len)

    def _segment(text: str) -> list[str]:
        out: list[str] = []
        for m in re.finditer(r"(\s*)(\S+)", text or ""):
            ws, word = m.group(1), m.group(2)
            parts = _uni_parts(word, sc, K, SENTINEL_P)
            parts[0] = ws + parts[0]
            out += parts
        return out

    return _segment
