"""Sequence packing — map a corpus onto fixed-length training sequences.

Beyond the reference surface (north star). GPT-style pretraining packs
the corpus by CONCATENATING every document (plus a separator token) in
a canonical order and chunking the token stream into fixed-length
sequences; a document's placement is then a pure function of the global
token offsets. This operator computes that placement — per doc: its
global token start, the first/last sequence it lands in, and its offset
inside the first — which is what a loader needs to materialize batches
and what an auditor needs to answer "which sequences contain doc X".

Deterministic by construction: the order is ``id_col`` ascending and
token counts are the engine-portable whitespace tokenization shared
with ``textstats.token_stats`` — any engine reproduces the packing
bit-for-bit (the DuckDB oracle does).

Scale shape — the global prefix sum is the whole problem: a single
``Window.orderBy`` with no partition key funnels the corpus through ONE
reducer, the classic Spark scaling failure. This implements the
standard two-phase distributed prefix sum instead:

1. bucket the ids into ``n_buckets`` ORDER-CONTIGUOUS ranges (split
   points from one bounded-memory ``approx_percentile`` aggregate over
   the ids — a scalar job, folded back as plan literals; split-point
   wobble only moves rows between buckets, never changes values);
2. per-bucket running sums under ``Window.partitionBy(bucket)
   .orderBy(id)`` — parallel across buckets;
3. per-bucket totals (one ``n_buckets``-row aggregate, collected) turn
   into base offsets added back as one dense array literal indexed by
   bucket id — no second shuffle over the data.

Rows shuffle ONCE (hash by bucket for the windows); the driver only
ever sees ``n_buckets`` numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens_col


def sequence_pack(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep_tokens: int = 1,
    n_buckets: int = 64,
    tokenizer=None,
) -> DataFrame:
    """Per-doc placement in the packed token stream:
    (id, n_tokens, global_start, first_seq, last_seq, seq_offset).

    ``n_tokens`` counts whitespace tokens (``textstats.tokens_col``);
    each doc is followed by ``sep_tokens`` separator tokens (the EOS
    convention), which belong to the doc's span for boundary purposes.
    ``first_seq``/``last_seq`` are the sequence ids of the doc's first
    and last OWN token (separators excluded from last_seq so an
    empty-tail separator never claims a sequence the doc has no token
    in); ``seq_offset`` is the doc's position inside ``first_seq``.
    Empty docs (0 tokens) occupy no sequence: first_seq/last_seq are
    NULL, but their separators still advance the stream — exactly what
    concat-then-chunk does to an empty file.

    ``n_buckets`` is the parallelism knob: each bucket's running sum is
    one task, so size it to corpus_rows / rows-per-task (the default 64
    suits the test scale; a 100 TB corpus wants thousands — safe now
    that bucket/base lookups are flat array literals, not an
    n_buckets-deep CASE chain that would break codegen at that depth).
    Values are provably invariant to the choice
    (test_sequence_pack_bucketing_invariant)."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    from ..functions.tokenize import resolve_token_counter

    # tokenizer= swaps the whitespace count for real (BPE) tokens — the
    # denomination training actually packs in; offsets/sequence ids stay
    # a pure function of the counts, so the whole two-phase prefix-sum
    # machinery is tokenizer-agnostic.
    counter = resolve_token_counter(tokenizer)
    n_tokens_col = (
        counter(F.col(text_col))
        if counter is not None
        else F.size(tokens_col(F.col(text_col)))
    )
    counted = df.select(
        F.col(id_col), n_tokens_col.cast("long").alias("n_tokens")
    )

    # phase 1: order-contiguous buckets from APPROX id percentiles (one
    # bounded-memory aggregate — exact percentile would buffer every id
    # in one aggregator, the very single-reducer trap this operator
    # exists to avoid). Split-point wobble only moves rows between
    # buckets, i.e. changes PARALLELISM, never the result (pinned by
    # test_sequence_pack_bucketing_invariant across 1/4/64 buckets).
    if n_buckets > 1:
        splits_row = counted.agg(
            F.percentile_approx(
                F.col(id_col),
                F.lit([i / n_buckets for i in range(1, n_buckets)]),
                F.lit(10_000),
            ).alias("s")
        ).collect()[0]["s"]
        splits = sorted(float(s) for s in (splits_row or []))
    else:
        splits = []
    if splits:
        # bucket id = number of split points below the id, computed by
        # ONE lambda over ONE broadcast array literal. The expression
        # TREE is constant-size (no n_buckets-deep chained CASE — at
        # the "thousands of buckets" a 100 TB corpus wants, a chain
        # that deep breaks codegen); the per-row cost is a linear
        # JVM-side scan of the sorted array, negligible next to the
        # tokenize. (Spark has no binary-search builtin; the scan is
        # the flat-plan equivalent.)
        bucket = F.aggregate(
            F.lit(splits),
            F.lit(0),
            lambda acc, s: acc
            + F.when(F.col(id_col).cast("double") > s, 1).otherwise(0),
        )
    else:
        bucket = F.lit(0)
    bucketed = counted.withColumn("__b", bucket)

    # phase 2: per-bucket running sums (parallel windows)
    w = Window.partitionBy("__b").orderBy(id_col)
    stepped = bucketed.withColumn(
        "__step", F.col("n_tokens") + F.lit(int(sep_tokens))
    ).withColumn(
        "__local_end", F.sum("__step").over(w)
    )

    # phase 3: bucket base offsets — an n_buckets-row aggregate whose
    # running total folds back as ONE dense array literal indexed by
    # bucket id (O(1) element_at per row, constant-size expression
    # tree; empty buckets contribute zero). Driver sees n_buckets rows.
    totals = {
        r["__b"]: r["__t"]
        for r in stepped.groupBy("__b")
        .agg(F.sum("__step").alias("__t"))
        .collect()
    }
    bases: list[int] = []
    base = 0
    for b in range(len(splits) + 1):
        bases.append(base)
        base += int(totals.get(b, 0))
    base_col = F.element_at(
        F.lit(bases), (F.col("__b") + 1).cast("int")
    ).cast("long")

    L = int(seq_len)
    start = (base_col + F.col("__local_end") - F.col("__step")).alias(
        "global_start"
    )
    out = stepped.select(
        F.col(id_col),
        "n_tokens",
        start,
    )
    has_tokens = F.col("n_tokens") > 0
    # integer `div`, not double `/`: double division loses exactness
    # past 2^53 token offsets (a ~20T-token corpus is within reach of
    # that at 100 TB scale)
    return out.select(
        id_col,
        "n_tokens",
        "global_start",
        F.when(has_tokens, F.expr(f"global_start div {L}")).alias(
            "first_seq"
        ),
        F.when(
            has_tokens,
            F.expr(f"(global_start + n_tokens - 1) div {L}"),
        ).alias("last_seq"),
        F.when(has_tokens, F.col("global_start") % F.lit(L)).alias(
            "seq_offset"
        ),
    )


def packed_sequences(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep_token: str = "<|eos|>",
    sep_tokens: int = 1,
    n_buckets: int = 64,
    tokenizer=None,
) -> DataFrame:
    """MATERIALIZE the packed training sequences ``sequence_pack``
    places: concatenate every doc's tokens (plus ``sep_tokens`` copies
    of ``sep_token``) in ``id_col`` order and chunk the stream into
    ``seq_len``-token rows — the loader side of GPT-style packing, as
    a DataFrame program instead of a driver loop. Output: (seq_id,
    text, n_tokens); the final partial sequence is included with its
    true length.

    ``tokenizer=`` swaps the whitespace denomination for real (BPE)
    token PIECES — the same hook ``sequence_pack`` has, resolved
    through ``functions.tokenize.resolve_token_segmenter`` (so "hf:"
    specs and segmenter callables ``text -> list[str]`` work; a
    callable passed here must be a SEGMENTER — e.g.
    ``simple_bpe_segmenter(merges)`` — because materialization needs
    the pieces, and placement then counts ``len(pieces)``, keeping
    the two sides in the same denomination by construction). BPE
    pieces carry their preceding separator (the segmenter contract),
    so sequences join with '' — slicing the stream reproduces exactly
    the text those tokens decode to; the whitespace default keeps the
    ' ' join (oracle unchanged).

    Scale shape: placement comes from ``sequence_pack`` (two-phase
    distributed prefix sum — rows shuffle once); each doc then
    EXPLODES to only the sequences its span intersects (a doc touches
    ceil(span/seq_len)+1 sequences, not the stream), contributes the
    token slice that falls inside each, and one groupBy(seq_id)
    assembles pieces with an order-deterministic
    array_sort(collect_list(struct(start, piece))) — the per-sequence
    state is bounded by seq_len tokens, never a corpus axis. No
    global window anywhere."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    from ..functions.tokenize import resolve_token_segmenter

    segmenter = resolve_token_segmenter(tokenizer)
    placed = sequence_pack(
        df, seq_len, text_col=text_col, id_col=id_col,
        sep_tokens=sep_tokens, n_buckets=n_buckets,
        tokenizer=tokenizer,
    ).select(id_col, "n_tokens", "global_start")
    doc_toks = (
        tokens_col(F.coalesce(F.col(text_col), F.lit("")))
        if segmenter is None
        else segmenter(F.coalesce(F.col(text_col), F.lit("")))
    )
    join_sep = " " if segmenter is None else ""
    toks_plus = F.concat(
        doc_toks,
        F.array_repeat(F.lit(sep_token), sep_tokens),
    )
    base = df.select(F.col(id_col), toks_plus.alias("__tp")).join(
        placed, id_col
    )
    span = F.col("n_tokens") + F.lit(int(sep_tokens))
    # integer `div` (the module's 2^53 rule — double division loses
    # exactness at ~20T-token offsets)
    L = int(seq_len)
    first_seq = F.expr(f"global_start div {L}")
    last_seq = F.expr(
        f"(global_start + n_tokens + {int(sep_tokens)} - 1) div {L}"
    )
    exploded = (
        base.withColumn("__span", span)
        # span-0 rows (empty doc, sep_tokens=0) occupy no sequence —
        # and would otherwise make F.sequence(first, last) run
        # BACKWARDS (first > last emits a descending range)
        .filter(F.col("__span") > 0)
        .select(
            F.col(id_col),
            "__tp",
            "global_start",
            "__span",
            F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
        )
    )
    seg_start = F.greatest(
        F.col("global_start"), F.col("seq_id") * F.lit(L)
    )
    seg_end = F.least(
        F.col("global_start") + F.col("__span"),
        (F.col("seq_id") + 1) * F.lit(L),
    )
    piece = F.slice(
        "__tp",
        (seg_start - F.col("global_start") + 1).cast("int"),
        (seg_end - seg_start).cast("int"),
    )
    return (
        exploded.select(
            "seq_id",
            F.struct(
                F.col("global_start").alias("s"), piece.alias("p")
            ).alias("__sp"),
        )
        .groupBy("seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list("__sp")),
                    lambda x: x["p"],
                )
            ).alias("__toks")
        )
        .select(
            F.col("seq_id").cast("long").alias("seq_id"),
            F.array_join("__toks", join_sep).alias(text_col),
            F.size("__toks").cast("long").alias("n_tokens"),
        )
    )


def packing_efficiency(
    df: DataFrame,
    seq_lens: "list[int]",
    text_col: str = "text",
    id_col: str = "doc_id",
    sep_tokens: int = 1,
    n_buckets: int = 64,
    tokenizer=None,
) -> DataFrame:
    """Packing-efficiency report — the seq_len SELECTION tool next to
    ``sequence_pack``: for each candidate length, what the packed
    corpus would look like. Per ``seq_lens`` entry:

    - ``n_sequences``: ceil(stream / L) training rows;
    - ``fill_rate``: stream / (n_sequences * L) — 1 minus the padding
      waste of the final partial sequence (packed training pads
      nothing else);
    - ``n_split_docs`` / ``split_frac``: documents whose OWN tokens
      cross a sequence boundary — the attention-fragmentation cost a
      longer L amortizes (the fill/fragmentation trade this report
      exists to expose).

    One corpus scan: placement comes from ``sequence_pack``'s
    two-phase prefix sum ONCE (global_start is L-independent), then
    every candidate L is a handful of integer aggregate expressions
    over that frame — integer ``div`` arithmetic end-to-end (the
    module's 2^53 rule), ratios rounded to 6, engine-exact."""
    if not seq_lens or any(int(L) < 1 for L in seq_lens):
        raise ValueError(f"seq_lens must be positive, got {seq_lens}")
    placed = sequence_pack(
        df, seq_len=max(int(L) for L in seq_lens), text_col=text_col,
        id_col=id_col, sep_tokens=sep_tokens, n_buckets=n_buckets,
        tokenizer=tokenizer,
    ).select("n_tokens", "global_start")
    aggs = [
        F.sum(F.col("n_tokens") + F.lit(int(sep_tokens))).alias("__stream"),
        F.count(F.when(F.col("n_tokens") > 0, 1)).alias("__nonempty"),
    ]
    for L in seq_lens:
        L = int(L)
        split = (F.col("n_tokens") > 0) & (
            F.expr(f"global_start div {L}")
            != F.expr(f"(global_start + n_tokens - 1) div {L}")
        )
        aggs.append(
            F.count(F.when(split, 1)).alias(f"__split_{L}")
        )
    from .textstats import _ratio6_wide_expr

    row = placed.agg(*aggs)
    parts = []
    for L in seq_lens:
        L = int(L)
        nseq = F.expr(f"(__stream + {L} - 1) div {L}")
        # ratios via the wide integer micro-unit rounding: double
        # round() diverges across engines on .5e-6 quotient
        # boundaries, and a 100 TB stream's token total outgrows the
        # int64 micro-unit trick
        parts.append(
            row.select(
                F.lit(L).cast("long").alias("seq_len"),
                nseq.cast("long").alias("n_sequences"),
                F.col("__stream").alias("__num"),
                (nseq * F.lit(L)).cast("long").alias("__den"),
                F.col(f"__split_{L}").cast("long").alias("n_split_docs"),
                F.col("__nonempty").alias("__ne"),
            ).select(
                "seq_len",
                "n_sequences",
                _ratio6_wide_expr("__num", "__den").alias("fill_rate"),
                "n_split_docs",
                F.when(
                    F.col("__ne") > 0,
                    _ratio6_wide_expr("n_split_docs", "__ne"),
                )
                .otherwise(0.0)
                .alias("split_frac"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("seq_len")
