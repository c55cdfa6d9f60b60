"""Document chunking — fixed-size overlapping windows for embedding/RAG.

Beyond the reference surface (north star). Retrieval pipelines embed
CHUNKS, not documents: every doc is split into ``chunk_tokens``-token
windows advancing by ``chunk_tokens - overlap`` so context survives
the cut points. The chunk table (doc_id, chunk_id, text, start_token,
n_tokens) is the unit that flows into the embedding model and the ANN
index (``operators/similarity.py``), and the (doc_id, start_token)
provenance is what lets retrieval answers cite the source span.

Scale shape: ONE narrow projection — tokenize once per doc, explode
the (small) start-offset list, slice per chunk. No shuffle, no UDF;
the per-chunk ``slice``/``array_join`` run interpreted (higher-order
functions), but per CHUNK, not per token — the same trade
``shingles_col`` documents. Deterministic: chunk boundaries are a pure
function of the token count, so re-runs and engines agree (the DuckDB
oracle slices the same windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer=None,
) -> DataFrame:
    """Split each doc into overlapping token windows: chunk c covers
    tokens [c*stride, c*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the final chunk is the (possibly
    shorter) remainder, and no chunk STARTS inside the previous
    chunk's tail beyond the overlap (starts past n_tokens never
    emit). Zero-token/NULL docs produce no chunks. Returns
    (id, chunk_id, chunk text, start_token, n_tokens).

    ``tokenizer`` (``functions.tokenize.resolve_token_segmenter``
    rules) makes boundaries fall on REAL tokenizer tokens: RAG /
    embedding budgets are BPE-denominated, and a whitespace window can
    overshoot a model's context by 2-3x on code or CJK text. The
    default stays the whitespace arm (pure JVM, oracle bit-for-bit);
    a segmenter swaps ``__toks`` for an Arrow-batched piece array —
    pieces carry their separators (lossless concatenation), so a
    sliced window joined with '' is exactly the text those tokens
    decode to. Same plan shape either way: tokenize once, explode the
    start offsets, slice per chunk."""
    from ..functions.tokenize import resolve_token_segmenter

    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    seg = resolve_token_segmenter(tokenizer)
    if seg is None:
        toks = F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
            lambda t: t != "",
        )
        joiner = " "
    else:
        toks = seg(F.coalesce(F.col(text_col), F.lit("")))
        joiner = ""
    n = F.size(toks)
    # start offsets 0, stride, 2*stride, ...; the last chunk is the
    # first one whose window reaches n, so no chunk is ever fully
    # contained in its predecessor's coverage (a trailing start inside
    # the final window would re-emit already-covered tokens)
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= chunk_tokens, F.lit(1))
        .otherwise(
            F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)) + 1
        )
    )
    base = df.select(
        F.col(id_col), toks.alias("__toks"), n_chunks.alias("__nc")
    )
    return (
        base.filter(F.col("__nc") > 0)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("__nc") - 1),
                    lambda c: c * stride,
                )
            ).alias("chunk_id", "__start"),
            F.col("__toks"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(
                F.slice(
                    "__toks", F.col("__start") + 1, F.lit(chunk_tokens)
                ),
                joiner,
            ).alias(text_col),
            F.col("__start").cast("long").alias("start_token"),
            F.least(
                F.lit(chunk_tokens), F.size("__toks") - F.col("__start")
            ).cast("long").alias("n_tokens"),
        )
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-dimension int8 scalar quantization of an embedding column —
    the standard 4x storage cut (float32 -> uint8 codes) applied before
    ANN indexing at corpus scale (faiss SQ8 / Milvus SQ8 shape):
    code = round((x - min_d) / (max_d - min_d) * 255), with the
    per-dimension min/max taken over the corpus. Returns (id, qvec:
    array<int> codes 0..255, plus the reconstruction error of THIS
    row as max |x - dequant(x)| rounded to 6) — the error column makes
    the quantization auditable row-by-row instead of trusting a global
    summary.

    Scale shape: one posexplode + (dim)-keyed partial-aggregated
    min/max (dim rows to the driver — bytes), folded back as two array
    literals; the quantize itself is a narrow indexed-lambda transform,
    no shuffle, no UDF. Deterministic: min/max over floats are exact
    (no summation), the affine map is the same IEEE expression in any
    engine, and round is HALF_UP both sides — the DuckDB oracle
    reproduces every code bit-for-bit. Degenerate dimensions
    (max == min) code to 0 and reconstruct exactly.
    """
    stats = (
        df.select(F.posexplode(F.col(vec_col)).alias("d", "v"))
        .groupBy("d")
        .agg(
            F.min(F.col("v").cast("double")).alias("lo"),
            F.max(F.col("v").cast("double")).alias("hi"),
        )
        .collect()
    )
    if not stats:
        raise ValueError("quantize_embeddings needs a non-empty input")
    dim = max(r["d"] for r in stats) + 1
    lo = [0.0] * dim
    hi = [0.0] * dim
    for r in stats:
        lo[r["d"]], hi[r["d"]] = float(r["lo"]), float(r["hi"])
    lo_a, hi_a = F.lit(lo), F.lit(hi)

    def _code(x, i):
        l = F.element_at(lo_a, i + 1)
        h = F.element_at(hi_a, i + 1)
        return F.when(
            h > l,
            F.round((x.cast("double") - l) / (h - l) * 255, 0).cast("int"),
        ).otherwise(F.lit(0))

    def _deq(c, i):
        l = F.element_at(lo_a, i + 1)
        h = F.element_at(hi_a, i + 1)
        return F.when(
            h > l, l + c.cast("double") / 255 * (h - l)
        ).otherwise(l)

    qvec = F.transform(F.col(vec_col), _code)
    err = F.round(
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.transform(qvec, _deq),
                lambda x, y: F.abs(x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ),
        6,
    )
    return df.select(
        F.col(id_col),
        qvec.alias("qvec"),
        err.alias("max_abs_err"),
    )


def embedding_dim_stats(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-DIMENSION embedding profile: (dim, n, mean, std, min_val,
    max_val) — the embedding-QA scan that catches dead dimensions
    (std ~ 0), scale drift between batches (per-dim mean/std shifts),
    and ragged arrays (a dim whose n differs from dim 0's has vectors
    of inconsistent length — the upstream bug worth failing on before
    an ANN build).

    ORDER-INDEPENDENT arithmetic (the correlation_matrix contract):
    values canonicalize to DECIMAL(18,6); n / sum / sum-of-squares
    accumulate as exact decimals with map-side partial aggregation;
    mean and population std compute ONCE in double from the exact
    sums, rounded to 6 — any engine reproduces them bit-for-bit.
    Zero-variance dims emit std = 0.0; negative radicands from double
    rounding clamp at 0. One scan, one posexplode, one dim-keyed
    aggregate (output = dim rows)."""
    x = F.col("__v").cast("decimal(18,6)")
    agg = (
        df.select(
            F.posexplode(F.col(vec_col)).alias("dim", "__v")
        )
        .groupBy("dim")
        .agg(
            F.count("__v").cast("long").alias("n"),
            F.sum(x).alias("__s"),
            F.sum(x * x).alias("__ss"),
            F.min(F.col("__v").cast("double")).alias("min_val"),
            F.max(F.col("__v").cast("double")).alias("max_val"),
        )
    )
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    n = F.col("n").cast("double")
    var = F.greatest(ss / n - (s / n) * (s / n), F.lit(0.0))
    return agg.select(
        "dim",
        "n",
        F.round(s / n, 6).alias("mean"),
        F.round(F.sqrt(var), 6).alias("std"),
        "min_val",
        "max_val",
    ).orderBy("dim")


def clean_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: "int | None" = None,
    normalize: bool = True,
    drop_stats: "dict | None" = None,
) -> DataFrame:
    """Pre-ANN embedding HYGIENE: drop rows whose vector is NULL, has
    the wrong dimension, contains NaN/Inf, or (when normalizing) has
    zero norm — the four corruptions that poison an index build
    silently (a NaN cosine propagates through every comparison it
    touches) — and L2-normalize the survivors. Returns
    (id, dim, norm, unit) with the norm and unit components rounded
    to 6 (engine-portable).

    ``dim=None`` infers the MAJORITY dimension (most frequent
    ``size(vec)``, ties to the smaller — one tiny aggregate), so one
    truncated batch cannot silently redefine the corpus shape. Pass
    ``drop_stats`` (dict) to receive per-reason drop counts — the
    observability contract of the dedup caps (costs one extra
    aggregate job over the corpus).

    Scale shape: one narrow projection (size/NaN checks and the
    normalize are JVM lambda expressions over the array — no UDF, no
    shuffle, no explode)."""
    size_c = F.size(F.col(vec_col))
    if dim is None:
        top = (
            df.filter(F.col(vec_col).isNotNull())
            .groupBy(size_c.alias("__d"))
            .agg(F.count(F.lit(1)).alias("__n"))
            .orderBy(F.col("__n").desc(), F.col("__d").asc())
            .limit(1)
            .collect()
        )
        if not top:
            dim = 0
        else:
            dim = int(top[0]["__d"])
    bad_el = F.exists(
        F.col(vec_col),
        lambda x: F.isnan(x.cast("double"))
        | (F.abs(x.cast("double")) == float("inf")),
    )
    norm_sq = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    is_null = F.col(vec_col).isNull()
    wrong_dim = ~is_null & (size_c != F.lit(int(dim)))
    has_nan = ~is_null & ~wrong_dim & bad_el
    zero_norm = (
        ~is_null & ~wrong_dim & ~has_nan & (norm_sq == 0.0)
        if normalize
        else F.lit(False)
    )
    if drop_stats is not None:
        row = df.agg(
            F.sum(is_null.cast("long")).alias("n_null"),
            F.sum(wrong_dim.cast("long")).alias("n_wrong_dim"),
            F.sum(has_nan.cast("long")).alias("n_nonfinite"),
            F.sum(zero_norm.cast("long")).alias("n_zero_norm"),
        ).collect()[0]
        drop_stats.update(
            {k: int(row[k] or 0) for k in (
                "n_null", "n_wrong_dim", "n_nonfinite", "n_zero_norm"
            )}
        )
        drop_stats["dim"] = int(dim)
    kept = df.filter(~is_null & ~wrong_dim & ~has_nan & ~zero_norm)
    norm = F.sqrt(norm_sq)
    unit = (
        F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double") / norm, 6)
        )
        if normalize
        else F.transform(F.col(vec_col), lambda x: x.cast("double"))
    )
    return kept.select(
        F.col(id_col),
        F.lit(int(dim)).alias("dim"),
        F.round(norm, 6).alias("norm"),
        unit.alias("unit"),
    )
