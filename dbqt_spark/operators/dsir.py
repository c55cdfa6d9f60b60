"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023).

Beyond the reference surface (north-star LLM-pipeline operator): given a
RAW crawl corpus and a small TARGET corpus that exemplifies the desired
distribution (Wikipedia+books in the paper), estimate per-document
importance weights in a hashed n-gram feature space and resample raw
documents proportionally — the published, widely-used recipe for
"make 100 TB of crawl look like the target" (arXiv:2302.03169).

Method (public paper, public math):

1. Featurize each document into a bag of HASHED n-grams: unigrams +
   bigrams of lowercased whitespace tokens, hashed into ``n_buckets``
   counters (the paper uses 10k buckets).
2. Fit multinomial bucket distributions p̂ (target) and q̂ (raw) with
   Laplace smoothing.
3. Per raw document: ``log w = Σ_b count_b · (ln p̂_b − ln q̂_b)``.
4. Select: Gumbel-top-k over ``log w`` (sampling without replacement
   from the importance distribution — the paper's estimator) or plain
   top-k for a deterministic greedy variant.

Engine determinism (the house contract): the bucket hash is the
portable 60-bit md5-prefix (``dedup.portable_token_hash`` family), each
bucket's log-ratio is rounded to 6 places and canonicalized to
DECIMAL(18,6) BEFORE the per-doc sum, so the aggregation is exact
integer arithmetic and a DuckDB oracle reproduces every weight
bit-for-bit (the ``textstats.lm_score`` discipline). Gumbel noise is a
pure function of (seed, doc id) via the same md5 construction — no RNG
state, append-stable, reproducible across engines.

Since r15 the log itself is PORTABLE (r14 driver red): ``ln`` went
through libm, whose JVM and DuckDB implementations may differ by 1 ulp
— enough to flip the 6th decimal of a boundary-adjacent bucket ratio
on a different driver host. ``functions.portable_math`` now computes
every ``ln`` in this module (ratio table AND Gumbel draw) from
exactly-rounded IEEE primitives only (integer-bitlength range
reduction + atanh series), so both engines produce bit-identical
doubles BEFORE the 6-place rounding, which itself uses the portable
``floor``-based form. The default integer-``alpha`` path is fully
portable; non-integer ``alpha`` falls back to native ``F.log``
(documented best-effort parity).

Scale shape: text scan -> explode -> (doc, bucket) counts with
map-side combine; the log-ratio table is at most ``n_buckets`` rows
(10k: kilobytes) and joins back BROADCAST -> per-doc agg. The self-fit
path makes TWO passes over the raw corpus (fit q̂, then score — see
``dsir_weights`` for why that beats caching a corpus-scale feature
frame); ``ratios=`` collapses scoring to one pass. Selection is
``TakeOrderedAndProject`` (per-partition top-k, then a k-row merge on
the driver) — no global sort, no single-partition window. Shuffle
cardinalities shrink monotonically: grams -> doc buckets -> buckets ->
docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _grams_expr(max_n: int) -> str:
    """SQL expression: array of all 1..max_n word grams (occurrences,
    NOT distinct — DSIR features are counts) of the lowercased
    whitespace tokens. Docs shorter than n contribute no n-grams."""
    parts = []
    for n in range(1, max_n + 1):
        if n == 1:
            parts.append("__toks")
        else:
            parts.append(
                f"CASE WHEN size(__toks) >= {n} THEN "
                f"transform(sequence(1, size(__toks) - {n} + 1), "
                f"i -> array_join(slice(__toks, i, {n}), ' ')) "
                f"ELSE array() END"
            )
    return "concat(" + ", ".join(parts) + ")"


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    max_n: int = 2,
) -> DataFrame:
    """(id, bucket, cnt): hashed bag-of-ngrams features. Bucket =
    portable 60-bit md5-prefix of the gram, mod ``n_buckets``; ``cnt``
    counts OCCURRENCES (bag semantics, per the paper). One scan, one
    explode, map-side-combined count."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if max_n < 1:
        raise ValueError(f"max_n must be >= 1, got {max_n}")
    toks = F.expr(
        f"filter(split(lower(coalesce({text_col}, '')), '\\\\s+'), "
        f"x -> x != '')"
    )
    bucket = F.expr(
        f"cast(conv(substring(md5(__gram), 1, 15), 16, 10) as bigint) "
        f"% {n_buckets}"
    )
    # tokenize + explode + per-gram md5 is the heaviest narrow map in
    # the DSIR chain; fan a single-row-group scan out first (no-op at
    # corpus scale, and on streaming frames — micro-batch scoring
    # passes through untouched). The (id, bucket) count is map-side
    # combined and partition-independent.
    from ..utils import spread_small_scan

    return (
        spread_small_scan(df)
        .select(F.col(id_col), toks.alias("__toks"))
        .select(
            id_col, F.explode(F.expr(_grams_expr(max_n))).alias("__gram")
        )
        .select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def dsir_log_ratios(
    raw_feats: DataFrame,
    target_feats: DataFrame,
    n_buckets: int = 10_000,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-bucket smoothed log importance ratio, 6-place-rounded and
    DECIMAL-canonical: ``lr6 = round(ln(((t_b+α)·(R+αB)) /
    ((r_b+α)·(T+αB))), 6)`` where T/R are total target/raw gram counts
    and B = n_buckets. Exactly B rows — DENSE over 0..B-1 (r13
    ADVICE): a table fit on a SAMPLE won't have seen every bucket, and
    when it is frozen and reused via ``dsir_weights(ratios=...)`` a
    sparse table would silently drop unseen buckets from the scoring
    join; the Laplace-smoothed estimator gives them the nonzero
    default ``ln((R+αB)/(T+αB))``, which the dense frame carries.
    Still broadcastable by construction (B is 10k in the paper)."""
    if alpha <= 0:
        # alpha=0 makes never-seen buckets divide by zero (q̂=0) — the
        # smoothing is what keeps the estimator finite
        raise ValueError(f"alpha must be > 0, got {alpha}")
    t = target_feats.groupBy("bucket").agg(F.sum("cnt").alias("__t"))
    r = raw_feats.groupBy("bucket").agg(F.sum("cnt").alias("__r"))
    dense = raw_feats.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    both = (
        dense.join(t, "bucket", "left")
        .join(r, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("__t", F.lit(0)).alias("__t"),
            F.coalesce("__r", F.lit(0)).alias("__r"),
        )
    )
    totals = both.agg(
        F.sum("__t").alias("__tot_t"), F.sum("__r").alias("__tot_r")
    )
    base = both.crossJoin(F.broadcast(totals))
    if float(alpha).is_integer() and 1 <= int(alpha) <= 10**6:
        # Portable path (the oracled contract): lr = (ln(t+a) − ln(r+a))
        # + (ln(R+aB) − ln(T+aB)) — four single-integer portable lns
        # instead of one ln of a product, so every bitlength argument
        # stays inside int64 even at 100 TB gram totals. Each ln and
        # the final 6-place rounding use exactly-rounded IEEE ops only
        # (functions.portable_math) — bit-identical on any engine.
        from ..functions.portable_math import (
            apply_steps,
            ln_int_steps,
            round_dec_expr,
        )

        ai = int(alpha)
        aib = ai * n_buckets
        ints = base.select(
            "bucket",
            (F.col("__t") + F.lit(ai)).cast("bigint").alias("__ta"),
            (F.col("__r") + F.lit(ai)).cast("bigint").alias("__rb"),
            (F.col("__tot_r") + F.lit(aib)).cast("bigint").alias("__tr"),
            (F.col("__tot_t") + F.lit(aib)).cast("bigint").alias("__tt"),
        )
        steps = (
            ln_int_steps("__ta", "__l1", "spark", "__q1")
            + ln_int_steps("__rb", "__l2", "spark", "__q2")
            + ln_int_steps("__tr", "__l3", "spark", "__q3")
            + ln_int_steps("__tt", "__l4", "spark", "__q4")
        )
        lr_raw = "((__l1 - __l2) + (__l3 - __l4))"
        return apply_steps(ints, steps).selectExpr(
            "bucket", f"{round_dec_expr(lr_raw, 6, 'spark')} AS lr6"
        )
    # Non-integer alpha: native log (best-effort cross-engine parity —
    # a 1-ulp libm divergence can flip a boundary-adjacent 6th decimal)
    a = float(alpha)
    ab = a * n_buckets
    return base.select(
        "bucket",
        F.round(
            F.log(
                (
                    (F.col("__t").cast("double") + F.lit(a))
                    * (F.col("__tot_r").cast("double") + F.lit(ab))
                )
                / (
                    (F.col("__r").cast("double") + F.lit(a))
                    * (F.col("__tot_t").cast("double") + F.lit(ab))
                )
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("lr6"),
    )


def dsir_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    max_n: int = 2,
    alpha: float = 1.0,
    ratios: "DataFrame | None" = None,
) -> DataFrame:
    """Per raw document: ``(id, n_grams, log_weight)``. ``log_weight``
    is the exact DECIMAL sum of cnt·lr6 (order-independent integer
    micros under the hood); docs with no grams (empty text) carry
    weight 0 with n_grams 0 — they match the target exactly as well as
    they match the raw corpus.

    TWO PASSES over the raw corpus, by design: pass 1 fits the bucket
    marginal q̂, pass 2 scores. At 100 TB the alternative — persisting
    the (doc, bucket, cnt) feature frame between passes — is a
    corpus-scale cache (trillions of rows), strictly worse than a
    second columnar scan of one text column. Production pipelines
    should collapse to ONE pass by fitting the ratio table once
    (``dsir_log_ratios`` — on a raw SAMPLE, as the paper does) and
    passing it via ``ratios=``: scoring then reuses the frozen B-row
    table across every shard/day of the corpus (the ``lm_score``
    ``vocab=`` discipline). ``dsir_log_ratios`` emits a DENSE B-row
    table, so every bucket a scored document can hash into has a row
    (sample-fit tables included — r13 ADVICE); the scoring join is
    LEFT and counts ``n_grams`` from the raw features directly, so
    even a hand-built SPARSE ratio table never silently drops grams —
    buckets it omits contribute log-ratio 0 (density ratio 1) and
    still count toward ``n_grams``."""
    raw_feats = hashed_ngram_features(
        raw_df, text_col, id_col, n_buckets, max_n
    )
    if ratios is not None:
        lr = ratios.select("bucket", "lr6")
    else:
        target_feats = hashed_ngram_features(
            target_df, text_col, id_col, n_buckets, max_n
        )
        lr = dsir_log_ratios(raw_feats, target_feats, n_buckets, alpha)
    per_doc = (
        raw_feats.join(F.broadcast(lr), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.sum(
                F.col("cnt").cast("decimal(18,0)")
                * F.coalesce(
                    F.col("lr6"), F.lit(0).cast("decimal(18,6)")
                )
            ).alias("__lw"),
        )
    )
    return raw_df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
        F.coalesce(
            F.col("__lw"), F.lit(0).cast("decimal(38,6)")
        ).alias("log_weight"),
    )


def with_gumbel_key(
    df: DataFrame, id_col: str, seed: int, out: str = "gumbel_key"
) -> DataFrame:
    """Append a deterministic 6-place Gumbel draw per id: u from the
    portable md5-prefix of ``"<seed>:<id>"`` mapped into (0,1), then
    ``g = -ln(-ln(u))`` — the Gumbel-max trick's noise, reproducible by
    any engine that can md5 (same family as ``sampling.hash_split``).
    Both ``ln``s are portable-exact (``u = (2h+1)/2^61`` is an integer
    ratio; the outer ln runs on the positive double), so the rounded
    DECIMAL(18,6) draw is bit-identical across engines. Intermediate
    ``__pg*`` columns are projected away."""
    from ..functions.portable_math import apply_steps, gumbel_steps

    keep = df.columns
    steps = gumbel_steps(id_col, seed, out, "spark")
    return apply_steps(df, steps).select(*keep, out)


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    max_n: int = 2,
    alpha: float = 1.0,
    mode: str = "gumbel",
    seed: int = 42,
    ratios: "DataFrame | None" = None,
) -> DataFrame:
    """Resample ``k`` raw documents toward the target distribution:
    ``mode="gumbel"`` draws without replacement from the importance
    distribution (key = log_weight + Gumbel(seed, id) — the paper's
    estimator); ``mode="topk"`` takes the k highest weights outright.
    Returns ``(id, n_grams, log_weight, sample_key)`` — the k winners.

    The k-selection is sort+limit, which Spark executes as
    TakeOrderedAndProject: each partition keeps its local top-k and
    the driver merges k-row heaps — no global sort at any scale."""
    if mode not in ("gumbel", "topk"):
        raise ValueError(f"mode must be gumbel|topk, got {mode!r}")
    w = dsir_weights(
        raw_df, target_df, text_col, id_col, n_buckets, max_n, alpha,
        ratios=ratios,
    )
    if mode == "gumbel":
        w = with_gumbel_key(w, id_col, seed, out="__g")
        key = F.col("log_weight") + F.col("__g")
    else:
        key = F.col("log_weight").cast("decimal(38,6)")
    return (
        w.select(
            id_col, "n_grams", "log_weight", key.alias("sample_key")
        )
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(k)
    )
