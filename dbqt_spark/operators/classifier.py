"""Linear bag-of-words classifier scoring — model-based quality filtering.

Beyond the reference surface (north star, text-analysis pillar). The
heuristic quality gate (``textstats.quality_gate``) catches boilerplate
and garbage; the move that actually lifted modern pretraining corpora
is MODEL-based filtering — score every document with a cheap linear
classifier and keep the top band (CCNet's fastText LM filter, the
FineWeb-Edu educational-quality classifier). The model at inference
time is just (token -> weight) plus a bias: score = sigmoid(bias +
mean token weight). This operator runs that inference as a pure
DataFrame plan; train the weights wherever you like (fastText export,
logistic regression) and hand them over as a dict.

Scale shape: ONE corpus scan — explode tokens, broadcast-join the
weight table (models are KBs-to-MBs; the corpus side never shuffles for
the lookup), then a map-side-combined groupBy(doc) rollup. No UDFs, no
driver loops.

Determinism contract: weights are rounded to 6 places and summed as
DECIMAL(20,8) (exact, order-independent — float summation order across
partitions would make scores run-dependent); the sigmoid is evaluated
once on the exact mean, so any engine reproduces every score
bit-for-bit (the DuckDB oracle does, from a VALUES weight table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col


def classifier_score(
    df: DataFrame,
    weights: "dict[str, float]",
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "score",
) -> DataFrame:
    """Score each doc with the linear model: ``sigmoid(bias + mean
    over tokens of weight(token))`` — unknown tokens weigh 0, tokens
    are the lowercased whitespace tokens shared with ``token_stats``,
    and a zero-token doc scores ``sigmoid(bias)``. Returns (id, score)
    with the score rounded to 6."""
    from ..utils import spread_small_scan

    df = spread_small_scan(df)  # heavy narrow map; no-op at scale
    spark = df.sparkSession
    # tokens are matched LOWERCASED — normalize the model's keys the
    # same way so a weight exported as {"The": ...} cannot silently
    # never match; a genuine case collision in the model is ambiguous
    # and refused rather than summed
    lowered: "dict[str, float]" = {}
    for t, w in weights.items():
        key = t.lower()
        if key in lowered and lowered[key] != float(w):
            raise ValueError(
                f"classifier weights collide after lowercasing: {t!r} "
                f"vs an earlier key for {key!r} with a different weight"
            )
        lowered[key] = float(w)
    rounded = [
        (t, round(w, 6)) for t, w in sorted(lowered.items())
    ]
    toks = (
        df.select(
            F.col(id_col),
            F.explode_outer(
                tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
            ).alias("__tok"),
        )
    )
    if rounded:
        w_df = spark.createDataFrame(rounded, "__tok string, __w double")
        toks = toks.join(F.broadcast(w_df), "__tok", "left")
    else:
        toks = toks.withColumn("__w", F.lit(None).cast("double"))
    per_doc = toks.groupBy(id_col).agg(
        F.count("__tok").cast("long").alias("__n"),
        F.sum(
            F.coalesce(F.col("__w"), F.lit(0.0)).cast("decimal(20,8)")
        ).alias("__s"),
    )
    x = F.lit(float(bias)) + F.when(
        F.col("__n") > 0,
        F.coalesce(F.col("__s"), F.lit(0).cast("decimal(20,8)"))
        .cast("double")
        / F.col("__n"),
    ).otherwise(F.lit(0.0))
    return per_doc.select(
        id_col,
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-x)), 6).alias(out_col),
    )


def classifier_filter(
    df: DataFrame,
    weights: "dict[str, float]",
    threshold: float = 0.5,
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep docs the classifier scores at or above ``threshold`` — the
    FineWeb-Edu-style keep-the-top-band move. One extra doc-keyed join
    against the scores (the corpus rows themselves never explode)."""
    kept = classifier_score(
        df, weights, bias=bias, text_col=text_col, id_col=id_col
    ).filter(F.col("score") >= threshold)
    return df.join(kept.select(id_col), id_col, "left_semi")


def nb_fit(
    train: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
) -> "tuple[DataFrame, DataFrame]":
    """Fit a multinomial NAIVE BAYES text classifier — the training
    side of model-based filtering (``classifier_score`` applies an
    externally-trained linear model; this trains one ON the engine,
    the bootstrap move when no fastText export exists yet: label a
    small seed set, fit, score the corpus, keep the top band).

    Returns ``(model, class_stats)``:

    - ``model``: (label, term, log_prob) — add-one-smoothed
      ``ln((count(term, label) + 1) / (N_label + V))`` over the
      lowercased whitespace tokens, rounded to 6 as DECIMAL so
      downstream sums are order-independent (the lm_score
      discipline);
    - ``class_stats``: (label, log_prior, log_floor) — document-count
      prior and the unseen-term floor ``ln(1 / (N_label + V))``.

    Scale shape: one corpus scan -> map-side-combined (label, term)
    counts (vocabulary x classes, never corpus-sized); totals and the
    vocab size fold back via broadcast joins. Rows with a NULL label
    are refused (a silently dropped class skews every prior).
    NULL/empty texts contribute their prior only."""
    lbl = F.col(label_col)
    toks = train.select(
        lbl.alias("label"),
        F.explode_outer(
            tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
        ).alias("term"),
    )
    ct = (
        toks.filter(F.col("term").isNotNull())
        .groupBy("label", "term")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    totals = ct.groupBy("label").agg(F.sum("__n").alias("__lt"))
    vocab_n = ct.select("term").distinct().agg(
        F.count(F.lit(1)).alias("__V")
    )
    docs = train.select(lbl.alias("label"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("__dt"))
    priors = (
        docs.groupBy("label")
        .agg(F.count(F.lit(1)).alias("__d"))
        .crossJoin(F.broadcast(n_docs))
    )
    if priors.filter(F.col("label").isNull()).limit(1).count():
        raise ValueError(
            f"nb_fit: NULL values in label column {label_col!r} — "
            "label or filter them before fitting"
        )
    model = (
        ct.join(F.broadcast(totals), "label")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "label",
            "term",
            F.round(
                F.log(
                    (F.col("__n") + 1).cast("double")
                    / (F.col("__lt") + F.col("__V")).cast("double")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("log_prob"),
        )
    )
    class_stats = (
        priors.join(F.broadcast(totals), "label", "left")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "label",
            F.round(
                F.log(F.col("__d").cast("double") / F.col("__dt")), 6
            )
            .cast("decimal(18,6)")
            .alias("log_prior"),
            F.round(
                F.log(
                    F.lit(1.0)
                    / (F.coalesce(F.col("__lt"), F.lit(0)) + F.col("__V"))
                    .cast("double")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("log_floor"),
        )
    )
    return model, class_stats


def nb_predict(
    df: DataFrame,
    model: DataFrame,
    class_stats: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Classify each doc with a fitted ``nb_fit`` model: per class,
    ``log_prior + sum over token occurrences of log_prob`` with
    unseen terms at the class floor. Returns (id, label, log_posterior)
    — the argmax class, ties broken label-ascending, log_posterior
    the exact decimal sum cast to double.

    Scale shape: the corpus explodes ONCE; the (term -> per-class
    log_prob) lookup is a broadcast join (models are vocab x classes —
    KBs to MBs; pass ``broadcast_model=False`` for a web-scale vocab,
    where the lookup becomes a term-keyed shuffle join — the
    ``lm_score_bigram`` knob); the per-(doc, class) rollup is
    map-side combined via
    the algebraic identity score = prior + n_tokens * floor +
    sum(matched log_prob - floor) — unseen terms never materialize
    rows. The final argmax window partitions by doc over exactly
    n_classes rows."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.explode_outer(
            tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
        ).alias("term"),
    )
    n_per_doc = toks.groupBy(id_col).agg(
        F.count("term").cast("long").alias("__nt")
    )
    # matched (doc, class) adjustments: each token row joins only the
    # classes whose vocab contains the term
    model_side = F.broadcast(model) if broadcast_model else model
    matched = (
        toks.join(model_side, "term")
        .groupBy(id_col, "label")
        .agg(F.sum("log_prob").alias("__s"), F.count(F.lit(1)).alias("__m"))
    )
    scored = (
        n_per_doc.crossJoin(F.broadcast(class_stats))
        .join(matched, [id_col, "label"], "left")
        .select(
            F.col(id_col),
            "label",
            (
                F.col("log_prior").cast("decimal(28,6)")
                + (F.col("__nt") * F.col("log_floor")).cast("decimal(28,6)")
                + F.coalesce(
                    (
                        F.col("__s").cast("decimal(28,6)")
                        - (F.col("__m") * F.col("log_floor")).cast(
                            "decimal(28,6)"
                        )
                    ),
                    F.lit(0).cast("decimal(28,6)"),
                )
            ).alias("__post"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__post").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            "label",
            F.col("__post").cast("double").alias("log_posterior"),
        )
    )


def calibration_report(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a [0,1] quality/classifier score
    against a labeled subset — the calibration check that decides
    whether a FineWeb-Edu-style threshold gate (``classifier_filter``)
    actually means what its score says: per equal-width bin,
    (bin, n, mean_score, pos_rate). A well-calibrated model has
    pos_rate tracking mean_score; systematic gaps say "rescale before
    thresholding".

    Engine-exact: bin = clamp(floor(score*n_bins)) in integer/double
    arithmetic both engines share; mean_score sums scores ROUNDED TO 6
    (DECIMAL(18,6), order-independent) and both ratios go through the
    ``_avg6_expr`` integer micro-unit rounding — a double round() at a
    .5e-6 quotient boundary is exactly where the sf0.1 sweep catches
    engines disagreeing. NULL **and NaN** scores and NULL labels are
    excluded (count rows, not guesses — r12 ADVICE: a NaN score
    passes isNotNull, floor(NaN) casts to NULL, and greatest/least
    skip NULLs, so NaN rows silently inflated bin n_bins-1 with a
    NULL-excluded mean). One groupBy over n_bins keys — map-side
    combine, no window, a narrow map + tiny shuffle at any corpus
    size."""
    from .textstats import _avg6_expr

    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    s = F.col(score_col).cast("double")
    lbl = F.col(label_col).cast("double")
    b = F.greatest(
        F.lit(0),
        F.least(F.lit(n_bins - 1), F.floor(s * n_bins).cast("int")),
    )
    return (
        df.filter(s.isNotNull() & ~F.isnan(s) & lbl.isNotNull())
        .groupBy(b.cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(s, 6).cast("decimal(18,6)")).alias("__s"),
            F.count(F.when(lbl > 0, 1)).cast("long").alias("__p"),
        )
        .select(
            "bin",
            "n",
            _avg6_expr("__s", "n").alias("mean_score"),
            _avg6_expr("__p", "n").alias("pos_rate"),
        )
        .orderBy("bin")
    )
