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
