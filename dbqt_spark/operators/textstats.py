"""Text analysis operators for training-data pipelines.

Beyond the reference surface (BASELINE.json north star): token counting,
quality scoring, language-ID heuristic, document fingerprinting. All
pure ``pyspark.sql.functions`` expressions — JVM-side, whole-stage
codegen, no UDFs — so they run at 100 TB as a single scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import spread_small_scan

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic (public common-word lists).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "en"],
    "de": ["der", "die", "das", "und", "ist", "von", "den", "mit", "zu", "ein"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不", "人", "这"],
}

PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}<>-]"
_WS = r"\s+"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, empty strings dropped (handles leading/trailing
    whitespace and empty docs uniformly)."""
    return F.filter(F.split(text, _WS), lambda t: t != "")


def token_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer=None,
) -> DataFrame:
    """Per-doc counts: n_chars, n_tokens, n_word_tokens (regex
    word/punct pieces ~ BPE pretokens), avg_token_len.

    ``n_tokens`` counts whitespace tokens by default (JVM expression,
    engine-portable — the oracle contract). Pass ``tokenizer=`` (see
    ``functions.tokenize.resolve_token_counter``) to denominate
    ``n_tokens`` in real tokenizer tokens via one Arrow batch map;
    ``avg_token_len`` then reports chars-per-token under that
    tokenizer."""
    from ..functions.tokenize import resolve_token_counter

    text = F.col(text_col)
    toks = tokens_col(text)
    word_toks = F.expr(rf"regexp_extract_all({text_col}, '\\w+|[^\\w\\s]', 0)")
    counter = resolve_token_counter(tokenizer)
    n_tokens = counter(text) if counter is not None else F.size(toks)
    total_tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return df.select(
        F.col(id_col),
        F.length(text).cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(word_toks).cast("long").alias("n_word_tokens"),
        F.when(
            n_tokens > 0,
            F.round(total_tok_chars.cast("double") / n_tokens, 4),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_token_len"),
    )


def _quality_exprs(text_col: str) -> dict[str, Column]:
    """The quality expressions, reusable by ``quality_scores`` and the
    single-scan ``corpus_summary`` (score is UNROUNDED here)."""
    text = F.col(text_col)
    toks = tokens_col(F.lower(text))
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    punct_count = n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    alpha_count = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    en_stops = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_count = F.size(F.filter(toks, lambda t: F.array_contains(en_stops, t)))

    punct_ratio = F.when(n_chars > 0, punct_count / n_chars).otherwise(0.0)
    alpha_ratio = F.when(n_chars > 0, alpha_count / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, stop_count / n_tokens).otherwise(0.0)
    # composite: long-enough, mostly alphabetic, not punctuation-soup,
    # some stopwords (fluent prose signal)
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.25
        + alpha_ratio * 0.35
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.2
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.2
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": punct_ratio,
        "alpha_ratio": alpha_ratio,
        "stop_ratio": stop_ratio,
        "score": score,
    }


def quality_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality signals (length, punctuation ratio, stopword
    ratio, alpha ratio) + a composite score in [0,1]."""
    df = spread_small_scan(df)  # heavy narrow map; no-op at scale
    q = _quality_exprs(text_col)
    return df.select(
        F.col(id_col),
        q["n_tokens"].cast("long").alias("n_tokens"),
        F.round(q["punct_ratio"], 4).alias("punct_ratio"),
        F.round(q["alpha_ratio"], 4).alias("alpha_ratio"),
        F.round(q["stop_ratio"], 4).alias("stopword_ratio"),
        F.round(q["score"], 4).alias("quality_score"),
    )


def _lang_best_expr(text_col: str) -> Column:
    """struct(hits, lang) of the winning language — reusable by
    ``language_id`` and ``corpus_summary``."""
    toks = tokens_col(F.lower(F.col(text_col)))
    scores = []
    for lang in sorted(STOPWORDS):
        stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        cnt = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
        scores.append(
            F.struct(
                cnt.cast("long").alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # array_max on struct(hits, lang): max hits, ties -> max lang; to get
    # deterministic *alphabetical-first* ties, invert by sorting desc on
    # (hits, reversed-lang) — simpler: max of (hits, negated-rank) ==
    # array_max over (hits, lang) struct gives lexicographically-last lang
    # on ties; we document that tie-break instead.
    return F.array_max(F.array(*scores))


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-voting language ID: score each language by fraction of
    tokens in its stopword list; argmax with deterministic tie-break
    (alphabetical language code). Pure codegen expressions."""
    best = _lang_best_expr(text_col)
    return df.select(
        F.col(id_col),
        best["lang"].alias("predicted_lang"),
        best["hits"].cast("long").alias("stopword_hits"),
    )


def corpus_summary(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus rollup per predicted language in ONE scan + one
    aggregation: doc count, total tokens, mean quality, mean length.

    The per-doc expressions are the same builders the row-level operators
    use; composing them in a single ``select`` keeps the whole report one
    pass over the corpus (at 100 TB, three separate operator scans +
    joins would triple the read). Quality means are summed as
    DECIMAL(18,6) of the 4-digit-rounded per-doc score — exact,
    order-independent arithmetic, so any SQL engine reproduces the mean
    bit-for-bit (same trick as the pricing-summary oracle)."""
    q = _quality_exprs(text_col)
    best = _lang_best_expr(text_col)
    per_doc = df.select(
        best["lang"].alias("predicted_lang"),
        q["n_tokens"].cast("long").alias("__tok"),
        F.round(q["score"], 4).cast("decimal(18,6)").alias("__q"),
        q["n_chars"].cast("long").alias("__chars"),
    )
    n_docs = F.count(F.lit(1))
    return (
        per_doc.groupBy("predicted_lang")
        .agg(
            n_docs.alias("n_docs"),
            F.sum("__tok").alias("total_tokens"),
            F.round(
                F.sum("__q").cast("double") / n_docs, 4
            ).alias("avg_quality"),
            F.round(
                F.sum("__chars").cast("double") / n_docs, 2
            ).alias("avg_chars"),
        )
        .orderBy("predicted_lang")
    )


# Rolling-hash parameters: accumulator stays < _ROLL_P (31-bit), token
# hashes are < 2^60 (md5-prefix), so acc * _ROLL_B + h < 2^52 + 2^60 —
# no int64 overflow under Spark's ANSI mode, and DuckDB/Trino reproduce
# the arithmetic exactly (see SQL twin in queries.py).
_ROLL_P = (1 << 31) - 1
_ROLL_B = 1_000_003


def rolling_hash_col(text: Column) -> Column:
    """Order-sensitive polynomial rolling hash over the token stream:
    ``acc = (acc * B + md5prefix60(token)) mod P``, entirely JVM-side
    (higher-order ``F.aggregate``). Engine-portable by construction —
    md5 is identical everywhere and the arithmetic fits signed 64-bit —
    so a SQL oracle reproduces it bit-for-bit (unlike ``xxhash64``,
    which only Spark implements). Empty docs hash to 0."""
    from .dedup import portable_token_hash

    return F.aggregate(
        F.transform(tokens_col(F.lower(text)), portable_token_hash),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(_ROLL_B) + h) % F.lit(_ROLL_P),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized lowercase text
    (exact-dup key) + xxhash64 (cheap 64-bit whole-doc hash) + an
    order-sensitive token rolling hash (portable across engines)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), _WS, " "))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint_md5"),
        F.xxhash64(norm).alias("fingerprint_xx64"),
        rolling_hash_col(F.col(text_col)).alias("fingerprint_roll"),
    )

def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc REPETITION signals — the Gopher/MassiveText quality-rule
    family (Rae et al. 2021 table A1): highly repetitive documents
    (boilerplate, keyword stuffing, scraper loops) are filtered by the
    fraction of duplicate lines and duplicate word n-grams. All ratios
    are 1 - distinct/total (0 for empty docs), computed with array
    functions in one narrow projection — no UDF, no explode, no
    shuffle; at 100 TB this is a pure map over the corpus scan.

    Columns: n_lines, dup_line_frac, dup_word_frac, dup_2gram_frac,
    dup_3gram_frac — each rounded to 4 places (matching the DuckDB
    oracle's arithmetic exactly: integer size ratios in IEEE double)."""
    df = spread_small_scan(df)  # heavy narrow map; no-op at scale

    def dup_frac(arr: Column) -> Column:
        n = F.size(arr)
        return F.round(
            F.when(
                n > 0,
                1.0
                - F.size(F.array_distinct(arr)).cast("double")
                / n.cast("double"),
            ).otherwise(F.lit(0.0)),
            4,
        )

    def ngrams(n: int) -> Column:
        return F.expr(
            f"CASE WHEN size(__toks) < {n} THEN array() "
            f"ELSE transform(sequence(1, size(__toks) - {n} + 1), "
            f"i -> array_join(slice(__toks, i, {n}), ' ')) END"
        )

    # NULL text counts as empty (all-zero stats), not as a null array —
    # F.size(null) is -1 outside ANSI null semantics, and the DuckDB
    # oracle coalesces identically
    lines = F.expr(
        f"filter(transform(split(coalesce({text_col}, ''), '\\n'), "
        "l -> trim(l)), l -> l != '')"
    )
    toks = tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    return (
        df.select(
            F.col(id_col), lines.alias("__lines"), toks.alias("__toks")
        )
        .select(
            id_col,
            F.size("__lines").cast("long").alias("n_lines"),
            dup_frac(F.col("__lines")).alias("dup_line_frac"),
            dup_frac(F.col("__toks")).alias("dup_word_frac"),
            dup_frac(ngrams(2)).alias("dup_2gram_frac"),
            dup_frac(ngrams(3)).alias("dup_3gram_frac"),
        )
    )


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide top-k word n-grams: (ngram, n_occurrences, n_docs)
    ordered by count desc then ngram asc (a total order, so the k-cut is
    deterministic). The vocabulary-discovery / boilerplate-mining
    primitive of a training-data pipeline (frequent n-grams feed
    stopword lists, contamination screens, and dedup shingle choices).

    Scale shape: explode -> hash aggregate. The groupBy gets map-side
    partial aggregation for n_occurrences for free; n_docs is a
    COUNT(DISTINCT doc_id), which Spark expands to a two-phase
    partial-distinct aggregate (no giant per-key sets shipped). The
    final top-k is a TakeOrdered over the aggregated (distinct-ngram)
    frame, not a full sort of the corpus.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    grams = F.expr(
        f"CASE WHEN size(__toks) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(__toks) - {n} + 1), "
        f"i -> array_join(slice(__toks, i, {n}), ' ')) END"
    )
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(id_col, F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
        .limit(k)
    )


def quality_quantile_filter(
    df: DataFrame,
    quantile: float = 0.5,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    exact: bool = True,
    approx_accuracy: int = 10_000,
    keep_all: bool = False,
) -> DataFrame:
    """Keep documents whose composite quality score is at or above their
    group's ``quantile`` threshold (default: per-language median).
    Per-group rather than global thresholds avoid the classic
    corpus-curation failure where one language's score distribution
    eats another's budget.

    Scale shape: ONE scan computes per-doc scores; a groupBy on
    ``group_col`` (tiny cardinality -> tiny agg) yields thresholds that
    broadcast back onto the scored frame — the corpus itself is never
    shuffled. ``exact=True`` uses the interpolating ``percentile``
    (oracle-reproducible, but its per-group state is the full value
    list); at 100 TB pass ``exact=False`` for ``approx_percentile`` —
    bounded memory (Greenwald-Khanna, error <= 1/approx_accuracy),
    same output contract, thresholds within one rank-error of exact.
    """
    if not 0.0 <= quantile <= 1.0:
        raise ValueError(f"quantile must be in [0,1], got {quantile}")
    score = F.round(_quality_exprs(text_col)["score"], 4).alias(
        "quality_score"
    )
    # keep_all preserves every input column (the curate chain wants the
    # text downstream); the default narrow projection lets the scan
    # prune to (id, group, text)
    scored = (
        df.withColumn("quality_score", score)
        if keep_all
        else df.select(F.col(id_col), F.col(group_col), score)
    )
    thr_fn = (
        F.percentile("quality_score", F.lit(quantile))
        if exact
        else F.percentile_approx(
            "quality_score", F.lit(quantile), F.lit(approx_accuracy)
        )
    )
    thresholds = (
        scored.groupBy(group_col)
        .agg(thr_fn.alias("__thr"))
        .withColumnRenamed(group_col, "__g")
    )
    # null-SAFE group match: rows with a NULL group form their own
    # group (groupBy already aggregates them) and are thresholded like
    # any other, instead of silently vanishing through an equi-join
    return (
        scored.join(
            F.broadcast(thresholds),
            F.col(group_col).eqNullSafe(F.col("__g")),
        )
        .filter(F.col("quality_score") >= F.col("__thr"))
        .drop("__g", "__thr")
    )


def tfidf_keywords(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_token_len: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the cheap
    keyword-extraction / topic-fingerprint primitive (stopwords score
    near zero automatically because their document frequency ~= N).

    tf = in-doc term count; idf = ln(N / df) with df = #docs containing
    the term. Ties cut deterministically by (score desc, term asc, so
    the k-cut is a total order). Tokens shorter than ``min_token_len``
    are dropped (they are almost always function words).

    Scale shape: one explode -> per-(doc, term) count (combines
    map-side) -> per-term df agg (small: vocabulary-sized) joined back
    BROADCAST -> per-doc top-k window. The only corpus-sized shuffles
    are the two hash aggs and the final window on ``id_col``; the
    vocabulary frame stays tiny next to the corpus. ln() on both
    engines is IEEE double, and the score is rounded to 6 places so the
    oracle compares bit-for-bit.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # N stays IN the plan (one-row aggregate, broadcast cross join) —
    # an eager df.count() here would run a full extra corpus scan at
    # call time and make construction non-lazy, unlike every sibling
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    toks = tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    terms = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .filter(F.length("term") >= min_token_len)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = terms.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    )
    scored = (
        terms.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("__n") / F.col("df").cast("double")),
                6,
            ),
        )
        .drop("__n")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            F.col("rank").cast("int").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "tfidf",
        )
    )


def _avg6_expr(sum_col: str, n_col: str) -> "F.Column":
    """round(sum/n, 6) with EXACT half-away-from-zero semantics:
    integer division over the DECIMAL(18,6) sum's micro units, so no
    engine's float round() gets a say at .5e-6 boundaries. Domain:
    |sum| < ~4.6e12 (2x micro units in a signed 64-bit int) — logprob
    sums are bounded by ~30 x doc tokens, far below."""
    s_scaled = F.col(sum_col) * 1_000_000
    # `div` is integer division — only reachable via expr() in the
    # Column API, so build it from the shared bindings
    pos = F.expr(
        f"(2 * cast(({sum_col} * 1000000) as bigint) + {n_col}) "
        f"div (2 * {n_col})"
    )
    neg = -F.expr(
        f"(2 * cast(-({sum_col} * 1000000) as bigint) + {n_col}) "
        f"div (2 * {n_col})"
    )
    q = F.when(s_scaled < 0, neg).otherwise(pos)
    return (q / F.lit(1_000_000.0)).cast("double")


def _ratio6_wide_expr(num_col: str, den_col: str) -> "F.Column":
    """round(num/den, 6) with EXACT half-away semantics for
    NON-NEGATIVE INTEGER columns at any magnitude a DECIMAL(38,0)
    holds — the ``_avg6_expr`` trick without its int64 micro-unit
    bound (|sum| < ~4.6e12), for ratios whose numerators are corpus
    totals (chars per domain, stream tokens): Spark integral ``div``
    on DECIMAL(38,0) and DuckDB ``//`` on HUGEINT produce the same
    quotient, and the final double conversion is the same IEEE op
    (verified operand-for-operand at 1e13-scale numerators)."""
    q = F.expr(
        f"CAST((2 * CAST({num_col} AS DECIMAL(38,0)) * 1000000 "
        f"+ {den_col}) div (2 * CAST({den_col} AS DECIMAL(38,0))) "
        f"AS DOUBLE)"
    )
    return (q / F.lit(1_000_000.0)).cast("double")


def lm_vocabulary(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(term, count) unigram vocabulary of a REFERENCE corpus — fit
    once, persist, and pass to ``lm_score(vocab=...)`` to score any
    number of incoming corpora against the same frozen model (the
    CCNet deployment shape). One scan, map-side-combined counts."""
    toks = tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    return (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )


def lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: "DataFrame | None" = None,
) -> DataFrame:
    """Per-document unigram language-model score — the perplexity-style
    quality signal corpus-curation pipelines (e.g. CCNet-style filtering)
    gate on: documents whose tokens are improbable under the corpus
    unigram distribution score low and surface as boilerplate/gibberish
    candidates. Output: (doc_id, n_tokens, avg_logprob, perplexity),
    one row per document with >= 1 token. Pass ``vocab`` — a
    (term, count) frame from ``lm_vocabulary`` over a REFERENCE corpus
    — to score against a frozen model instead of self-fitting (the
    production shape: fit once on the clean reference, score every
    incoming crawl against it; tokens unseen in the reference get the
    add-one floor 1 / (T + V) like any other unseen event).

    Model: add-one-smoothed unigram probabilities over lowercased
    whitespace tokens, p(t) = (c_t + 1) / (T + V) with T = total tokens,
    V = vocabulary size; avg_logprob = mean ln p over the doc's tokens,
    perplexity = exp(-avg_logprob). Here the model is fit on the scored
    corpus itself (self-scoring); at production scale freeze the
    vocabulary frame from a reference corpus and join it in unchanged.

    Cross-engine determinism: each term's ln p is rounded to 6 places
    and canonicalized to DECIMAL(18,6) BEFORE the per-doc sum, so the
    aggregation is exact integer arithmetic — a raw double sum over
    shuffled rows is order-dependent and never bit-stable. The final
    division and exp() run once on identical inputs in either engine
    (same discipline as ``tfidf_keywords`` / ``zscore_outliers``).

    Scale shape: ONE text scan -> explode -> (doc, term) counts with
    map-side combine -> vocabulary counts derived from THAT aggregate
    (the corpus is never re-exploded) -> one-row totals -> per-term
    log-probs joined back BROADCAST (vocabulary-sized) -> per-doc agg.
    Shuffle cardinalities shrink monotonically: corpus tokens -> doc
    terms -> vocabulary -> docs.
    """
    df = spread_small_scan(df)  # heavy narrow map; no-op at scale
    toks = tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    doc_terms = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if vocab is None:
        vocab = doc_terms.groupBy("term").agg(F.sum("tf").alias("__c"))
    else:
        vocab = vocab.select("term", F.col("count").alias("__c"))
    totals = vocab.agg(
        F.sum("__c").alias("__t"), F.count(F.lit(1)).alias("__v")
    )
    lp = vocab.crossJoin(F.broadcast(totals)).select(
        "term",
        F.round(
            F.log(
                (F.col("__c") + 1).cast("double")
                / (F.col("__t") + F.col("__v")).cast("double")
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("__lp"),
    )
    floor_lp = (
        F.round(
            F.log(
                F.lit(1.0)
                / (F.col("__t") + F.col("__v")).cast("double")
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("__floor")
    )
    floor_row = totals.select(floor_lp)
    agg = (
        doc_terms.join(F.broadcast(lp), "term", "left")
        .crossJoin(F.broadcast(floor_row))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(
                F.col("tf").cast("decimal(18,0)")
                * F.coalesce(F.col("__lp"), F.col("__floor"))
            ).alias("__s"),
        )
    )
    # EXACT half-away-from-zero rounding of s/n at 6 places, in integer
    # micros: engines' round() can disagree on a double quotient sitting
    # exactly on a .5e-6 boundary (caught by the sf0.1 sweep); integer
    # div on the DECIMAL(18,6) sum's exact micro units never does. The
    # final /1e6 is one IEEE division of identical operands — correctly
    # rounded, hence engine-identical.
    avg = _avg6_expr("__s", "n_tokens")
    return agg.select(
        id_col,
        "n_tokens",
        avg.alias("avg_logprob"),
        F.round(F.exp(-avg), 4).alias("perplexity"),
    ).orderBy(id_col)


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cuts: "tuple[float, float]" = (0.33333333, 0.66666667),
    exact: bool = True,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document with the
    unigram LM (``lm_score``) and split the corpus into
    head / middle / tail by perplexity rank — the published CCNet
    recipe keeps ~the head (lowest perplexity ~ most natural text),
    samples the middle, and drops or down-weights the tail.

    Output: (id, n_tokens, avg_logprob, perplexity, ppl_bucket) with
    ppl_bucket in ('head', 'middle', 'tail').

    Engine-exact: cut points are DISCRETE percentiles of the (already
    rounded) perplexity — actual data values, no interpolation — and
    membership is ``ppl <= edge``, so any engine reproduces the
    bucketing bit-for-bit. Same broadcast-back shape as
    ``quality_quantile_filter``: the two edges come from a one-row
    aggregate over the scored frame and ride a broadcast crossJoin —
    the corpus itself is never shuffled for the bucketing (persist the
    scored frame before calling at 100 TB if the double evaluation of
    the scoring pipeline matters). Also like the quality gate,
    ``exact=True`` (``percentile_disc``) is oracle-reproducible but
    buffers every score in one aggregator; pass ``exact=False`` at
    corpus scale for ``approx_percentile`` — bounded memory, cuts
    still actual data values within one rank-error."""
    lo, hi = cuts
    if not 0 < lo < hi < 1:
        raise ValueError(f"cuts must satisfy 0 < lo < hi < 1, got {cuts}")
    # the scored frame feeds BOTH the edge aggregate and the bucketed
    # output; without a materialization the whole lm_score pipeline
    # (explode -> two aggregations -> joins) evaluates twice. The lazy
    # localCheckpoint computes it once at the edge aggregate and the
    # bucketing reads cached narrow (id, stats) partitions (r15: plan
    # 46 Exchanges -> the single scoring chain)
    scored = lm_score(df, text_col=text_col, id_col=id_col).localCheckpoint(
        eager=False
    )
    if exact:
        edges = scored.selectExpr(
            f"percentile_disc({lo}) WITHIN GROUP (ORDER BY perplexity)"
            " AS __e1",
            f"percentile_disc({hi}) WITHIN GROUP (ORDER BY perplexity)"
            " AS __e2",
        )
    else:
        edges = scored.selectExpr(
            f"approx_percentile(perplexity, {lo}, {int(approx_accuracy)})"
            " AS __e1",
            f"approx_percentile(perplexity, {hi}, {int(approx_accuracy)})"
            " AS __e2",
        )
    bucket = (
        F.when(F.col("perplexity") <= F.col("__e1"), F.lit("head"))
        .when(F.col("perplexity") <= F.col("__e2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.crossJoin(F.broadcast(edges))
        .select(
            id_col,
            "n_tokens",
            "avg_logprob",
            "perplexity",
            bucket.alias("ppl_bucket"),
        )
        .orderBy(id_col)
    )


def corpus_card(
    df: DataFrame,
    group_cols: "list[str]" = ("source",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dataset-card rollup per arbitrary grouping (source, lang, split,
    ...): doc count, total tokens, mean quality, mean length, distinct
    texts, and the exact-duplicate rate — the numbers a corpus
    datasheet / mixture designer needs per slice, in ONE scan + one
    aggregation.

    Means are EXACT IEEE quotients of integer sums — stronger than the
    round-after-divide pattern: the per-doc 4dp score scales to an
    int64 (``floor(r*10000 + 0.5)`` — floor is exact, so any engine
    produces the identical integer), integer sums divide once in
    double, and NO post-division rounding exists to straddle a
    boundary (``round(x, 4)`` after a division diverges between
    HALF_UP-on-decimal-repr and IEEE engines whenever the quotient
    lands on a .00005 — a 99-group run at sf0.001 hit one). The
    distinct-text count is an exact COUNT(DISTINCT md5) — swap
    ``approx_count_distinct`` at 100 TB if the Expand cost bites (the
    other statistics are plain map-side-combinable sums)."""
    q = _quality_exprs(text_col)
    per_doc = df.select(
        *[F.col(c) for c in group_cols],
        q["n_tokens"].cast("long").alias("__tok"),
        F.floor(F.round(q["score"], 4) * 10000 + F.lit(0.5))
        .cast("long")
        .alias("__qs"),
        q["n_chars"].cast("long").alias("__chars"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__fp"),
    )
    n_docs = F.count(F.lit(1))
    n_distinct = F.countDistinct(F.col("__fp"))
    return (
        per_doc.groupBy(*[F.col(c) for c in group_cols])
        .agg(
            n_docs.cast("long").alias("n_docs"),
            F.sum("__tok").cast("long").alias("total_tokens"),
            (
                F.sum("__qs").cast("double") / n_docs / F.lit(10000.0)
            ).alias("avg_quality"),
            (F.sum("__chars").cast("double") / n_docs).alias("avg_chars"),
            n_distinct.cast("long").alias("n_distinct_texts"),
            (
                F.lit(1.0) - n_distinct.cast("double") / n_docs
            ).alias("dup_rate"),
        )
        .orderBy(*group_cols)
    )


def dup_ngram_stats(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated n-gram fraction per doc — the
    RefinedWeb/FineWeb "duplicated content" quality signal (Penedo et
    al. 2023 §3.3): after fuzzy dedup, docs whose n-grams still mostly
    appear in OTHER documents are boilerplate-heavy (nav bars, license
    blocks, scraper templates) and get down-weighted or dropped.

    Semantics: an n-gram is *duplicated* iff it occurs in >= 2 distinct
    documents. Per doc we report the total n-gram occurrence count, how
    many of those occurrences are of duplicated n-grams, and the
    fraction (0 for docs with < n tokens).

    Scale shape (100 TB): ONE corpus scan and NO skew-prone operator.
    Explode -> map-side-combined hash aggregate to distinct (doc,
    ngram) pairs with occurrence counts. The needed per-ngram predicate
    is only ``ndocs >= 2``, so instead of a per-ngram COUNT window
    (whose PARTITION BY __ngram would concentrate every distinct
    (doc, ngram) row of a pathologically hot n-gram — "of the and" in
    billions of docs — into ONE partition), we use the complement:

        n_dup_ngrams(doc) = n_ngrams(doc) - occurrences of ngrams
                            UNIQUE to that doc (ndocs == 1)

    Unique ngrams are found with a plain ``groupBy(__ngram)`` carrying
    ``count``/``min(doc)``/``sum(occ)`` — all algebraic, so Spark's
    partial (map-side) aggregation collapses a hot ngram to one partial
    row per map partition before the exchange: the reducer for "of the
    and" receives at most num_partitions rows, never num_docs rows. A
    singleton ngram (the only kind we materialize per-row downstream)
    has exactly one (doc, ngram) row by definition, so ``min(doc)`` /
    ``sum(occ)`` ARE its doc and occurrence count. Every remaining
    shuffle (per-doc rollups, final join) is keyed by doc, which is
    bounded by document length, not corpus frequency. The (doc, ngram)
    aggregate feeds both branches through one reused exchange — the
    corpus is still scanned and exploded exactly once. At extreme
    scale, shuffle bytes drop further by shipping ``xxhash64(ngram)``
    instead of the string — same plan, narrower key; kept as the
    string here so the DuckDB oracle is bit-for-bit (no cross-engine
    hash exists).
    """
    df = spread_small_scan(df)  # heavy narrow map; no-op at scale
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    grams = F.expr(
        f"CASE WHEN size(__toks) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(__toks) - {n} + 1), "
        f"i -> array_join(slice(__toks, i, {n}), ' ')) END"
    )
    # NULL-id docs are excluded up front: they could never be reported
    # (the final join on id never matches a NULL key) — and making the
    # filter explicit keeps BOTH consumers of the (doc, ngram) aggregate
    # plan-identical, so ReuseExchange shares one explode+shuffle instead
    # of Catalyst pushing isnotnull into only the join-build branch and
    # forcing a second corpus scan.
    exploded = (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col), toks.alias("__toks"))
        .select(id_col, F.explode(grams).alias("__ngram"))
    )
    # Per-(doc, ngram) occurrence counts first: one shuffle to distinct
    # pairs; both downstream branches re-read this exchange (ReuseExchange),
    # so the corpus is exploded exactly once.
    per_doc_gram = exploded.groupBy(id_col, "__ngram").agg(
        F.count(F.lit(1)).alias("__occ")
    )
    # Skew-free doc frequency: partial-aggregated groupBy, NOT a
    # PARTITION BY __ngram window. min(doc)/sum(occ) identify the owning
    # doc and its occurrences exactly when __ndocs == 1 — the only rows
    # the next stage consumes.
    ngram_summary = per_doc_gram.groupBy("__ngram").agg(
        F.count(F.lit(1)).alias("__ndocs"),
        F.min(id_col).alias(id_col),
        F.sum("__occ").alias("__occ"),
    )
    uniq_occ = (
        ngram_summary.filter(F.col("__ndocs") == 1)
        .groupBy(id_col)
        .agg(F.sum("__occ").cast("long").alias("__uniq_occ"))
    )
    totals = per_doc_gram.groupBy(id_col).agg(
        F.sum("__occ").cast("long").alias("n_ngrams")
    )
    stats = totals.join(uniq_occ, id_col, "left").select(
        id_col,
        "n_ngrams",
        (
            F.col("n_ngrams") - F.coalesce("__uniq_occ", F.lit(0))
        ).cast("long").alias("n_dup_ngrams"),
    )
    # Left join back to the full doc list so < n-token docs emit zeros.
    return (
        df.select(id_col)
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("n_dup_ngrams", F.lit(0))
            .cast("long")
            .alias("n_dup_ngrams"),
            F.round(
                F.when(
                    F.coalesce("n_ngrams", F.lit(0)) > 0,
                    F.coalesce("n_dup_ngrams", F.lit(0)).cast("double")
                    / F.col("n_ngrams").cast("double"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("dup_ngram_frac"),
        )
    )


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Shannon CHARACTER entropy in nats —
    (id_col, n_chars, char_entropy), 0.0 for empty/NULL docs. The
    gibberish/binary detector quality pipelines pair with the
    word-level signals: base64 blobs, minified JS, and key-mash spam
    have near-uniform character distributions (entropy -> ln alphabet
    size) while hex dumps and repeated-padding junk collapse toward 0;
    natural language sits in a narrow band (~2.9-3.3 nats for English)
    that makes both tails cheap to gate on (cf. CCNet/Gopher-style
    heuristic batteries, which this complements below the token level).

    Identity used: H = ln(n) - (sum_c k_c ln k_c) / n over per-char
    counts k_c — one log per DISTINCT char, no per-char division.
    Cross-engine determinism: each k ln k term is rounded to 6 places
    and canonicalized to DECIMAL(28,6) BEFORE the per-doc sum (exact
    integer arithmetic, order-independent — the ``lm_score``
    discipline); the final ln(n) - s/n runs once on identical inputs.

    Scale shape: ONE text scan -> explode to characters -> (doc, char)
    counts with map-side combine (a doc's explode output collapses to
    <= alphabet-size rows per map partition BEFORE the exchange, so
    the shuffle moves ~|alphabet| rows per doc, not n_chars) -> per-doc
    rollup keyed by doc. The final left join back to the id list moves
    (id, 2 numbers) rows. Characters are Unicode codepoints on both
    engines (Spark split(''), DuckDB string_split(''))."""
    df = spread_small_scan(df)  # heavy narrow map; no-op at scale
    chars = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "")
        ).alias("__ch"),
    ).filter(F.col("__ch") != "")
    counts = chars.groupBy(id_col, "__ch").agg(
        F.count(F.lit(1)).alias("__k")
    )
    per_doc = counts.groupBy(id_col).agg(
        F.sum("__k").cast("long").alias("__n"),
        F.sum(
            F.round(
                F.col("__k").cast("double") * F.log(F.col("__k").cast("double")),
                6,
            ).cast("decimal(28,6)")
        ).alias("__s"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("__n", F.lit(0)).cast("long").alias("n_chars"),
            F.when(
                F.coalesce(F.col("__n"), F.lit(0)) > 0,
                F.round(
                    F.log(F.col("__n").cast("double"))
                    - F.col("__s").cast("double") / F.col("__n"),
                    4,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("char_entropy"),
        )
    )


def readability(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade per doc — the
    classic complexity signals educational-quality filters (the
    FineWeb-Edu family) report next to model scores. Output:
    (id_col, n_sentences, n_words, n_syllables, flesch_ease,
    fk_grade); docs with no words emit NULL scores (undefined, not 0 —
    a 0 grade means something).

    Syllables use the standard vowel-GROUP heuristic: syllables(word)
    ~= count of maximal [aeiouy]+ runs, min 1 per word — the same
    approximation every readability library ships (exact
    syllabification needs a pronouncing dictionary; the heuristic is
    within ~5% on English prose, and the FILTER consumes relative
    ranks, not absolute grades). Sentences = maximal runs ending in
    [.!?] (min 1 if any word exists). Everything is regexp_count-style
    codegen over one narrow projection — no UDF, no shuffle, no
    explode; the regexes sit in the Java-regex/RE2 common dialect so
    the DuckDB oracle reproduces counts bit-for-bit."""
    lowered = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    n_words = F.expr(
        f"size(filter(split(lower(coalesce({text_col}, '')), "
        f"'\\\\s+'), x -> x != ''))"
    ).cast("long")
    # one count per maximal vowel run anywhere + one floor-correction
    # per word with NO vowel run (min-1 rule)
    vowel_runs = F.size(
        F.expr(f"regexp_extract_all(lower(coalesce({text_col}, '')), "
               f"'[aeiouy]+', 0)")
    ).cast("long")
    novowel_words = F.expr(
        f"size(filter(split(lower(coalesce({text_col}, '')), '\\\\s+'), "
        f"x -> x != '' AND x NOT RLIKE '[aeiouy]'))"
    ).cast("long")
    n_syll = (vowel_runs + novowel_words).alias("n_syllables")
    n_sent_raw = F.size(
        F.expr(f"regexp_extract_all(coalesce({text_col}, ''), "
               f"'[.!?]+', 0)")
    ).cast("long")
    n_sent = F.when(n_words == 0, F.lit(0)).otherwise(
        F.greatest(n_sent_raw, F.lit(1))
    ).cast("long")
    out = df.select(
        F.col(id_col),
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        (vowel_runs + novowel_words).cast("long").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return out.select(
        id_col,
        "n_sentences",
        "n_words",
        "n_syllables",
        F.when(
            F.col("n_words") > 0,
            F.round(
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4
            ),
        ).alias("flesch_ease"),
        F.when(
            F.col("n_words") > 0,
            F.round(
                F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4
            ),
        ).alias("fk_grade"),
    )


def lm_score_bigram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document BIGRAM language-model score — the order-aware
    upgrade of ``lm_score``: a unigram model cannot tell "the cat sat"
    from "sat the cat", while shuffled/templated word salad is exactly
    what the perplexity gate should catch (CCNet's KenLM is a 5-gram;
    a bigram is the first rung of that ladder and the last one whose
    model still fits a broadcast at web scale). Output: (doc_id,
    n_bigrams, avg_logprob, perplexity), one row per document with
    >= 2 tokens.

    Model contract (self-fit, engine-reproducible): p(t | prev) =
    (c(prev, t) + 1) / (c(prev) + V) with c(·) corpus bigram counts
    and V = the number of DISTINCT second-position tokens — a
    self-consistent add-one denominator derived from the same bigram
    aggregate (the true unigram vocabulary would need a second corpus
    explode; the constant only shifts all scores monotonically and the
    gate consumes relative ranks). Per-bigram ln p rounds to
    DECIMAL(18,6) before the exact per-doc sum — the ``lm_score``
    order-independence discipline.

    Scale shape: ONE text scan -> bigram explode -> (doc, bigram)
    counts with map-side combine -> bigram vocabulary and
    prev-totals derived from THAT aggregate (never a re-explode) ->
    per-bigram log-probs joined back (broadcast by default; pass
    ``broadcast_model=False`` when the bigram vocabulary outgrows a
    broadcast — the join becomes a bigram-keyed shuffle of (doc,
    bigram, tf) rows, never of text)."""
    df = spread_small_scan(df)  # heavy narrow map; no-op at scale
    toks = tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    grams = F.expr(
        "CASE WHEN size(__toks) < 2 THEN array() "
        "ELSE transform(sequence(2, size(__toks)), "
        "i -> struct(__toks[i-2] AS p, __toks[i-1] AS t)) END"
    )
    doc_bi = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(id_col, F.explode(grams).alias("__g"))
        .select(id_col, F.col("__g.p").alias("p"), F.col("__g.t").alias("t"))
        .groupBy(id_col, "p", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    bi_vocab = doc_bi.groupBy("p", "t").agg(F.sum("tf").alias("__c"))
    prev_tot = bi_vocab.groupBy("p").agg(F.sum("__c").alias("__cp"))
    totals = bi_vocab.agg(F.countDistinct("t").alias("__v"))
    lp = (
        bi_vocab.join(prev_tot, "p")
        .crossJoin(F.broadcast(totals))
        .select(
            "p",
            "t",
            F.round(
                F.log(
                    (F.col("__c") + 1).cast("double")
                    / (F.col("__cp") + F.col("__v")).cast("double")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("__lp"),
        )
    )
    model_side = F.broadcast(lp) if broadcast_model else lp
    agg = (
        doc_bi.join(model_side, ["p", "t"])
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(F.col("tf").cast("decimal(18,0)") * F.col("__lp")).alias(
                "__s"
            ),
        )
    )
    # same exact integer rounding as lm_score (see _avg6_expr)
    avg = _avg6_expr("__s", "n_bigrams")
    return agg.select(
        id_col,
        "n_bigrams",
        avg.alias("avg_logprob"),
        F.round(F.exp(-avg), 4).alias("perplexity"),
    ).orderBy(id_col)


def bm25_search(
    df: DataFrame,
    query_terms: "list[str]",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 keyword retrieval over the corpus: top-``k`` docs by
    BM25 score for ``query_terms`` — the lexical-search baseline every
    retrieval/RAG pipeline keeps next to its ANN index (hybrid search),
    and the standard relevance-ranking companion to
    ``tfidf_keywords``'s per-doc extraction.

    Formula (Robertson/Sparck-Jones with the Lucene non-negative idf):
    ``score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b +
    b*dl/avgdl))`` with ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``,
    ``dl`` the doc's token count and ``avgdl`` the corpus mean.

    Scale shape: tokens are lowercased whitespace terms; the per-doc
    scan keeps ONLY query-term token rows (the filter happens inside
    the projection, so the exploded frame is |matches|, not corpus
    tokens), one groupBy(doc, term) for tf, two tiny broadcast joins
    fold in df(t) and the (N, avgdl) scalars; final ranking is a
    TakeOrdered top-k, never a full sort. Determinism: per-term
    contributions round to 7 and sum as DECIMAL(25,8) (the
    order-independent float trick every avg in this module uses), so
    a DuckDB oracle reproduces scores bit-for-bit. Ties break
    (score DESC, id ASC); docs matching no term emit nothing."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    terms = sorted({t.lower() for t in query_terms if t})
    if not terms:
        raise ValueError("query_terms must contain at least one term")
    toks = tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    base = df.select(
        F.col(id_col), toks.alias("__toks")
    ).select(
        id_col,
        F.size("__toks").alias("__dl"),
        F.filter(
            F.col("__toks"), lambda t: t.isin(*terms)
        ).alias("__hits"),
    )
    # corpus scalars (N, avgdl) as a broadcast one-row frame — kept
    # LAZY (cross join) so the whole search is one plan and the corpus
    # is scanned once for stats and once for matches, with no driver
    # sync point between them
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        (
            F.coalesce(F.sum("__dl"), F.lit(0)).cast("double")
            / F.greatest(F.count(F.lit(1)), F.lit(1)).cast("double")
        ).alias("__avgdl"),
    )
    tf = (
        base.filter(F.size("__hits") > 0)
        .select(id_col, "__dl", F.explode("__hits").alias("__t"))
        .groupBy(id_col, "__dl", "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    dfreq = (
        tf.groupBy("__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    contrib = idf * (
        F.col("__tf") * F.lit(k1 + 1.0)
    ) / (
        F.col("__tf")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("__dl") / F.col("__avgdl")
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            F.round(contrib, 7).cast("decimal(25,8)").alias("__c"),
        )
        .groupBy(id_col)
        .agg(
            # round the EXACT decimal sum, then cast: a contrib sum can
            # land exactly on a .5e-4 boundary (margin audit r15 found
            # one live at sf0.01), where round-after-double-cast is
            # engine-implementation-defined; decimal rounding is
            # half-away-from-zero and exact in both engines
            F.round(F.sum("__c"), 4).cast("double").alias("score")
        )
    )
    return scored.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(k)


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
) -> DataFrame:
    """The Gopher quality-rule bundle (Rae et al. 2021, Table A1) —
    the canonical pre-training document filter downstream of
    language-ID: per-doc structural signals plus a ``passes`` verdict
    under the paper's default thresholds (every threshold a
    parameter). Complements the continuous ``quality_scores``
    composite with the hard gates production corpus pipelines
    (Gopher, RefinedWeb, Dolma) actually apply.

    Signals: word count bounds; mean word length bounds; symbol-to-
    word ratio ('#' characters and '...' occurrences per word);
    bullet-point line fraction; ellipsis-terminated line fraction;
    fraction of words containing an alphabetic character; and the two
    line-repetition signals — duplicate-line fraction (non-first
    occurrences over non-empty lines) and duplicate-line CHARACTER
    fraction (characters inside those repeated occurrences).

    Scale shape: pure JVM expressions over the token/line arrays —
    one narrow scan, no shuffle, no UDF, O(tokens + lines) per doc
    (the repetition signals reduce to distinct-count identities, not
    per-distinct rescans). All ratios round to 4 and ``passes`` is
    evaluated on the ROUNDED values, so a SQL oracle reproduces every
    verdict bit-for-bit."""
    df = spread_small_scan(df)  # heavy narrow map; no-op at scale
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = tokens_col(text)
    n_words = F.size(words)
    total_word_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.when(
        n_words > 0, total_word_chars.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    n_hash = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    n_ellipsis = (
        F.length(text)
        - F.length(F.regexp_replace(text, r"\.\.\.", ""))
    ) / F.lit(3)
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis).cast("double") / n_words
    ).otherwise(F.lit(0.0))
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda l: l.rlike(r"^[-*•]"),
            )
        ).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))
        ).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(
            F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))
        ).cast("double")
        / n_words,
    ).otherwise(F.lit(0.0))
    distinct_lines = F.array_distinct(lines)
    # non-first occurrences == n_lines - n_distinct (O(L), no
    # per-distinct rescan)
    dup_occurrences = n_lines - F.size(distinct_lines)
    dup_line_frac = F.when(
        n_lines > 0, dup_occurrences.cast("double") / n_lines
    ).otherwise(F.lit(0.0))
    total_line_chars = F.aggregate(
        lines, F.lit(0), lambda acc, l: acc + F.length(l)
    )
    # chars inside repeated occurrences == total - one copy of each
    # distinct line
    dup_chars = total_line_chars - F.aggregate(
        distinct_lines, F.lit(0), lambda acc, d: acc + F.length(d)
    )
    dup_line_char_frac = F.when(
        total_line_chars > 0,
        dup_chars.cast("double") / total_line_chars,
    ).otherwise(F.lit(0.0))

    out = df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_word_ratio"),
        F.round(bullet_frac, 4).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 4).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 4).alias("alpha_word_frac"),
        F.round(dup_line_frac, 4).alias("dup_line_frac"),
        F.round(dup_line_char_frac, 4).alias("dup_line_char_frac"),
    )
    passes = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_frac)
        & (F.col("alpha_word_frac") >= min_alpha_frac)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
    )
    return out.withColumn("passes", passes)


def script_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc Unicode SCRIPT composition — the triage signal next to
    ``language_id`` when corpora mix writing systems (a stopword vote
    cannot tell Cyrillic spam inside an English crawl, a script count
    can): fraction of script-classified letters in Latin / Cyrillic /
    Greek / Han / Arabic, plus digit and whitespace fractions over all
    chars, and the dominant script (argmax; ties break to the
    lexicographically-last script name, the ``language_id`` tie rule).

    Counts are length-difference regex counts over literal char-range
    classes (chars, not bytes — Spark ``length`` == DuckDB
    ``length``), pure codegen, one narrow scan, no shuffle; fractions
    round to 4. Docs with no script-classified letters report zero
    fractions and dominant_script NULL."""
    df = spread_small_scan(df)  # heavy narrow map; no-op at scale
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(text)

    def cnt(cls: str):
        return n_chars - F.length(F.regexp_replace(text, cls, ""))

    scripts = {
        "arabic": "[؀-ۿ]",
        "cyrillic": "[Ѐ-ӿ]",
        "greek": "[Ͱ-Ͽ]",
        "han": "[一-鿿]",
        "latin": "[A-Za-zÀ-ɏ]",
    }
    # STAGE the 7 regexp counts as named columns first: each count
    # feeds ~3 output expressions (its fraction, the letters sum, the
    # dominant argmax), and codegen's subexpression elimination does
    # NOT collapse the duplicated regexp_replace trees across a single
    # wide projection — measured ~2x the scan cost. Two narrow
    # projections evaluate each regexp exactly once.
    counted = df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        *[
            cnt(cls).cast("long").alias(f"__c_{name}")
            for name, cls in sorted(scripts.items())
        ],
        cnt("[0-9]").cast("long").alias("__c_digit"),
        cnt(r"\s").cast("long").alias("__c_ws"),
    )
    counts = {name: F.col(f"__c_{name}") for name in scripts}
    letters = None
    for name in sorted(scripts):
        c = counts[name]
        letters = c if letters is None else letters + c

    def frac(c):
        return F.round(
            F.when(letters > 0, c.cast("double") / letters).otherwise(
                F.lit(0.0)
            ),
            4,
        )

    dominant = F.when(
        letters > 0,
        F.array_max(
            F.array(
                *[
                    F.struct(
                        counts[name].alias("n"),
                        F.lit(name).alias("script"),
                    )
                    for name in sorted(scripts)
                ]
            )
        )["script"],
    )
    n_chars_col = F.col("n_chars")
    return counted.select(
        F.col(id_col),
        "n_chars",
        *[
            frac(counts[name]).alias(f"{name}_frac")
            for name in sorted(scripts)
        ],
        F.round(
            F.when(
                n_chars_col > 0,
                F.col("__c_digit").cast("double") / n_chars_col,
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("digit_frac"),
        F.round(
            F.when(
                n_chars_col > 0,
                F.col("__c_ws").cast("double") / n_chars_col,
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("whitespace_frac"),
        dominant.alias("dominant_script"),
    )


def vocab_coverage(
    df: DataFrame,
    cutoffs: "tuple[int, ...]" = (100, 1_000, 10_000),
    text_col: str = "text",
) -> DataFrame:
    """Top-V vocabulary COVERAGE curve: for each requested vocabulary
    size V, what fraction of all corpus tokens the V most frequent
    (lowercased whitespace) types cover — the tokenizer-budget /
    OOV-rate planning signal (BPE vocab sizing, stopword budgets,
    UNK-rate forecasts all read off this curve). One row per cutoff:
    (vocab_size, n_types, covered_tokens, total_tokens, total_types,
    coverage, oov_rate), ranked by count desc then term asc (total
    order -> deterministic cut).

    Scale shape: explode -> map-side-combined term counts (vocabulary-
    sized, not corpus-sized); the top-max(V) cut is a TakeOrdered
    (never a full vocab sort); the running-coverage window runs over
    that BOUNDED max(V)-row frame only; corpus totals are one scalar
    aggregate folded back by a broadcast cross join. Nothing driver-
    side, nothing proportional to the corpus."""
    if not cutoffs or any(int(v) < 1 for v in cutoffs):
        raise ValueError(f"cutoffs must be positive, got {cutoffs!r}")
    from pyspark.sql import Window

    cuts = sorted({int(v) for v in cutoffs})
    toks = tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    counts = (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("__c"))
    )
    totals = counts.agg(
        F.sum("__c").cast("long").alias("__t"),
        F.count("*").cast("long").alias("__types"),
    )
    top = counts.orderBy(F.col("__c").desc(), F.col("term").asc()).limit(
        cuts[-1]
    )
    w = Window.orderBy(F.col("__c").desc(), F.col("term").asc())
    ranked = top.select(
        "__c",
        F.row_number().over(w).alias("__r"),
        F.sum("__c")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__cum"),
    )
    spark = df.sparkSession
    cut_df = spark.createDataFrame(
        [(int(v),) for v in cuts], "vocab_size long"
    )
    per_cut = (
        ranked.join(
            F.broadcast(cut_df), F.col("__r") <= F.col("vocab_size")
        )
        .groupBy("vocab_size")
        .agg(
            F.max("__r").cast("long").alias("n_types"),
            F.max("__cum").cast("long").alias("covered_tokens"),
        )
    )
    cov = F.col("covered_tokens") / F.col("__t")
    return (
        per_cut.crossJoin(F.broadcast(totals))
        .select(
            "vocab_size",
            "n_types",
            "covered_tokens",
            F.col("__t").alias("total_tokens"),
            F.col("__types").alias("total_types"),
            F.round(cov, 6).alias("coverage"),
            F.round(
                (F.col("__t") - F.col("covered_tokens")) / F.col("__t"), 6
            ).alias("oov_rate"),
        )
        .orderBy("vocab_size")
    )


def vocab_drift(
    source: DataFrame,
    target: DataFrame,
    top_k: int = 100,
    eps: float = 1e-6,
    text_col: str = "text",
) -> DataFrame:
    """Term-distribution DRIFT between two corpora: PSI over the
    source's ``top_k`` most frequent (lowercased whitespace) types,
    tail folded into ``__other__`` — the text sibling of
    ``datadiff.psi_drift_categorical``, which it composes DIRECTLY on
    the exploded token frames (same eps floor, same rounding, same
    top-k total order), so the drift ladder reads the same for a
    column and for a corpus: a new-source ingestion shifting the
    vocabulary shows up exactly like a schema column shifting its
    category mix. Output: (term, n_source, n_target, frac_diff,
    psi_contrib); total PSI = SUM(psi_contrib).

    Scale shape: the explodes collapse into map-side-combined
    vocabulary-sized aggregates inside ``psi_drift_categorical``; the
    top-k cut is a TakeOrdered; output is O(top_k)."""
    from .datadiff import psi_drift_categorical

    def toks(df: DataFrame) -> DataFrame:
        return df.select(
            F.explode(
                tokens_col(
                    F.lower(F.coalesce(F.col(text_col), F.lit("")))
                )
            ).alias("term")
        )

    return psi_drift_categorical(
        toks(source), toks(target), "term", top_k=top_k, eps=eps
    ).withColumnRenamed("category", "term")


def c4_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_sentences: int = 3,
    badwords: "list[str] | None" = None,
    passthrough: bool = False,
) -> DataFrame:
    """The C4 cleaning-rule bundle (Raffel et al. 2020, JMLR 21(140)
    §2.2) — the OTHER canonical web-corpus filter next to
    ``gopher_rules``: C4 is line-level (keep/drop individual lines,
    then gate the page on what survives) where Gopher is document-
    level (score the page as a whole). Production pipelines (C4,
    Dolma's c4 variants, FineWeb's base filters) run exactly these
    heuristics, so the engine carries them as first-class signals.

    Line rules (a line is kept iff ALL hold):
    - ends in a terminal punctuation mark (``. ! ?`` optionally
      followed by a closing quote — the paper's "terminal punctuation
      mark" including end quotation marks);
    - has at least ``min_line_words`` whitespace words (paper: 5);
    - does not contain the word "javascript" (case-insensitive) — the
      boilerplate "enable javascript" tell.

    Page rules on the RETAINED text:
    - at least ``min_sentences`` sentences (paper: 3; sentences
      counted as terminal-punctuation occurrences in the kept lines);
    - the RAW page contains neither "lorem ipsum" (placeholder tell,
      case-insensitive) nor a curly bracket ``{`` (code tell);
    - no word from ``badwords`` appears as a whole word
      (case-insensitive; the paper uses the "List of Dirty, Naughty,
      Obscene or Otherwise Bad Words" — pass your list, default none).

    Output: one row per doc — ``n_lines``, ``n_kept_lines``,
    ``kept_text`` (retained lines joined by ``\\n``), ``n_sentences``,
    ``has_lorem_ipsum``, ``has_brace``, ``has_badword``, ``passes``.

    Scale shape: pure JVM array/regex expressions — one narrow scan,
    no shuffle, no UDF, O(lines + chars) per doc; every signal is
    integer/boolean so a SQL oracle replays the verdict bit-for-bit.
    """
    df = spread_small_scan(df)  # heavy narrow map; no-op at scale
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )

    def line_kept(l):
        ok = l.rlike(r"[.!?][\"”']?$") & (
            F.size(F.filter(F.split(l, _WS), lambda t: t != ""))
            >= min_line_words
        )
        return ok & ~F.lower(l).contains("javascript")

    kept = F.filter(lines, line_kept)
    kept_text = F.array_join(kept, "\n")
    # sentences = terminal-punct occurrences in the kept text (the
    # count survives the join because '\n' carries no punctuation)
    n_sentences = F.length(kept_text) - F.length(
        F.regexp_replace(kept_text, r"[.!?]", "")
    )
    lower_raw = F.lower(text)
    has_lorem = lower_raw.contains("lorem ipsum")
    has_brace = text.contains("{")
    if badwords:
        import re as _re

        # escape: list entries are WORDS, not patterns ('c++' must
        # match literally in the Java/RE2 common dialect)
        pat = "(?i)(^|[^a-z0-9])(" + "|".join(
            _re.escape(w)
            for w in sorted(
                {w.strip().lower() for w in badwords if w.strip()}
            )
        ) + ")($|[^a-z0-9])"
        has_badword = text.rlike(pat)
    else:
        has_badword = F.lit(False)
    sig = [
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        kept_text.alias("kept_text"),
        n_sentences.cast("long").alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        has_badword.alias("has_badword"),
    ]
    # passthrough keeps every original column next to the signals —
    # the curate pre-gate uses it to rewrite text in the SAME narrow
    # map (no id join-back, no shuffle)
    out = (
        df.select("*", *sig)
        if passthrough
        else df.select(F.col(id_col), *sig)
    )
    passes = (
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_lorem_ipsum")
        & ~F.col("has_brace")
        & ~F.col("has_badword")
    )
    return out.withColumn("passes", passes)
