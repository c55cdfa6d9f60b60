"""Link graph over a crawled corpus — outlinks, host graph, PageRank.

Beyond the reference surface (north-star crawl-pipeline operators):
once WARC ingestion lands pages (``sources/warc``), the next thing a
crawl/curation pipeline needs is the LINK STRUCTURE — which hosts point
at which, and a centrality score to prioritize the fetch frontier and
to weight domains in curation mixes (the Common Crawl host-level
ranking is exactly this shape: host graph + centrality).

Three composable stages, all JVM-side expressions:

- ``outlinks``: per-page ``<a href>`` targets from raw HTML — one
  ``regexp_extract_all`` + explode, no UDF, no parser: absolute
  http(s) links kept, root-relative links resolved against the page's
  own scheme+host, everything else (mailto:, javascript:, fragments,
  ./relative) dropped.
- ``host_graph``: (src_host, dst_host, n_links) — the host-level
  contraction; self-loops dropped by default (they dominate raw HTML
  and carry no ranking signal).
- ``pagerank_hosts``: fixed-iteration weighted PageRank without
  dangling-mass redistribution (the common simplification; dangling
  hosts keep the (1-d)/N floor).

PageRank determinism (the oracle contract): ranks live in INTEGER
PICO-UNITS (1e12 = rank 1.0) as BIGINTs — every aggregation is exact
integer arithmetic, immune to float summation order across shuffles.
The per-edge double math (rank·w/out, the damping blend) is a fixed
expression shape both engines evaluate identically on identical
operands, rounded to integer picos before each re-aggregation (the
``lm_score`` / ``_ratio6`` house discipline).

Scale shape: each iteration is one edge-sized shuffle join on src plus
one groupBy(dst) with map-side combine — O(iters · |edges|) total, no
driver-side state, no collect. The node frame (hosts) is tiny next to
the edge frame and next to the corpus; the edge frame itself is the
host-level contraction, orders of magnitude smaller than page-level
links. For big graphs persist/checkpoint the rank frame between
iterations to cut lineage depth; at the default 3 iterations the
unrolled lazy plan is fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PICO = 1_000_000_000_000  # rank 1.0 in integer pico-units

_HREF_RE = r'(?i)<a\s[^>]*href\s*=\s*["\']([^"\'<>]+)["\']'


def resolve_href_col(href, src_scheme, src_root):
    """The ONE href-resolution rule (shared by ``outlinks``'s exploded
    column path and ``warc.wat_metadata``'s array-lambda path, so the
    two can never drift): absolute http(s) targets pass through
    (fragment stripped), protocol-relative take the page scheme,
    root-relative resolve against scheme+host, anything else is NULL.
    Works on plain Columns AND lambda variables."""
    # browsers trim surrounding whitespace inside the quotes
    raw = F.trim(F.regexp_replace(href, r"#.*$", ""))
    return (
        F.when(F.lower(raw).rlike(r"^https?://"), raw)
        .when(raw.startswith("//"), F.concat(src_scheme, F.lit(":"), raw))
        .when(raw.startswith("/"), F.concat(src_root, raw))
    )


def src_scheme_root_cols(src_url):
    """(scheme, scheme://host) of a page URL — the resolution context
    ``resolve_href_col`` needs."""
    scheme = F.lower(
        F.regexp_extract(src_url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    root = F.concat(
        scheme,
        F.lit("://"),
        F.regexp_extract(
            src_url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1
        ),
    )
    return scheme, root


def outlinks(
    df: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, src_url, dst_url) for every resolvable ``<a href>`` in the
    page HTML. Absolute http(s) targets pass through (fragment
    stripped); root-relative (``/path``) targets resolve against the
    page's scheme+host; protocol-relative (``//host/p``) targets take
    the page's scheme; anything else is dropped. Pure codegen — one
    regexp scan per page, explode, filters."""
    src_scheme, src_root = src_scheme_root_cols(F.col("src_url"))
    resolved = resolve_href_col(F.col("__href"), src_scheme, src_root)
    return (
        df.select(
            F.col(id_col),
            F.col(url_col).alias("src_url"),
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(_HREF_RE), F.lit(1)
                )
            ).alias("__href"),
        )
        .select(
            id_col, "src_url", resolved.alias("dst_url")
        )
        .filter(F.col("dst_url").isNotNull() & (F.col("dst_url") != ""))
    )


_ANCHOR_RE = (
    r'(?is)<a\s[^>]*href\s*=\s*["\']([^"\'<>]+)["\'][^>]*>(.*?)</a>'
)


def anchor_texts(
    df: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    top_k: int = 5,
    max_len: int = 100,
) -> DataFrame:
    """Incoming anchor texts per link TARGET — the classic off-page
    relevance signal (what other pages call this URL): ``(dst_url,
    n_inlinks, n_anchor_texts, top_anchors)`` where ``top_anchors``
    is the ``top_k`` distinct anchor strings by frequency
    (count desc, text asc — a total order).

    Extraction is two ``regexp_extract_all`` passes over the SAME
    anchor pattern — group 1 (href) and group 2 (inner text) — so the
    arrays are position-aligned by construction and ``arrays_zip``
    pairs them without a parse; hrefs resolve through the shared
    ``resolve_href_col`` rule, inner HTML strips to text, whitespace
    collapses, and anchors truncate to ``max_len`` (a 100 TB corpus
    carries pathological anchor bodies). Self-links (target == source
    page) are dropped — a page's own navigation is not testimony
    about it. Shuffle = one (dst, anchor) count + one dst rollup,
    both map-side combined; payloads never move."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    # resolution context derives from the RENAMED source column — the
    # pair frame has already projected url_col away
    src_scheme, src_root = src_scheme_root_cols(F.col("__src"))
    hrefs = F.regexp_extract_all(
        F.col(text_col), F.lit(_ANCHOR_RE), F.lit(1)
    )
    texts = F.regexp_extract_all(
        F.col(text_col), F.lit(_ANCHOR_RE), F.lit(2)
    )
    pairs = (
        df.select(
            F.col(url_col).alias("__src"),
            F.explode(F.arrays_zip(hrefs.alias("h"), texts.alias("t")))
            .alias("__p"),
        )
        .select(
            "__src",
            resolve_href_col(
                F.col("__p.h"), src_scheme, src_root
            ).alias("dst_url"),
            F.substring(
                F.trim(
                    F.regexp_replace(
                        F.regexp_replace(F.col("__p.t"), r"<[^>]*>", " "),
                        r"\s+",
                        " ",
                    )
                ),
                1,
                max_len,
            ).alias("__anchor"),
        )
        .filter(
            F.col("dst_url").isNotNull()
            & (F.col("dst_url") != "")
            & (F.col("dst_url") != F.col("__src"))
        )
    )
    counted = pairs.groupBy("dst_url", "__anchor").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    ranked = counted.withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy("dst_url").orderBy(
                F.col("__n").desc(), F.col("__anchor").asc()
            )
        ),
    )
    return (
        ranked.groupBy("dst_url")
        .agg(
            F.sum("__n").cast("long").alias("n_inlinks"),
            F.count(F.lit(1)).cast("long").alias("n_anchor_texts"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("__rk") <= top_k,
                        F.struct("__rk", F.col("__anchor")),
                    )
                )
            ).alias("__top"),
        )
        .select(
            "dst_url",
            "n_inlinks",
            "n_anchor_texts",
            F.transform(F.col("__top"), lambda s: s["__anchor"]).alias(
                "top_anchors"
            ),
        )
    )


def host_graph(
    links: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    strip_www: bool = False,
    keep_self_loops: bool = False,
) -> DataFrame:
    """Host-level contraction: (src_host, dst_host, n_links BIGINT).
    Hosts lowercase via ``urltools.host_col``; rows whose either side
    has no extractable host are dropped; self-loops dropped unless
    ``keep_self_loops``."""
    from .urltools import host_col

    e = links.select(
        host_col(F.col(src_col), strip_www=strip_www).alias("src_host"),
        host_col(F.col(dst_col), strip_www=strip_www).alias("dst_host"),
    ).filter(
        (F.col("src_host") != "") & (F.col("dst_host") != "")
    )
    if not keep_self_loops:
        e = e.filter(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_links")
    )


def pagerank_hosts(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "n_links",
    checkpoint_every: int = 0,
    dangling: bool = False,
    tol_p: "int | None" = None,
    history: "list | None" = None,
) -> DataFrame:
    """Weighted PageRank over the host graph: ``(host, rank_p, rank)``
    where ``rank_p`` is the exact integer pico-unit rank (the oracle
    unit) and ``rank = rank_p / 1e12`` (one IEEE division).

    ``r_{i+1}(v) = (1-d)/N + d · Σ_{u→v} r_i(u) · w(u,v) / out(u)``,
    ``iters`` iterations unrolled into one lazy plan by default. Every
    per-edge term is rounded to integer picos before the exact BIGINT
    re-aggregation, so results are bit-identical across partitionings
    and engines.

    The defaults keep the documented simplifications (fixed 3
    iterations, no dangling redistribution, pure lazy unroll) and the
    exact plan the oracle certifies. The CONVERGENCE ARM (VERDICT r13
    #4) makes real 20+-iteration host rankings practical:

    - ``checkpoint_every=N``: ``localCheckpoint`` (persist + lineage
      truncation) every N iterations, so the unrolled plan never grows
      past N edge-joins — without it, 20 iterations compile a
      20-deep join tree per stage.
    - ``dangling=True``: hosts with no outgoing edge redistribute
      their rank mass uniformly (the textbook correction), computed as
      one tiny left-anti aggregate per iteration, its per-node share
      rounded to integer picos so the arithmetic stays exact; total
      mass is then conserved at ~1e12 picos instead of leaking. This
      arm materializes the rank frame every iteration
      (``localCheckpoint``) because each step references it twice —
      left lazy that doubles the unrolled plan per iteration.
    - ``tol_p=K`` + ``history=[]``: per-iteration delta stat
      ``Σ_v |r_{i+1}(v) − r_i(v)|`` in picos, appended to ``history``
      (observability) and compared against ``tol_p`` for early stop.
      Delta tracking materializes each iteration (localCheckpoint), so
      the delta join reads two cached host frames, never recomputes
      the chain."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    d = float(damping)
    track = tol_p is not None or history is not None
    # a zero/negative weight would make out(u) zero -> inf contribution
    # -> ANSI long-cast abort mid-job; gate it here, fail-fast shape.
    # The edge/node/weighted-edge frames are each referenced by EVERY
    # unrolled iteration (plus r0), so materialize them once (lazy
    # localCheckpoint: computed at the first action, cached partitions
    # after) — r15: left lazy, a 3-iteration run re-derived the whole
    # upstream edge lineage ~15x in one plan (82 Exchanges / 184 KB
    # formatted plan for the synth-backed host_pagerank query; 8
    # Exchanges / ~8 KB materialized), and at real scale re-running
    # the corpus-wide outlink contraction per iteration is exactly the
    # "persist the edge frame" cost the module docstring prices.
    edges = edges.filter(F.col(weight_col) > 0).localCheckpoint(
        eager=False
    )
    nodes = (
        edges.select(F.col(src_col).alias("host"))
        .union(edges.select(F.col(dst_col).alias("host")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_frame = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    out = edges.groupBy(src_col).agg(
        F.sum(weight_col).cast("double").alias("__out")
    )
    e = edges.join(out, src_col).select(
        F.col(src_col).alias("__src"),
        F.col(dst_col).alias("__dst"),
        F.col(weight_col).cast("double").alias("__w"),
        "__out",
    ).localCheckpoint(eager=False)
    # r0 = round(1e12 / N) picos
    r = nodes.crossJoin(F.broadcast(n_frame)).select(
        "host",
        F.round(F.lit(float(PICO)) / F.col("__n"))
        .cast("long")
        .alias("rank_p"),
    )
    # the damped share: plain Σ contribs by default; with dangling
    # redistribution the per-node dangling share (integer picos) adds
    # into the exact sum BEFORE the one double blend
    inflow = (
        (F.col("__s") + F.col("__dang_share"))
        if dangling
        else F.col("__s")
    )
    base = F.round(
        F.lit((1.0 - d) * float(PICO)) / F.col("__n")
        + F.lit(d) * inflow.cast("double")
    ).cast("long")
    out_hosts = out.select(F.col(src_col).alias("host"))
    for i in range(iters):
        contrib = e.join(r, e["__src"] == r["host"]).select(
            F.col("__dst").alias("host"),
            F.round(
                F.col("rank_p").cast("double") * F.col("__w") / F.col("__out")
            )
            .cast("long")
            .alias("__c"),
        )
        s = contrib.groupBy("host").agg(F.sum("__c").alias("__s"))
        r_new = (
            nodes.join(s, "host", "left")
            .crossJoin(F.broadcast(n_frame))
            .select(
                "host",
                F.coalesce("__s", F.lit(0).cast("long")).alias("__s"),
                "__n",
            )
        )
        if dangling:
            dang = r.join(out_hosts, "host", "left_anti").agg(
                F.coalesce(F.sum("rank_p"), F.lit(0))
                .cast("long")
                .alias("__dang")
            )
            r_new = r_new.crossJoin(F.broadcast(dang)).withColumn(
                "__dang_share",
                F.round(F.col("__dang").cast("double") / F.col("__n"))
                .cast("long"),
            )
        r_new = r_new.select("host", base.alias("rank_p"))
        # dangling references r TWICE per step (contrib join + the
        # left-anti mass aggregate): left lazy, the unrolled plan
        # would double per iteration (2^iters subtree copies — a
        # driver-side analysis blow-up long before any job runs), so
        # the dangling arm materializes every iteration
        if (
            track
            or dangling
            or (checkpoint_every and (i + 1) % checkpoint_every == 0)
        ):
            r_new = r_new.localCheckpoint(eager=True)
        if track:
            delta = (
                r_new.join(
                    r.select("host", F.col("rank_p").alias("__prev")),
                    "host",
                )
                .agg(
                    F.coalesce(
                        F.sum(F.abs(F.col("rank_p") - F.col("__prev"))),
                        F.lit(0),
                    ).cast("long")
                )
                .collect()[0][0]
            )
            if history is not None:
                history.append(int(delta))
            r = r_new
            if tol_p is not None and delta <= int(tol_p):
                break
        else:
            r = r_new
    return r.select(
        "host",
        "rank_p",
        (F.col("rank_p").cast("double") / F.lit(float(PICO))).alias("rank"),
    )
