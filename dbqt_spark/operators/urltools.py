"""URL canonicalization + the URL-level dedup tier.

Beyond the reference surface (north star). Crawl corpora dedup on the
CANONICAL URL before any content tier runs: the same page arrives as
``HTTP://WWW.Example.com:80/a/?utm_source=x#frag`` and
``http://www.example.com/a``, and content-tier machinery (MinHash,
SimHash, SemDeDup) should never pay to rediscover what the URL alone
proves. The canonical form here follows RFC 3986 §6 normalization plus
the crawl-pipeline conventions (tracking-parameter stripping, a fixed
trailing-slash policy, deterministic query-parameter ordering):

1. scheme and host lowercase (RFC 3986 §6.2.2.1); userinfo drops;
2. default ports drop (``:80`` for http, ``:443`` for https);
3. the fragment drops (never sent to the server);
4. tracking parameters drop (``utm_*``, click ids, mail-campaign ids
   — ``TRACKING_PARAMS``), surviving parameters SORT lexicographically
   (parameter order is almost never semantic; sorting makes two
   orderings one URL);
5. trailing slashes strip from the path (``/a/`` == ``/a``; the root
   path collapses to none).

Everything is pure JVM string/regex work in the Java-regex/RE2 common
dialect — no UDF, no ``java.net.URI`` driver round-trip — so the
canonical form is engine-portable and the DuckDB oracle replays it
byte-for-byte, and at 100 TB the canonicalization is a narrow map
fused into the scan. A string that does not parse as
``scheme://authority...`` passes through trimmed-only (opaque ids,
relative paths): canonicalization must never manufacture collisions
out of non-URLs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the tracking/click-id parameter names every major pipeline strips
# (lowercased compare; utm_* is matched as a prefix). Only UNAMBIGUOUS
# click/campaign ids live here — names that are sometimes semantic
# (``ref`` is a branch on code hosts, a post ref on forums) are the
# aggressive opt-in below (r12 ADVICE: default canonicalization must
# never merge genuinely different pages).
TRACKING_PARAMS = (
    "gclid", "gbraid", "wbraid", "fbclid", "msclkid", "yclid",
    "igshid", "mc_cid", "mc_eid", "_ga", "_gl",
)

# frequently-tracking-but-sometimes-semantic names, stripped only with
# strip_ref=True (the strip_www-style aggressive policy)
AGGRESSIVE_TRACKING_PARAMS = ("ref", "ref_src")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _host_port_col(u: Column) -> Column:
    """Lowercased authority minus userinfo ("host" or "host:port") —
    the ONE extraction chain canonical form and host grouping share."""
    auth = F.regexp_extract(u, _SCHEME_RE + r"([^/?#]*)", 2)
    return F.lower(F.regexp_replace(auth, r"^[^@]*@", ""))


def _host_of(host_port: Column, strip_www: bool) -> Column:
    host = F.regexp_replace(host_port, r":[0-9]*$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return host


def canonical_url_col(
    url, strip_www: bool = False, strip_ref: bool = False
) -> Column:
    """Canonical form of a URL column/name (see module docstring).
    ``strip_www`` additionally drops a leading ``www.`` host label —
    the aggressive crawl-dedup policy, off by default because
    ``www.`` and apex CAN serve different content. ``strip_ref``
    additionally drops ``AGGRESSIVE_TRACKING_PARAMS`` (``ref``,
    ``ref_src``) — off by default because ``ref`` is often semantic
    (a branch name, a forum post id)."""
    u = F.trim(url if isinstance(url, Column) else F.col(url))
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host_port = _host_port_col(u)
    host = _host_of(host_port, strip_www)
    port = F.regexp_extract(host_port, r":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    # path = after authority, up to ? or #; trailing slashes strip
    path = F.regexp_replace(
        F.regexp_extract(u, _SCHEME_RE + r"[^/?#]*([^?#]*)", 2),
        r"/+$",
        "",
    )
    # query = between ? and #/end; params split, tracking params drop
    # (utm_* prefix + the TRACKING_PARAMS names, compared on the
    # lowercased name), survivors sort lexicographically
    qs = F.regexp_extract(u, r"\?([^#]*)", 1)
    drop_names = TRACKING_PARAMS + (
        AGGRESSIVE_TRACKING_PARAMS if strip_ref else ()
    )
    names = F.array(*[F.lit(p) for p in drop_names])
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "")
        & ~F.startswith(F.lower(p), F.lit("utm_"))
        & ~F.array_contains(
            names, F.lower(F.regexp_extract(p, r"^([^=]*)", 1))
        ),
    )
    query = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(""),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(""),
    )
    # non-URL strings pass through trimmed-only
    return F.when(scheme != "", canon).otherwise(u)


def url_canonicalize(
    df: DataFrame,
    url_col: str = "url",
    out_col: "str | None" = None,
    strip_www: bool = False,
    strip_ref: bool = False,
) -> DataFrame:
    """Append (or replace) the canonical URL column."""
    return df.withColumn(
        out_col or url_col,
        canonical_url_col(
            F.col(url_col), strip_www=strip_www, strip_ref=strip_ref
        ),
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    strip_www: bool = False,
    strip_ref: bool = False,
    pre_canonicalized: bool = False,
) -> DataFrame:
    """Keep the min-id row per CANONICAL-URL group — the exact-dedup
    first-wins contract (``dedup.dedup_exact``), keyed on the
    canonical URL instead of a content hash, with ``n_dups`` (group
    size) appended to each survivor for drop accounting. Same scale
    shape as dedup_exact: one map-side-combinable groupBy on the
    canonical key + a semi-join-shaped inner join back — no window,
    no per-group sort. ``pre_canonicalized=True`` skips the
    (idempotent but ~40-regex) canonicalization when ``url_col``
    already holds ``url_canonicalize`` output — don't pay the chain
    twice in a canonicalize-then-dedup pipeline.

    NULL-url rows are NOT duplicates of each other (no url is no
    signal, not the same signal): every one survives with
    ``n_dups=1`` (r12 ADVICE — the plain equi-join silently dropped
    them, losing real content with no accounting)."""
    from ..utils import spread_small_scan

    df = spread_small_scan(df)  # ~40-regex canon map; no-op at scale
    cu = df.withColumn(
        "__cu",
        F.col(url_col)
        if pre_canonicalized
        else canonical_url_col(
            F.col(url_col), strip_www=strip_www, strip_ref=strip_ref
        ),
    )
    keepers = (
        cu.filter(F.col("__cu").isNotNull())
        .groupBy("__cu")
        .agg(
            F.min(id_col).alias("__keep"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
        .withColumnRenamed("__cu", "__kcu")
    )
    survivors = (
        cu.join(
            keepers,
            (cu["__cu"] == keepers["__kcu"])
            & (cu[id_col] == keepers["__keep"]),
            "inner",
        )
        .drop("__cu", "__kcu", "__keep")
    )
    null_rows = (
        cu.filter(F.col("__cu").isNull())
        .drop("__cu")
        .withColumn("n_dups", F.lit(1).cast("long"))
    )
    return survivors.unionByName(null_rows)


def host_col(url, strip_www: bool = False) -> Column:
    """Lowercase host of a URL column/name (userinfo and port
    stripped; empty string for non-URLs) — the grouping key for
    domain-level corpus policy. Shares the extraction chain with
    ``canonical_url_col``, so the two can never disagree on what a
    URL's host is."""
    u = F.trim(url if isinstance(url, Column) else F.col(url))
    return _host_of(_host_port_col(u), strip_www)


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    text_col: "str | None" = None,
    strip_www: bool = True,
) -> DataFrame:
    """Per-DOMAIN corpus composition — the report behind domain-level
    curation policy (top-domain caps, per-domain mixture weights,
    single-domain-dominance alarms every crawl pipeline runs before
    training): (host, n_docs, n_urls, doc_share) plus, with
    ``text_col``, exact-decimal n_chars_total / avg_chars. ``n_urls``
    counts DISTINCT canonical URLs (``canonical_url_col``), so
    tracking-param spam inflates n_docs but not n_urls — the gap
    between the two IS the URL-dup signal per domain. Non-URL rows
    group under the empty host.

    Scale shape: one groupBy(host) with map-side combine (distinct
    canonical URLs partial-aggregate per host); the corpus total
    folds back as a broadcast scalar for doc_share — no window, one
    shuffle on the host key."""
    h = host_col(F.col(url_col), strip_www=strip_www)
    base = df.withColumn("__h", h).withColumn(
        "__cu", canonical_url_col(F.col(url_col), strip_www=strip_www)
    )
    from .textstats import _ratio6_wide_expr

    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("__cu").cast("long").alias("n_urls"),
    ]
    if text_col is not None:
        aggs.append(
            F.sum(F.length(text_col).cast("decimal(38,0)"))
            .cast("long")
            .alias("n_chars_total")
        )
    grouped = base.groupBy(F.col("__h").alias("host")).agg(*aggs)
    if text_col is not None:
        # integer micro-unit rounding (wide arm): a double round() of
        # sum/count diverges across engines on .5e-6 quotient
        # boundaries, and per-domain char totals outgrow the int64
        # micro-unit trick
        grouped = grouped.withColumn(
            "avg_chars", _ratio6_wide_expr("n_chars_total", "n_docs")
        )
    total = base.agg(
        F.count(F.lit(1)).cast("long").alias("__total")
    )
    return (
        grouped.crossJoin(F.broadcast(total))
        .withColumn(
            "doc_share", _ratio6_wide_expr("n_docs", "__total")
        )
        .drop("__total")
        .orderBy(F.desc("n_docs"), "host")
    )


def frontier_schedule(
    df: DataFrame,
    url_col: str = "url",
    priority_col: "str | None" = None,
    delays_df: "DataFrame | None" = None,
    default_delay: float = 1.0,
    strip_www: bool = False,
) -> DataFrame:
    """Politeness-aware fetch schedule: every URL gets its host's
    fetch ``wave`` (1, 2, 3, ... — one fetch per host per wave) and a
    ``fetch_after_sec`` offset = (wave - 1) x the host's crawl delay.
    Higher ``priority_col`` fetches earlier within its host (PageRank
    from ``linkgraph.pagerank_hosts`` is the natural input); ties and
    the no-priority case break on the URL string, so the schedule is
    a pure function of the frontier.

    ``delays_df`` is a (host, crawl_delay) frame — the
    ``robots.robots_directives`` output — joined BROADCAST (per-host
    policy is tiny); hosts it doesn't name use ``default_delay``.

    Scale shape: ONE window per host. Per-host ordering is not
    overhead to engineer away — politeness makes fetches within a
    host inherently sequential, so a per-host total order is the
    OUTPUT, not an implementation detail. A mega-host's partition
    sorts in one task; cap per-host frontier size first
    (``sampling.stratified_sample`` / group caps) when a single host
    dominates the frontier."""
    from pyspark.sql.window import Window

    host = host_col(F.col(url_col), strip_www=strip_www)
    keyed = df.withColumn("host", host)
    order = (
        [F.col(priority_col).desc_nulls_last(), F.col(url_col).asc()]
        if priority_col
        else [F.col(url_col).asc()]
    )
    wave = F.row_number().over(
        Window.partitionBy("host").orderBy(*order)
    )
    out = keyed.withColumn("wave", wave)
    if delays_df is not None:
        d = delays_df.select(
            F.col("host").alias("__dhost"),
            F.col("crawl_delay").alias("__delay"),
        )
        out = out.join(
            F.broadcast(d), out["host"] == d["__dhost"], "left"
        ).drop("__dhost")
    else:
        out = out.withColumn("__delay", F.lit(None).cast("double"))
    return out.withColumn(
        "fetch_after_sec",
        (F.col("wave") - 1).cast("double")
        * F.coalesce(F.col("__delay"), F.lit(float(default_delay))),
    ).drop("__delay")


def sitemap_urls(
    df: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
) -> DataFrame:
    """URL discovery from sitemap XML documents (sitemaps.org): one
    row per ``<loc>`` entry — ``(src_url, loc, is_index)`` where
    ``is_index`` marks sitemap INDEX files (their locs are more
    sitemaps to fetch, not pages). The natural chain is
    ``robots.robots_directives`` (which sitemaps exist) -> fetch ->
    this (what they list) -> ``frontier_schedule``.

    One case-insensitive regexp scan per document + explode — no XML
    parser dependency, which also makes it robust to the truncated /
    malformed XML real crawls return; entity-encoded ampersands
    (``&amp;`` — required by the spec inside XML) are decoded."""
    locs = F.regexp_extract_all(
        F.col(text_col),
        F.lit(r"(?is)<loc>\s*([^<]+?)\s*</loc>"),
        F.lit(1),
    )
    is_index = F.coalesce(
        F.col(text_col).rlike(r"(?is)<\s*sitemapindex"), F.lit(False)
    )
    return (
        df.select(
            F.col(url_col).alias("src_url"),
            is_index.alias("is_index"),
            F.explode(locs).alias("__loc"),
        )
        .select(
            "src_url",
            F.regexp_replace("__loc", r"&amp;", "&").alias("loc"),
            "is_index",
        )
        .filter(F.col("loc") != "")
    )


def surt_col(url) -> Column:
    """SURT form of a URL column/name (Sort-friendly URI Reordering
    Transform — the public key ordering behind web-archive CDX
    indexes, e.g. ``http://www.Example.com:80/A/b?y=2&x=1`` ->
    ``com,example,www)/a/b?x=1&y=2``): scheme and userinfo drop,
    host lowercases and its labels REVERSE comma-joined (so one
    registrable domain and all its subdomains are one contiguous key
    RANGE — the property that turns "every page under example.com"
    into a range predicate a sorted/bucketed layout can prune),
    default ports drop (others kept ``:port``), path lowercases but
    otherwise keeps its form — a root URL keys as ``com,example)/``
    and ``/a/b/`` stays ``/a/b/``, matching the public SURT/CDXJ
    convention (Common Crawl / OpenWayback) so keys range-match
    external CDX indexes (ADVICE r14; trailing slashes were
    previously stripped) — query parameters lowercase and sort (no
    tracking-strip — an INDEX must stay faithful to what was fetched;
    that aggressive policy belongs to ``canonical_url_col``),
    fragment drops. Non-URLs yield NULL (no index key). Pure JVM
    split/reverse/sort expressions — fused into the scan like the
    canonicalizer."""
    u = F.trim(url if isinstance(url, Column) else F.col(url))
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host_port = _host_port_col(u)
    host = F.regexp_replace(host_port, r":[0-9]*$", "")
    port = F.regexp_extract(host_port, r":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    raw_path = F.lower(
        F.regexp_extract(u, _SCHEME_RE + r"[^/?#]*([^?#]*)", 2)
    )
    # conventional root form: pathless URL -> ")/"; otherwise the
    # (lowercased) path keeps its trailing-slash form verbatim
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    # strip the fragment BEFORE extracting the query: a '?' inside the
    # fragment ('/#/x?tab=1', the SPA pattern) is not a query, and two
    # captures differing only in fragment must share one index key
    qs = F.lower(
        F.regexp_extract(
            F.regexp_replace(u, r"#.*$", ""), r"\?(.*)$", 1
        )
    )
    query = F.array_join(
        F.array_sort(F.filter(F.split(qs, "&"), lambda p: p != "")), "&"
    )
    surt = F.concat(
        rev_host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(""),
        F.lit(")"),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(""),
    )
    return F.when(
        (scheme != "") & (host != ""), surt
    ).otherwise(F.lit(None).cast("string"))


def expand_sitemaps(
    df: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    max_depth: int = 2,
) -> DataFrame:
    """Close the sitemap-INDEX indirection (VERDICT r13 #3): one row
    per DISCOVERED URL per root sitemap — ``(root_url, loc, depth,
    is_sitemap)``. ``sitemap_urls`` flags index files; this resolves
    their locs against sitemap documents PRESENT IN THE CORPUS (the
    crawl fetched them too), so ``<sitemapindex>`` -> child urlset ->
    page locs flattens without a driver loop. ``depth`` counts sitemap
    hops (1 = listed directly by the root); ``is_sitemap`` marks locs
    that still point at a sitemap — the child was not in the corpus,
    or the walk hit ``max_depth`` — i.e. the residue a crawler still
    has to fetch. The spec's reality is one level of index
    (sitemapindex files may not nest), so the default depth 2 closes
    compliant sites; raise it for the non-compliant tail.

    Scale shape: only SITEMAP documents participate — ``sitemap_urls``
    contracts the corpus to its sitemap sliver in one scan, and each
    unrolled level is one small equi-join of that sliver against
    itself on the canonical URL (the ``resolve_redirects`` fixed-hop
    discipline: no driver loop over data, no recursion state). The
    unrolled plan references the extraction subtree once per level, so
    at scale feed this a MATERIALIZED frame (the parquet crawl, or
    ``.persist()`` the parse output)."""
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    # distinct: a refetched sitemap (two captures across segments — the
    # normal WARC case) must not double every loc it lists, at every
    # expansion level (the resolve_redirects edge-dedup discipline)
    sm = sitemap_urls(df, text_col=text_col, url_col=url_col).distinct()
    child = sm.select(
        canonical_url_col(F.col("src_url")).alias("__csrc"),
        F.col("loc").alias("__cloc"),
        F.col("is_index").alias("__cidx"),
    )
    state = sm.select(
        F.col("src_url").alias("root_url"),
        "loc",
        F.col("is_index").alias("__pending"),
        F.lit(1).cast("int").alias("depth"),
    )
    for _ in range(max_depth - 1):
        settled = state.filter(~F.col("__pending"))
        open_ = state.filter(F.col("__pending"))
        expanded = open_.join(
            child,
            canonical_url_col(F.col("loc")) == child["__csrc"],
            "left",
        ).select(
            "root_url",
            F.coalesce("__cloc", "loc").alias("loc"),
            # child missing from the corpus: the loc stays an
            # unresolved sitemap pointer; found: pending iff the child
            # is itself an index
            F.when(F.col("__cloc").isNull(), F.lit(True))
            .otherwise(F.col("__cidx"))
            .alias("__pending"),
            (
                F.col("depth")
                + F.when(F.col("__cloc").isNotNull(), 1).otherwise(0)
            )
            .cast("int")
            .alias("depth"),
        )
        state = settled.unionByName(expanded)
    return state.select(
        "root_url",
        "loc",
        "depth",
        F.col("__pending").alias("is_sitemap"),
    )


def resolve_redirects(
    df: DataFrame,
    url_col: str = "url",
    target_col: str = "redirect_to",
    max_hops: int = 4,
) -> DataFrame:
    """Redirect-chain resolution over a crawl: ``(url, final_url,
    n_hops, terminal)`` for every row — ``final_url`` follows the
    Location edges up to ``max_hops``; ``terminal`` is false when the
    walk stopped at the cap with an edge still outgoing (a longer
    chain or a loop), OR when the walk ENDS at a page whose Location
    was non-empty but UNRESOLVABLE (a ``mailto:`` target, a relative
    target on a non-URL source — r13 ADVICE: a real redirect must not
    masquerade as a terminal page, whether it is the row's own
    Location or one the chain lands on; callers can distinguish
    "page" from "redirect we could not follow"). Rows whose target is NULL/empty resolve to
    themselves in 0 hops. Relative Location values — all RFC 9110
    allows: root-relative ``/path``, protocol-relative ``//host/p``,
    path-relative ``next.html`` and query-only ``?q=1`` — resolve
    against the source URL (path-relative merges into the source's
    directory per RFC 3986 §5.3; dot segments are NOT normalized —
    ``../`` survives literally, a documented simplification).

    The redirect map is the canonical-URL companion: two spellings
    that 301 to the same place are the same page even when the
    canonicalizer cannot know it.

    Scale shape: the EDGE frame (3xx rows only — a few percent of a
    crawl) is the only thing that shuffles; each hop is one
    edges-sized equi-join unrolled ``max_hops`` times (the
    ``pagerank_hosts`` fixed-iteration discipline — no driver loop
    over data, no recursion state). The unrolled plan references the
    edge subtree ``max_hops + 1`` times, so at scale feed this a
    MATERIALIZED frame (the parquet crawl, or ``.persist()`` the
    parse output) — resolving straight off a raw WARC parse would
    re-run the Python parse once per hop."""
    u = F.col(url_col)
    raw_t = F.trim(F.col(target_col))
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    root = F.concat(
        scheme,
        F.lit("://"),
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1),
    )
    # source minus query/fragment, and its directory (everything up to
    # and including the last path slash) — the RFC 3986 §5.3 merge base
    src_nofq = F.regexp_replace(u, r"[?#].*$", "")
    has_path = src_nofq.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*/")
    src_dir = F.when(
        has_path,
        F.concat(F.regexp_replace(src_nofq, r"/[^/]*$", ""), F.lit("/")),
    ).otherwise(F.concat(root, F.lit("/")))
    is_url = scheme != ""
    resolved_t = (
        F.when(F.lower(raw_t).rlike(r"^https?://"), raw_t)
        .when(
            raw_t.startswith("//") & is_url,
            F.concat(scheme, F.lit(":"), raw_t),
        )
        .when(raw_t.startswith("/") & is_url, F.concat(root, raw_t))
        .when(raw_t.startswith("?") & is_url, F.concat(src_nofq, raw_t))
        .when(
            is_url
            & (raw_t != "")
            & ~raw_t.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:")
            & ~raw_t.startswith("#"),
            F.concat(src_dir, raw_t),
        )
    )
    edges = (
        df.select(u.alias("__src"), resolved_t.alias("__dst"))
        .filter(F.col("__dst").isNotNull() & (F.col("__dst") != F.col("__src")))
        # one outgoing edge per URL; a refetch with a DIFFERENT
        # Location picks the lexically-greatest target — an arbitrary
        # but DETERMINISTIC tiebreak (dropDuplicates would depend on
        # partition order)
        .groupBy("__src")
        .agg(F.max("__dst").alias("__dst"))
        # the walk references this frame max_hops + 1 times (one join
        # per hop + the __more probe); left lazy, EVERY reference
        # re-runs the one-edge-per-URL aggregate — at scale that is
        # max_hops + 1 full shuffles of the 3xx frame for one answer.
        # Lazy localCheckpoint: the aggregate runs once at the first
        # action, every later reference reads cached partitions (the
        # PageRank shared-frame discipline, r15 item 2 / VERDICT #4).
        .localCheckpoint(eager=False)
    )
    # URLs whose (non-empty) Location could not be resolved: real
    # redirects the walk cannot follow. A row ENDING anywhere in this
    # set — its own row, or a chain that lands on such a page — must
    # not report terminal=true (a real redirect masquerading as a
    # landing page). Tiny frame (broken-redirect rows only); one extra
    # small left join at the end.
    unres_urls = (
        df.filter(
            F.col(target_col).isNotNull()
            & (raw_t != "")
            # a fragment-only Location ('#section') is a same-document
            # pointer, not a redirect the walk failed to follow — it
            # resolves to self as a terminal page (ADVICE r14), so
            # mirror the '#' exclusion used by the resolution arms
            & ~raw_t.startswith("#")
            & resolved_t.isNull()
        )
        .select(u.alias("__u_url"))
        .distinct()
        .withColumn("__u_hit", F.lit(True))
    )
    state = df.select(
        u.alias(url_col),
        u.alias("final_url"),
        F.lit(0).cast("int").alias("n_hops"),
    )
    for _ in range(max_hops):
        e = edges.select(
            F.col("__src").alias("__e_src"), F.col("__dst").alias("__e_dst")
        )
        state = (
            state.join(
                e, state["final_url"] == e["__e_src"], "left"
            )
            .select(
                url_col,
                F.coalesce("__e_dst", "final_url").alias("final_url"),
                (
                    F.col("n_hops")
                    + F.when(F.col("__e_dst").isNotNull(), 1).otherwise(0)
                ).cast("int").alias("n_hops"),
            )
        )
    e = edges.select(
        F.col("__src").alias("__e_src"), F.lit(True).alias("__more")
    )
    return (
        state.join(e, state["final_url"] == e["__e_src"], "left")
        .join(
            unres_urls,
            state["final_url"] == unres_urls["__u_url"],
            "left",
        )
        .select(
            url_col,
            "final_url",
            "n_hops",
            (
                F.coalesce(~F.col("__more"), F.lit(True))
                & ~F.coalesce(F.col("__u_hit"), F.lit(False))
            ).alias("terminal"),
        )
    )


def host_suffixes_col(host) -> Column:
    """All label-boundary suffixes of a host, LONGEST first:
    ``a.b.example.com`` -> ``[a.b.example.com, b.example.com,
    example.com, com]``. Label-boundary construction is what makes
    suffix blocking safe — ``example.com`` can never match
    ``notexample.com``. Pure JVM array expressions; empty host ->
    empty array."""
    h = host if isinstance(host, Column) else F.col(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    return F.when(
        (h.isNull()) | (h == ""), F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
        )
    )


def domain_blocklist(
    df: DataFrame,
    domains,
    url_col: str = "url",
    drop: bool = False,
    broadcast_domains: bool = True,
) -> DataFrame:
    """Domain-suffix blocklist gate — the URL-side sibling of the
    text blocklist (``redact.blocklist_drop``) every crawl pipeline
    runs: blocking ``example.com`` blocks every subdomain
    (``a.b.example.com``) at a LABEL boundary, never substring
    lookalikes. The standard spam/adult/PII-risk domain-list filter
    (C4's badwords shape, applied to hosts).

    ``domains``: a Python list (inlined as a broadcast literal array —
    right for curated lists up to ~10^4 entries; array_contains costs
    O(list) per suffix, so switch arms beyond that) or a
    DataFrame with a ``domain`` column (the JOIN arm for big lists:
    the corpus contracts to a narrow ``(__rid, suffix)`` projection —
    ~tens of bytes/row, bounded by the host's label count — and only
    THAT rides the join; ``broadcast_domains`` hints the list side).

    Output: ``df`` plus ``blocked_domain`` (the LONGEST matching
    blocked suffix, NULL when clean) and ``blocked``; ``drop=True``
    returns only clean rows (both accounting columns removed).

    Scale shape: literal arm is one narrow map (no shuffle, no UDF);
    join arm shuffles only the suffix sliver against the (broadcast)
    list, with verdicts joined back on a ``localCheckpoint``-pinned
    row id (the robots_filter id-stability discipline)."""
    host = host_col(F.col(url_col))
    sufs = host_suffixes_col(host)

    if isinstance(domains, DataFrame):
        if "domain" not in domains.columns:
            raise ValueError(
                "domains frame needs a 'domain' column; got "
                f"{domains.columns}"
            )
        dom = domains.select(
            F.lower(F.trim(F.col("domain"))).alias("__dom")
        ).distinct()
        if broadcast_domains:
            dom = F.broadcast(dom)
        # pin ids so both join-back sides read the SAME assignment
        # (nondeterministic upstreams: the robots_filter discipline)
        keyed = df.withColumn(
            "__rid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=False)
        narrow = keyed.select(
            "__rid", F.explode_outer(sufs).alias("__suf")
        )
        hits = (
            narrow.join(dom, narrow["__suf"] == dom["__dom"], "inner")
            .groupBy("__rid")
            .agg(F.max_by("__suf", F.length("__suf")).alias(
                "blocked_domain"
            ))
        )
        out = keyed.join(hits, "__rid", "left").withColumn(
            "blocked", F.col("blocked_domain").isNotNull()
        ).drop("__rid")
    else:
        cleaned = sorted(
            {str(d).strip().lower() for d in domains if str(d).strip()}
        )
        if not cleaned:
            raise ValueError("empty domain blocklist")
        lit_set = F.array(*[F.lit(d) for d in cleaned])
        matches = F.filter(
            sufs, lambda s: F.array_contains(lit_set, s)
        )
        # try_: ANSI element_at aborts on an empty array
        blocked_dom = F.try_element_at(matches, F.lit(1))
        out = df.withColumn(
            "blocked_domain", blocked_dom
        ).withColumn("blocked", F.col("blocked_domain").isNotNull())

    if drop:
        return out.filter(~F.col("blocked")).drop(
            "blocked_domain", "blocked"
        )
    return out
