"""robots.txt compliance for crawl corpora (RFC 9309 shape).

Beyond the reference surface (north-star crawl-pipeline operator): a
training-data pipeline that ingests crawl archives must be able to
answer, corpus-wide, "which of these pages does the site's robots.txt
disallow for my user agent?" — both to filter fetch frontiers and to
retro-audit an already-collected corpus against current policies.

Two stages, all JVM-side expressions (no UDFs):

- ``parse_robots``: a frame of robots.txt DOCUMENTS (host, text) into
  a RULE frame (host, rule_path, pattern, allow, rule_len). Handles
  the RFC 9309 group model: consecutive ``User-agent`` lines form one
  group; a group's rules apply to every agent named above them;
  comments stripped; empty ``Disallow:`` (allow-all) dropped. Agent
  resolution follows the spec: if any group names the product token
  exactly, ONLY those groups apply, else the ``*`` groups.
- ``robots_filter``: URL frame × rule frame -> per-URL verdict via
  LONGEST-MATCH precedence (rule path octet length; allow wins ties —
  the Google/RFC tiebreak), ``*`` wildcards and ``$`` end anchors
  translated to anchored Java regexes in-plan. No matching rule, or
  no robots.txt for the host, means allowed (the spec default).

Scale shape: the rule frame is per-HOST (a few rules each — millions
of rows for the whole web, kilobytes per host) and joins the URL
frame BROADCAST; the URL side is one scan + one regex match per
candidate rule per URL, aggregated map-side by max(struct). The URL
corpus is never shuffled; only (url, host) rows meet the rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _rule_to_regex(path_col) -> "F.Column":
    """Translate a robots rule path into an anchored Java regex:
    literal chars escaped, ``*`` -> ``.*``, trailing ``$`` -> end
    anchor. Pure expressions, so rules stay data, not driver state."""
    # escape regex metacharacters EXCEPT * and $ (handled below)
    escaped = F.regexp_replace(
        path_col, r"([\\.\[\]\{\}\(\)\+\?\^\|])", r"\\$1"
    )
    ends_anchored = escaped.endswith("$")
    body = F.when(
        ends_anchored,
        escaped.substr(F.lit(1), F.length(escaped) - 1),
    ).otherwise(escaped)
    # RFC 9309 gives '$' meaning only at the END of a rule; a literal
    # mid-path '$' must not become a regex anchor
    body = F.regexp_replace(body, r"\$", r"\\\$")
    wild = F.regexp_replace(body, r"\*", ".*")
    return F.concat(
        F.lit("^"),
        wild,
        F.when(ends_anchored, F.lit("$")).otherwise(F.lit("")),
    )


def _parsed_lines(robots_df: DataFrame, host_col: str, text_col: str):
    """(host, pos, __key, __val): comment-stripped key:value lines."""
    lines = robots_df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"))
        .alias("pos", "__line"),
    ).select(
        "host",
        "pos",
        # strip comments + whitespace
        F.trim(F.regexp_replace("__line", r"#.*$", "")).alias("__line"),
    )
    return lines.select(
        "host",
        "pos",
        F.lower(
            F.trim(F.regexp_extract("__line", r"^([A-Za-z-]+)\s*:", 1))
        ).alias("__key"),
        F.trim(F.regexp_extract("__line", r"^[A-Za-z-]+\s*:(.*)$", 1)).alias(
            "__val"
        ),
    )


def _grouped_lines(
    robots_df: DataFrame, host_col: str, text_col: str
) -> DataFrame:
    """Group-attributed directive lines: ``(host, pos, __key, __val,
    __gid)`` for the group-scoped keys (user-agent / allow / disallow /
    crawl-delay). A run of consecutive User-agent lines opens a group
    (RFC 9309 §2.2.1); every other directive line ends the run, so a
    later User-agent starts a NEW group."""
    parsed = _parsed_lines(robots_df, host_col, text_col).filter(
        F.col("__key").isin(
            "user-agent", "allow", "disallow", "crawl-delay"
        )
    )
    w = Window.partitionBy("host").orderBy("pos")
    return parsed.select(
        "host",
        "pos",
        "__key",
        "__val",
        F.sum(
            F.when(
                (F.col("__key") == "user-agent")
                & (
                    F.coalesce(F.lag("__key").over(w), F.lit(""))
                    != "user-agent"
                ),
                1,
            ).otherwise(0)
        )
        .over(w)
        .alias("__gid"),
    )


def _applicable_groups(grouped: DataFrame, user_agent: str) -> DataFrame:
    """(host, __gid) of the groups that govern ``user_agent``: the
    exact-token groups when any exist for the host, else the ``*``
    groups (RFC 9309 agent resolution)."""
    ua = user_agent.lower()
    agents = (
        grouped.filter(F.col("__key") == "user-agent")
        .groupBy("host", "__gid")
        .agg(
            F.max(
                F.when(F.lower("__val") == ua, 1).otherwise(0)
            ).alias("__exact"),
            F.max(F.when(F.col("__val") == "*", 1).otherwise(0)).alias(
                "__star"
            ),
        )
    )
    host_has_exact = agents.groupBy("host").agg(
        F.max("__exact").alias("__host_exact")
    )
    return (
        agents.join(host_has_exact, "host")
        .filter(
            F.when(F.col("__host_exact") == 1, F.col("__exact") == 1)
            .otherwise(F.col("__star") == 1)
        )
        .select("host", "__gid")
    )


def robots_directives(
    robots_df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    user_agent: str = "*",
) -> DataFrame:
    """Per-host non-rule directives: ``(host, crawl_delay, sitemaps)``.

    ``crawl_delay`` (seconds, nullable double) comes from the groups
    governing ``user_agent`` — the MINIMUM across them when several
    apply, NULL when absent or non-numeric (``try_cast``: junk values
    degrade to "no delay stated", never a job abort). ``sitemaps`` is
    the sorted array of ``Sitemap:`` URLs — host-wide per
    sitemaps.org, independent of any user-agent group. Hosts with
    neither directive still appear (both columns NULL/empty) so the
    frame is a complete per-host policy summary."""
    grouped = _grouped_lines(robots_df, host_col, text_col)
    applicable = _applicable_groups(grouped, user_agent)
    delays = (
        grouped.filter(F.col("__key") == "crawl-delay")
        .join(applicable, ["host", "__gid"])
        .groupBy("host")
        .agg(
            F.min(F.expr("try_cast(__val AS DOUBLE)")).alias(
                "crawl_delay"
            )
        )
    )
    sitemaps = (
        _parsed_lines(robots_df, host_col, text_col)
        .filter((F.col("__key") == "sitemap") & (F.col("__val") != ""))
        .groupBy("host")
        .agg(F.sort_array(F.collect_set("__val")).alias("sitemaps"))
    )
    hosts = robots_df.select(
        F.col(host_col).alias("host")
    ).distinct()
    return (
        hosts.join(delays, "host", "left")
        .join(sitemaps, "host", "left")
        .select(
            "host",
            "crawl_delay",
            F.coalesce(
                "sitemaps", F.array().cast("array<string>")
            ).alias("sitemaps"),
        )
    )


def parse_robots(
    robots_df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    user_agent: str = "*",
) -> DataFrame:
    """Rule frame for one user agent: ``(host, rule_path, pattern,
    allow, rule_len)``.

    Group semantics per RFC 9309 §2.2.1: a run of consecutive
    ``User-agent`` lines opens a group; ``Allow``/``Disallow`` lines
    belong to the open group and apply to every agent it names. If any
    group names ``user_agent`` exactly (case-insensitive product
    token), only those groups' rules survive; otherwise the ``*``
    groups. Unknown directives (Sitemap, Crawl-delay, ...) are
    ignored; a robots.txt smaller than one group yields no rules
    (allow-all)."""
    grouped = _grouped_lines(robots_df, host_col, text_col)
    applicable = _applicable_groups(grouped, user_agent)
    rules = (
        grouped.filter(F.col("__key").isin("allow", "disallow"))
        .filter(F.col("__val") != "")  # empty Disallow: = no rule
        .join(applicable, ["host", "__gid"])
        .select(
            "host",
            F.col("__val").alias("rule_path"),
            (F.col("__key") == "allow").alias("allow"),
        )
        .distinct()
    )
    return rules.select(
        "host",
        "rule_path",
        _rule_to_regex(F.col("rule_path")).alias("pattern"),
        "allow",
        F.length("rule_path").cast("long").alias("rule_len"),
    )


def robots_from_corpus(
    corpus_df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    host_col_name: str = "host",
) -> DataFrame:
    """(host, text) robots.txt documents pulled out of a crawled
    corpus itself — a WARC crawl fetches ``/robots.txt`` per host, so
    the policy frame ships inside the same archive
    (``warc_text_corpus`` output feeds straight in). When a host was
    fetched more than once the lexically-greatest body wins (a
    deterministic, engine-portable tiebreak)."""
    from .urltools import host_col as host_of

    pathish = F.regexp_replace(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""
    )
    return (
        corpus_df.filter(pathish == "/robots.txt")
        .select(
            F.coalesce(
                F.col(host_col_name)
                if host_col_name in corpus_df.columns
                else host_of(F.col(url_col)),
                host_of(F.col(url_col)),
            ).alias("host"),
            F.col(text_col).alias("text"),
        )
        .groupBy("host")
        .agg(F.max("text").alias("text"))
    )


def robots_filter(
    urls_df: DataFrame,
    rules_df: DataFrame,
    url_col: str = "url",
    keep_disallowed: bool = False,
) -> DataFrame:
    """Per-URL robots verdict: input columns plus ``allowed`` and
    ``matched_rule`` (the winning rule path, NULL when no rule
    matched). Longest-match precedence, allow wins length ties, no
    match / unknown host => allowed. ``keep_disallowed=True`` returns
    every row annotated; default drops disallowed rows (the gate
    shape).

    Scale shape: the rule frame contracts to ONE ROW PER HOST carrying
    its rules as an array (hosts x a few rules — kilobytes/host), that
    frame broadcasts, and the winner is computed per URL with array
    lambdas (filter matching rules, array_max the (len, allow, path)
    structs). The URL corpus is NEVER shuffled or re-aggregated — one
    narrow broadcast-join projection, no explode, no groupBy over
    document rows (grouping full corpus rows would shuffle the text
    column)."""
    from .urltools import host_col as host_of

    path = F.coalesce(
        F.nullif(
            F.regexp_extract(
                F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1
            ),
            F.lit(""),
        ),
        F.lit("/"),
    )
    keyed = urls_df.withColumn("__host", host_of(F.col(url_col))).withColumn(
        "__path", path
    )
    # one row per host, rules as an array; renamed so an input frame
    # that already carries host/allow/pattern columns never collides
    per_host = rules_df.groupBy(F.col("host").alias("__rhost")).agg(
        F.collect_list(
            F.struct(
                F.col("rule_len"),
                F.col("allow"),
                F.col("rule_path"),
                F.col("pattern"),
            )
        ).alias("__rules")
    )
    joined = keyed.join(
        F.broadcast(per_host),
        keyed["__host"] == per_host["__rhost"],
        "left",
    )
    matched = F.filter(
        F.coalesce(
            F.col("__rules"),
            F.array().cast(
                "array<struct<rule_len:bigint,allow:boolean,"
                "rule_path:string,pattern:string>>"
            ),
        ),
        lambda r: F.regexp_like(F.col("__path"), r["pattern"]),
    )
    win = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                r["rule_len"].alias("rule_len"),
                r["allow"].alias("allow"),
                r["rule_path"].alias("rule_path"),
            ),
        )
    )
    verdict = joined.select(
        *urls_df.columns,
        F.coalesce(win["allow"], F.lit(True)).alias("allowed"),
        win["rule_path"].alias("matched_rule"),
    )
    if keep_disallowed:
        return verdict
    return verdict.filter(F.col("allowed"))
