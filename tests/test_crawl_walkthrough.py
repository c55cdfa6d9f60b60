"""End-to-end crawl walkthrough (VERDICT r13 #6): the full chain the
crawl rounds assembled, as ONE lifecycle — drop-dir WARC segments ->
streaming ingest gate -> robots gate -> redirect collapse -> sitemap
expansion -> DSIR selection -> curate. Every stage is a real operator
on the real segment bytes; the companion doc is
examples/crawl_to_corpus.md."""

import pytest
from pyspark.sql import functions as F

from dbqt_spark.sources.warc import (
    build_warc,
    read_warc,
    warc_response_record,
)

A = "https://site-a.example"
B = "https://site-b.example"
_D = "2024-03-01T00:00:0{}Z"

PROSE = "the quick brown fox jumps over the lazy dog and tells a story "
CODE = "def fn(x): return x + 1  # stack trace error traceback lambda "


def _segment_a() -> bytes:
    recs = [
        warc_response_record(
            f"{A}/robots.txt", _D.format(0),
            (
                "User-agent: *\nDisallow: /private/\nCrawl-delay: 1\n"
                f"Sitemap: {A}/sitemap-index.xml\n"
            ).encode(),
            http_headers={"Content-Type": "text/plain"},
        ),
        warc_response_record(
            f"{A}/sitemap-index.xml", _D.format(1),
            (
                "<sitemapindex><sitemap>"
                f"<loc>{A}/sitemap-pages.xml</loc>"
                "</sitemap></sitemapindex>"
            ).encode(),
            http_headers={"Content-Type": "text/xml"},
        ),
        warc_response_record(
            f"{A}/sitemap-pages.xml", _D.format(2),
            (
                "<urlset>"
                + "".join(
                    f"<url><loc>{A}/p/{i}</loc></url>" for i in range(1, 5)
                )
                + f"<url><loc>{A}/private/secret</loc></url></urlset>"
            ).encode(),
            http_headers={"Content-Type": "text/xml"},
        ),
        # a 301 with a root-relative Location
        warc_response_record(
            f"{A}/old", _D.format(3), b"", status=301,
            http_headers={"Location": "/p/1"},
        ),
        warc_response_record(
            f"{A}/private/secret", _D.format(4),
            f"<html><body>{PROSE * 3} secret</body></html>".encode(),
        ),
    ]
    for i in range(1, 5):
        recs.append(
            warc_response_record(
                f"{A}/p/{i}", _D.format(5),
                f"<html><body>{PROSE * 4} page {i}</body></html>".encode(),
            )
        )
    # a re-announced spelling of /p/1 — the URL gate must drop it
    recs.append(
        warc_response_record(
            f"{A}/p/1?utm_source=x", _D.format(6),
            f"<html><body>{PROSE * 4} page 1</body></html>".encode(),
        )
    )
    return build_warc(recs, gzip_per_record=True)


def _segment_b() -> bytes:
    recs = [
        warc_response_record(
            f"{B}/c/{i}", _D.format(7),
            f"<html><body>{CODE * 4} snippet {i}</body></html>".encode(),
        )
        for i in range(1, 5)
    ]
    return build_warc(recs, gzip_per_record=True)


@pytest.mark.slow
def test_crawl_to_curated_corpus_walkthrough(spark, tmp_path):
    from dbqt_spark.operators.dsir import dsir_select
    from dbqt_spark.operators.pipeline import CurateConfig, curate
    from dbqt_spark.operators.robots import (
        parse_robots,
        robots_filter,
        robots_from_corpus,
    )
    from dbqt_spark.operators.urltools import (
        expand_sitemaps,
        resolve_redirects,
    )
    from dbqt_spark.streaming.crawl import run_warc_ingest

    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    # -- stage 1: streaming ingest gate (exactly-once segments, URL
    # canonical dedup across runs) ------------------------------------
    (drop / "seg-a.warc.gz").write_bytes(_segment_a())
    run_warc_ingest(spark, str(drop), out, ckpt)
    n1 = spark.read.parquet(out).count()
    # robots + 2 sitemaps + 5 pages (the utm re-spelling gated out;
    # the 301 is not a 2xx document)
    assert n1 == 8
    (drop / "seg-b.warc.gz").write_bytes(_segment_b())
    run_warc_ingest(spark, str(drop), out, ckpt)   # picks up ONLY seg-b
    corpus = spark.read.parquet(out)
    assert corpus.count() == n1 + 4
    run_warc_ingest(spark, str(drop), out, ckpt)   # no new segments
    assert spark.read.parquet(out).count() == n1 + 4
    assert corpus.filter(F.col("url").contains("utm_source")).count() == 0

    # -- stage 1c: seekable CDX index + targeted fetch (r15) ----------
    from dbqt_spark.sources.cdx import cdx_fetch, cdx_index, parse_cdxj
    from dbqt_spark.sources.warc import wat_metadata

    parsed_off = read_warc(
        spark, str(drop), with_offsets=True
    ).withColumn(
        "warc_file", F.element_at(F.split("warc_file", "/"), -1)
    )
    lines = cdx_index(parsed_off).select(
        F.concat_ws(" ", "surt_key", "ts14", "cdxj").alias("line")
    )
    index = parse_cdxj(lines)
    assert index.filter(F.col("offset").isNull()).count() == 0
    hit = cdx_fetch(
        index, str(drop), surt_prefix="example,site-a)/p/3"
    ).collect()
    assert [r.url for r in hit] == [f"{A}/p/3"]
    assert b"page 3" in bytes(hit[0].payload)

    # -- stage 2: redirect collapse over the raw parsed frame ---------
    parsed = read_warc(spark, str(drop))

    # WAT-shaped metadata rides the same parsed frame: the sitemap/
    # robots captures carry no title and no anchors; HTML pages parse
    wat = {r.url: r for r in wat_metadata(parsed).collect()}
    assert wat[f"{A}/robots.txt"].title is None
    assert wat[f"{A}/p/2"].n_links == 0

    # WET derivative from the same parsed frame: conversion records
    # carry markup-stripped text + lineage to their source records,
    # and write back out as a real .warc.gz WET segment
    from dbqt_spark.sources.warc import wet_records, write_warc_archive

    wet = wet_records(parsed)
    wrows = {r.url: r for r in wet.collect()}
    src_ids = {r.url: r.record_id for r in parsed.collect()}
    assert wrows[f"{A}/p/2"].refers_to == src_ids[f"{A}/p/2"]
    assert b"<" not in bytes(wrows[f"{A}/p/2"].payload)
    wet_dir = str(tmp_path / "wet")
    written = write_warc_archive(
        wet.repartition(1), wet_dir, record_kind="conversion",
        refers_to_col="refers_to", segment_prefix="wet",
    ).count()
    reread = read_warc(spark, wet_dir, record_types=("conversion",))
    assert reread.count() == written == len(wrows)
    resolved = {
        r.url: r
        for r in resolve_redirects(
            parsed.select("url", "redirect_to")
        ).collect()
    }
    old = resolved[f"{A}/old"]
    assert (old.final_url, old.n_hops, old.terminal) == (f"{A}/p/1", 1, True)

    # -- stage 3: robots gate from the corpus's own robots.txt --------
    rules = parse_robots(robots_from_corpus(corpus))
    pathish = F.regexp_replace(
        F.col("url"), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""
    )
    gated = robots_filter(corpus.filter(pathish != "/robots.txt"), rules)
    urls = {r.url for r in gated.select("url").collect()}
    assert f"{A}/private/secret" not in urls          # disallowed
    assert f"{A}/p/1" in urls
    assert f"{B}/c/1" in urls                         # host with no policy

    # -- stage 4: sitemap-index expansion ------------------------------
    sm = {
        (r.root_url, r.loc): (r.depth, r.is_sitemap)
        for r in expand_sitemaps(corpus).collect()
    }
    for i in range(1, 5):
        assert sm[(f"{A}/sitemap-index.xml", f"{A}/p/{i}")] == (2, False)
    # discovery is not permission: the sitemap still lists /private/
    assert sm[(f"{A}/sitemap-index.xml", f"{A}/private/secret")] == (
        2, False,
    )

    # -- stage 5: DSIR selection toward a prose target -----------------
    target = spark.createDataFrame(
        [(100 + i, f"a quick brown fox and a lazy dog story {i}")
         for i in range(6)],
        "doc_id long, text string",
    )
    picked = dsir_select(
        gated.select("doc_id", "text", "url"), target, k=4,
        n_buckets=512, mode="topk",
    )
    picked_urls = {
        r.url
        for r in picked.join(gated.select("doc_id", "url"), "doc_id")
        .select("url").collect()
    }
    # prose pages (site-a) outrank the code pages (site-b)
    assert len([u for u in picked_urls if u.startswith(A)]) >= 3

    # -- stage 6: curate the selected documents ------------------------
    selected = gated.join(picked.select("doc_id"), "doc_id")
    curated = curate(
        selected.select("doc_id", "host", "text"),
        CurateConfig(group_col="host", quality_quantile=0.0,
                     dedup="exact"),
    )
    rows = curated.collect()
    assert len(rows) >= 1
    assert {"doc_id", "text", "split"} <= set(curated.columns)
    assert all(r.text for r in rows)

    # -- stage 7: plan the NEXT crawl from the index diff (r15) --------
    from dbqt_spark.operators.urltools import frontier_schedule
    from dbqt_spark.sources.cdx import cdx_delta

    old_idx = index.filter(F.col("filename").contains("seg-a"))
    delta = cdx_delta(old_idx, index)
    by_status = {
        r.status: r.n
        for r in delta.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # seg-b only ADDED captures: nothing gone, nothing changed
    assert set(by_status) == {"new", "unchanged"}
    assert by_status["new"] >= 1

    frontier = delta.where(F.col("status") != "gone").select(
        "url", "status",
        F.when(F.col("status") == "changed", 3)
        .when(F.col("status") == "new", 2)
        .otherwise(1).alias("priority"),
    )
    plan = frontier_schedule(frontier, priority_col="priority")
    # politeness: waves are 1..n per host with no gaps, and within a
    # host every 'new' page fetches before every 'unchanged' one
    for host_rows in (
        plan.groupBy("host")
        .agg(F.collect_list(F.struct("wave", "status")).alias("rs"))
        .collect()
    ):
        waves = sorted(r.wave for r in host_rows.rs)
        assert waves == list(range(1, len(waves) + 1))
        new_waves = [r.wave for r in host_rows.rs if r.status == "new"]
        old_waves = [
            r.wave for r in host_rows.rs if r.status == "unchanged"
        ]
        if new_waves and old_waves:
            assert max(new_waves) < min(old_waves)
