"""WARC front door: stdlib parser, both Spark read arms, source
registry integration, curate-ready corpus view."""

import gzip
import io
import os

import pytest

from dbqt_spark.sources.warc import (
    build_warc,
    iter_warc_records,
    read_warc,
    rows_from_stream,
    split_http_payload,
    warc_response_record,
    warc_text_corpus,
)

# A WARC stream written BY HAND (not via the writer) so the parser is
# verified independently of its own serializer: a warcinfo record, a
# request record, and one response with an HTTP block.
_HAND_HTTP = (
    b"HTTP/1.1 404 Not Found\r\n"
    b"Content-Type: text/html; charset=UTF-8\r\n\r\n"
    b"<html>gone</html>"
)
_HAND_WARC = (
    b"WARC/1.0\r\n"
    b"WARC-Type: warcinfo\r\n"
    b"WARC-Record-ID: <urn:uuid:info-1>\r\n"
    b"WARC-Date: 2024-03-04T05:06:07Z\r\n"
    b"Content-Type: application/warc-fields\r\n"
    b"Content-Length: 18\r\n\r\n"
    b"software: test 1\r\n"
    b"\r\n\r\n"
    b"WARC/1.0\r\n"
    b"WARC-Type: request\r\n"
    b"WARC-Record-ID: <urn:uuid:req-1>\r\n"
    b"WARC-Target-URI: http://h.example/p\r\n"
    b"WARC-Date: 2024-03-04T05:06:07Z\r\n"
    b"Content-Type: application/http; msgtype=request\r\n"
    b"Content-Length: 36\r\n\r\n"
    b"GET /p HTTP/1.1\r\nHost: h.example\r\n\r\n"
    b"\r\n\r\n"
    b"WARC/1.0\r\n"
    b"WARC-Type: response\r\n"
    b"WARC-Record-ID: <urn:uuid:resp-1>\r\n"
    b"WARC-Target-URI: http://h.example/p\r\n"
    b"WARC-Date: 2024-03-04T05:06:07Z\r\n"
    b"Content-Type: application/http; msgtype=response\r\n"
    + f"Content-Length: {len(_HAND_HTTP)}\r\n\r\n".encode()
    + _HAND_HTTP
    + b"\r\n\r\n"
)


def _sample_records():
    return [
        warc_response_record(
            "https://a.example/x",
            "2024-01-01T00:00:01Z",
            b"<html><body>alpha</body></html>",
        ),
        warc_response_record(
            "https://b.example/y?q=1",
            "2024-01-01T00:00:02Z",
            "café 中文".encode(),
            content_type="text/plain; charset=utf-8",
        ),
        warc_response_record(
            "https://a.example/z",
            "2024-01-01T00:00:03Z",
            b"{}",
            status=500,
            content_type="application/json",
        ),
    ]


def test_parser_hand_written_stream():
    recs = list(iter_warc_records(io.BytesIO(_HAND_WARC)))
    assert [r.header("WARC-Type") for r in recs] == [
        "warcinfo",
        "request",
        "response",
    ]
    status, mime, body = split_http_payload(recs[2].payload)
    assert (status, mime, body) == (404, "text/html", b"<html>gone</html>")
    # whole-stream gzip (not per-record) parses identically
    recs_gz = list(
        iter_warc_records(io.BytesIO(gzip.compress(_HAND_WARC)))
    )
    assert [r.headers for r in recs_gz] == [r.headers for r in recs]


def test_writer_parser_round_trip_both_layouts():
    recs = _sample_records()
    for per_record in (False, True):
        blob = build_warc(recs, gzip_per_record=per_record)
        out = list(iter_warc_records(io.BytesIO(blob)))
        assert len(out) == 3
        status, mime, body = split_http_payload(out[1].payload)
        assert (status, mime) == (200, "text/plain")
        assert body.decode() == "café 中文"
    # byte-deterministic: same records -> same .warc.gz bytes
    assert build_warc(recs) == build_warc(recs)


def test_http_block_chunked_and_gzip_decode():
    chunked = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    )
    assert split_http_payload(chunked) == (200, "text/plain", b"hello world")
    gzipped = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + gzip.compress(b"<p>deep</p>")
    )
    assert split_http_payload(gzipped)[2] == b"<p>deep</p>"
    # non-HTTP payload passes through untouched
    assert split_http_payload(b"raw bytes") == (None, None, b"raw bytes")


def test_parser_fail_fast_on_truncation_and_garbage():
    blob = build_warc(_sample_records(), gzip_per_record=False)
    with pytest.raises(ValueError, match="truncated WARC"):
        list(iter_warc_records(io.BytesIO(blob[:-40])))
    with pytest.raises(ValueError, match="not a WARC record"):
        list(iter_warc_records(io.BytesIO(b"PK\x03\x04zipfile\r\n\r\n")))


def _write_fixture_dir(tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg-00000.warc.gz").write_bytes(build_warc(_sample_records()))
    (d / "seg-00001.warc").write_bytes(_HAND_WARC)
    return str(d)


def test_read_warc_both_arms_agree(spark, tmp_path):
    d = _write_fixture_dir(tmp_path)

    def fetch(via):
        df = read_warc(spark, d, via=via)
        return sorted(
            df.select(
                "record_id", "url", "mime", "http_status", "payload"
            ).collect()
        )

    stream, binary = fetch("stream"), fetch("binary")
    assert stream == binary
    assert len(stream) == 4  # 3 writer responses + 1 hand-written
    by_url = {r.url: r for r in stream}
    assert by_url["http://h.example/p"].http_status == 404
    assert bytes(by_url["https://a.example/x"].payload) == (
        b"<html><body>alpha</body></html>"
    )
    # record_types=None keeps request/warcinfo rows too
    all_rows = read_warc(spark, d, record_types=None, via="stream")
    assert all_rows.count() == 6
    # one task per file: the stream arm repartitions the listing
    assert read_warc(spark, d, via="stream").rdd.getNumPartitions() == 2


def test_warc_text_corpus_columns(spark, tmp_path):
    d = _write_fixture_dir(tmp_path)
    corpus = warc_text_corpus(spark, d)
    rows = {r.url: r for r in corpus.collect()}
    # 500-status json and 404 hand-written rows are gated out
    assert set(rows) == {"https://a.example/x", "https://b.example/y?q=1"}
    row = rows["https://b.example/y?q=1"]
    assert row.host == "b.example"
    assert row.text == "café 中文"
    assert str(row.fetch_ts).startswith("2024-01-01 00:00:02")
    assert dict(corpus.dtypes)["fetch_ts"] == "timestamp"
    assert dict(corpus.dtypes)["doc_id"] == "bigint"
    # doc_id is stable across re-reads (content-derived, not row order)
    again = {r.url: r.doc_id for r in warc_text_corpus(spark, d).collect()}
    assert {u: r.doc_id for u, r in rows.items()} == again


def test_database_kind_warc(spark, tmp_path):
    from dbqt_spark.sources.database import connect

    d = _write_fixture_dir(tmp_path)
    db = connect(spark, {"type": "warc", "path": d})
    assert db.list_tables() == ["seg-00000", "seg-00001"]
    df = db.load("seg-00001")
    assert [r.http_status for r in df.collect()] == [404]
    # record_types knob flows through the connection config
    db_all = connect(
        spark, {"type": "warc", "path": d, "record_types": None}
    )
    assert db_all.load("seg-00001").count() == 3
    # r13 ADVICE: remote roots fail discovery with the remedy named,
    # never an os.listdir FileNotFoundError
    remote = connect(spark, {"type": "warc", "path": "s3a://bkt/crawl"})
    with pytest.raises(ValueError, match="remote warc roots"):
        remote.list_tables()
    # .arc.gz files are both discoverable and loadable (suffix sets
    # aligned between list_tables and load)
    import shutil as _sh

    _sh.copyfile(f"{d}/seg-00000.warc.gz", f"{d}/old.arc.gz")
    db2 = connect(spark, {"type": "warc", "path": d})
    assert db2.list_tables() == ["old", "seg-00000", "seg-00001"]
    assert db2.load("old").count() >= 1


def test_rows_from_stream_mime_fallback():
    # resource records (no HTTP block) fall back to the WARC-level
    # Content-Type for the mime column
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:uuid:res-1>\r\n"
        b"WARC-Target-URI: http://h.example/styles.css\r\n"
        b"WARC-Date: 2024-03-04T05:06:07Z\r\n"
        b"Content-Type: text/css\r\n"
        b"Content-Length: 10\r\n\r\n"
        b"body{eee:}"
        b"\r\n\r\n"
    )
    rows = list(rows_from_stream(io.BytesIO(rec), "f", ("resource",)))
    assert rows[0][5] == "text/css" and rows[0][6] is None


@pytest.mark.slow
def test_curate_from_warc_cli(spark, tmp_path):
    from dbqt_spark.app import main

    d = tmp_path / "crawl"
    d.mkdir()
    recs = [
        warc_response_record(
            f"https://site-{i % 2}.example/page/{i}",
            f"2024-01-01T00:00:{i:02d}Z",
            f"<html><body>document number {i} with enough words to "
            f"pass the gate and some more filler text</body></html>".encode(),
        )
        for i in range(20)
    ]
    (d / "c.warc.gz").write_bytes(build_warc(recs))
    out = str(tmp_path / "curated")
    rc = main(
        [
            "curate",
            "--from-warc",
            str(d),
            "--output-parquet",
            out,
            "--quality-quantile",
            "0.0",
            "--no-redact",
        ]
    )
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.count() == 20
    assert {"doc_id", "url", "host", "text", "split"} <= set(got.columns)


# ---------------------------------------------------------------------------
# streaming ingest (streaming/crawl.py)
# ---------------------------------------------------------------------------


def _segment(urls, stamp="2024-05-05T00:00:00Z"):
    return build_warc(
        [
            warc_response_record(
                u, stamp, f"<html><body>content of {u}</body></html>".encode()
            )
            for u in urls
        ]
    )


def test_warc_ingest_gate_batch_twin(spark, tmp_path):
    """Batch frame through the gate == DISTINCT canonical URLs."""
    from dbqt_spark.streaming.crawl import warc_ingest_gate

    d = tmp_path / "drop"
    d.mkdir()
    # messy spellings of 3 pages + 1 unique page
    (d / "a.warc.gz").write_bytes(
        _segment(
            [
                "https://s.example/p/1",
                "HTTPS://S.EXAMPLE:443/p/1?utm_source=x",
                "https://s.example/p/2",
                "https://s.example/p/2#frag",
                "https://s.example/p/3",
                "https://s.example/only",
            ]
        )
    )
    out = warc_ingest_gate(warc_text_corpus(spark, str(d)))
    rows = out.collect()
    assert len(rows) == 4
    assert sorted(r.url_canon for r in rows) == [
        "https://s.example/only",
        "https://s.example/p/1",
        "https://s.example/p/2",
        "https://s.example/p/3",
    ]
    # the gate emits full document rows, not just the key
    assert {"doc_id", "text", "host"} <= set(out.columns)


def test_streaming_warc_ingest_two_run_lifecycle(spark, tmp_path):
    """Segments dropped between runs: second run parses only the NEW
    file and the URL-gate state persists across runs (already-seen
    pages in the new segment are dropped)."""
    from dbqt_spark.streaming.crawl import run_warc_ingest

    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    (drop / "seg-0.warc.gz").write_bytes(
        _segment([f"https://c.example/p/{i}" for i in range(10)])
    )
    run_warc_ingest(spark, str(drop), out, ckpt)
    first = spark.read.parquet(out)
    assert first.count() == 10

    # second segment: 5 re-crawled pages (different fetch time + messy
    # spelling) + 5 new ones
    (drop / "seg-1.warc.gz").write_bytes(
        _segment(
            [f"HTTPS://C.EXAMPLE:443/p/{i}?utm_campaign=re" for i in range(5)]
            + [f"https://c.example/p/{i}" for i in range(10, 15)],
            stamp="2024-05-06T00:00:00Z",
        )
    )
    run_warc_ingest(spark, str(drop), out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 15
    canon = sorted(r.url_canon for r in got.collect())
    assert canon == sorted(f"https://c.example/p/{i}" for i in range(15))


def test_warc_stream_equals_batch_read(spark, tmp_path):
    """The streaming parse path and the batch reader produce identical
    parsed rows for the same files (shared row builder)."""
    from dbqt_spark.streaming.crawl import warc_stream

    d = _write_fixture_dir(tmp_path)
    batch = sorted(
        (r.record_id, r.url, r.mime, r.http_status, bytes(r.payload))
        for r in read_warc(spark, d, via="stream").collect()
    )
    import uuid

    name = f"warc_stream_{uuid.uuid4().hex[:8]}"
    q = (
        warc_stream(spark, d)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    streamed = sorted(
        (r.record_id, r.url, r.mime, r.http_status, bytes(r.payload))
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    )
    assert streamed == batch


def test_corpus_survives_malformed_utf8(spark, tmp_path):
    """Real crawls carry mislabeled encodings: a latin-1 body declared
    utf-8 must become replacement chars, not a job abort (ANSI decode()
    would kill the whole segment)."""
    d = tmp_path / "drop"
    d.mkdir()
    (d / "bad.warc.gz").write_bytes(
        build_warc(
            [
                warc_response_record(
                    "https://enc.example/p",
                    "2024-01-01T00:00:00Z",
                    b"caf\xe9 in latin-1 \xff\xfe",
                    content_type="text/html; charset=utf-8",
                )
            ]
        )
    )
    rows = warc_text_corpus(spark, str(d)).collect()
    assert len(rows) == 1
    assert "caf" in rows[0].text and "�" in rows[0].text


@pytest.mark.slow
def test_curate_from_warc_robots_gate(spark, tmp_path):
    """--robots-gate: the crawl's own /robots.txt governs which pages
    survive into the curated corpus."""
    from dbqt_spark.app import main

    d = tmp_path / "crawl"
    d.mkdir()
    filler = "enough words here to pass the quality gate " * 3
    recs = [
        warc_response_record(
            "https://s.example/robots.txt",
            "2024-01-01T00:00:00Z",
            b"User-agent: *\nDisallow: /private/\n",
            content_type="text/plain",
        )
    ]
    for i in range(10):
        area = "private" if i % 2 else "public"
        recs.append(
            warc_response_record(
                f"https://s.example/{area}/{i}",
                f"2024-01-01T00:01:{i:02d}Z",
                f"<html><body>doc {i} {filler}</body></html>".encode(),
            )
        )
    (d / "c.warc.gz").write_bytes(build_warc(recs))
    out = str(tmp_path / "curated")
    rc = main(
        [
            "curate",
            "--from-warc",
            str(d),
            "--robots-gate",
            "--output-parquet",
            out,
            "--quality-quantile",
            "0.0",
            "--no-redact",
        ]
    )
    assert rc == 0
    got = spark.read.parquet(out)
    urls = [r.url for r in got.collect()]
    assert len(urls) == 5
    assert all("/public/" in u for u in urls)


def test_links_cli_pagerank_and_robots(spark, tmp_path, capsys):
    """links CLI: pagerank over a parquet corpus; robots audit using
    in-corpus policies."""
    import yaml

    from dbqt_spark.app import main

    data = tmp_path / "tables"
    data.mkdir()
    rows = [
        (
            1,
            "https://a.example/p/1",
            '<a href="https://b.example/x">b</a>'
            '<a href="https://c.example/y">c</a>',
        ),
        (2, "http://b.example/p/2", '<a href="https://a.example/">back</a>'),
        (
            3,
            "https://a.example/robots.txt",
            "User-agent: *\nDisallow: /p/\n",
        ),
    ]
    spark.createDataFrame(
        rows, "doc_id long, url string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(str(data / "pages.parquet"))
    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        yaml.safe_dump(
            {"connection": {"type": "parquet", "path": str(data)}}
        )
    )
    rc = main(["links", "pagerank", "--config", str(cfg), "--table", "pages"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "a.example:" in out and "b.example:" in out

    audited = str(tmp_path / "audited")
    rc = main(
        [
            "links", "robots", "--config", str(cfg), "--table", "pages",
            "--keep-disallowed", "--output-parquet", audited,
        ]
    )
    assert rc == 0
    got = {
        r.url: r.allowed for r in spark.read.parquet(audited).collect()
    }
    assert got["https://a.example/p/1"] is False  # own robots disallows /p/
    assert got["http://b.example/p/2"] is True  # no robots for b.example


def test_wet_style_conversion_records(spark, tmp_path):
    """Common Crawl WET files are WARC 'conversion' records carrying
    extracted plain text directly (no HTTP block): the mime fallback
    and record_types knob make them first-class."""
    rec_body = "extracted plain text é".encode()
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Record-ID: <urn:uuid:conv-1>\r\n"
        b"WARC-Target-URI: http://w.example/page\r\n"
        b"WARC-Date: 2024-06-01T00:00:00Z\r\n"
        b"Content-Type: text/plain\r\n"
        + f"Content-Length: {len(rec_body)}\r\n\r\n".encode()
        + rec_body
        + b"\r\n\r\n"
    )
    d = tmp_path / "wet"
    d.mkdir()
    (d / "seg.warc.gz").write_bytes(gzip.compress(rec))
    rows = read_warc(
        spark, str(d), record_types=("conversion",)
    ).collect()
    assert len(rows) == 1
    assert rows[0].mime == "text/plain"
    assert rows[0].http_status is None
    assert bytes(rows[0].payload).decode() == "extracted plain text é"


def test_redirect_capture_and_resolution(spark, tmp_path):
    """3xx Location headers surface as redirect_to; resolve_redirects
    walks chains (relative hop included) and flags capped cycles."""
    from dbqt_spark.operators.urltools import resolve_redirects

    d = tmp_path / "crawl"
    d.mkdir()
    recs = [
        warc_response_record(
            "https://r.example/old", "2024-01-01T00:00:00Z", b"",
            status=301, http_headers={"Location": "/mid"},
        ),
        warc_response_record(
            "https://r.example/mid", "2024-01-01T00:00:01Z", b"",
            status=302, http_headers={"Location": "https://r.example/new"},
        ),
        warc_response_record(
            "https://r.example/new", "2024-01-01T00:00:02Z",
            b"<html><body>landed</body></html>",
        ),
        warc_response_record(
            "https://r.example/a", "2024-01-01T00:00:03Z", b"",
            status=301, http_headers={"Location": "https://r.example/b"},
        ),
        warc_response_record(
            "https://r.example/b", "2024-01-01T00:00:04Z", b"",
            status=301, http_headers={"Location": "https://r.example/a"},
        ),
    ]
    (d / "r.warc.gz").write_bytes(build_warc(recs))
    parsed = read_warc(spark, str(d))
    by_url = {r.url: r for r in parsed.collect()}
    assert by_url["https://r.example/old"].redirect_to == "/mid"
    assert by_url["https://r.example/new"].redirect_to is None
    resolved = {
        r.url: r
        for r in resolve_redirects(
            parsed.select("url", "redirect_to"), max_hops=4
        ).collect()
    }
    old = resolved["https://r.example/old"]
    assert (old.final_url, old.n_hops, old.terminal) == (
        "https://r.example/new", 2, True,
    )
    loop = resolved["https://r.example/a"]
    assert loop.n_hops == 4 and loop.terminal is False


def test_redirect_path_relative_and_unresolvable(spark):
    """r13 ADVICE: RFC 9110 also allows path-relative Location values
    ('next.html') — they merge into the source's directory; a non-null
    Location that cannot be followed (mailto:, non-URL source) must
    surface as terminal=false, never as a terminal page. A
    fragment-ONLY Location ('#section') is the r14 ADVICE refinement:
    it points at the same document, so the row resolves to itself as
    a TERMINAL page, not as a redirect the walk failed to follow."""
    from dbqt_spark.operators.urltools import resolve_redirects

    rows = [
        ("https://h.example/a/b.html", "next.html"),     # dir merge
        ("https://h.example/a/next.html", None),         # landing page
        # RFC 3986 merge strips the last segment: /top -> /
        ("https://h.example/top", "sub/page"),
        ("https://h.example/sub/page", None),
        ("https://h.example/q/page?x=1", "?y=2"),        # query-only
        ("https://h.example/q/page?y=2", None),
        ("https://h.example/dead", "mailto:x@example"),  # unfollowable
        ("https://h.example/frag", "#section"),          # not a redirect
        ("not a url", "next.html"),                      # non-URL source
        ("https://h.example/plain", None),               # plain page
    ]
    df = spark.createDataFrame(rows, "url string, redirect_to string")
    got = {r.url: r for r in resolve_redirects(df, max_hops=4).collect()}
    a = got["https://h.example/a/b.html"]
    assert (a.final_url, a.n_hops, a.terminal) == (
        "https://h.example/a/next.html", 1, True,
    )
    t = got["https://h.example/top"]
    assert (t.final_url, t.n_hops, t.terminal) == (
        "https://h.example/sub/page", 1, True,
    )
    q = got["https://h.example/q/page?x=1"]
    assert (q.final_url, q.n_hops, q.terminal) == (
        "https://h.example/q/page?y=2", 1, True,
    )
    for bad in ("https://h.example/dead", "not a url"):
        r = got[bad]
        assert (r.final_url, r.n_hops, r.terminal) == (bad, 0, False), bad
    fr = got["https://h.example/frag"]
    assert (fr.final_url, fr.n_hops, fr.terminal) == (fr.url, 0, True)
    p = got["https://h.example/plain"]
    assert (p.final_url, p.n_hops, p.terminal) == (p.url, 0, True)


def test_dechunk_lenient_framing(spark=None):
    """r13 ADVICE: bare-LF chunk framing decodes fully; a corrupt size
    token mid-stream returns the ORIGINAL body (never a silently
    truncated prefix); record-boundary truncation keeps the decoded
    prefix."""
    from dbqt_spark.sources.warc import _dechunk

    # bare-LF framing throughout (spec violation some servers commit)
    assert _dechunk(b"5\nhello\n6\n world\n0\n\n") == b"hello world"
    # mixed framing: CRLF first chunk, LF second
    assert _dechunk(b"5\r\nhello\r\n6\n world\n0\r\n\r\n") == b"hello world"
    # corrupt size token AFTER a valid chunk -> raw body back, whole
    corrupt = b"5\r\nhello\r\nZZ\r\nrest of the document bytes"
    assert _dechunk(corrupt) == corrupt
    # chunk data not followed by a line terminator -> raw body back
    bad_term = b"5\r\nhelloXinvalid"
    assert _dechunk(bad_term) == bad_term
    # not chunked at all -> unchanged
    assert _dechunk(b"plain text\nwith lines") == b"plain text\nwith lines"
    # truncated mid final chunk: keep what decoded
    assert _dechunk(b"5\r\nhello\r\nA\r\nwor") == b"hellowor"
    # truncated exactly after a chunk terminator (missing 0-chunk)
    assert _dechunk(b"5\r\nhello\r\n") == b"hello"
    assert _dechunk(b"") == b""


def test_dechunk_negative_size_returns_raw():
    """int(,16) accepts '-1' — a negative chunk size is corrupt
    framing and must return the original body, never a stitched
    decode."""
    from dbqt_spark.sources.warc import _dechunk

    corrupt = b"3\r\nabc\r\n-1\r\n3\r\nxyz\r\n0\r\n\r\n"
    assert _dechunk(corrupt) == corrupt
    deep = b"3\r\nabc\r\n-ff\r\nrest"
    assert _dechunk(deep) == deep


def test_redirect_chain_ending_at_unfollowable_is_not_terminal(spark):
    """A chain that LANDS on a page whose Location is unfollowable is
    still a redirect, not a landing page — terminal=false propagates
    to every row ending there."""
    from dbqt_spark.operators.urltools import resolve_redirects

    rows = [
        ("https://a.example/r", "https://b.example/mid"),
        ("https://b.example/mid", "mailto:x@b.example"),
        ("https://b.example/ok", None),
    ]
    df = spark.createDataFrame(rows, "url string, redirect_to string")
    got = {r.url: r for r in resolve_redirects(df).collect()}
    r = got["https://a.example/r"]
    assert (r.final_url, r.n_hops, r.terminal) == (
        "https://b.example/mid", 1, False,
    )
    m = got["https://b.example/mid"]
    assert (m.final_url, m.n_hops, m.terminal) == (m.url, 0, False)
    assert got["https://b.example/ok"].terminal is True


def test_wat_metadata_links_title_and_edge_arms(spark):
    """WAT-shaped metadata: resolved/deduped/sorted links via the
    SHARED resolution rule, title extraction incl. attributes and
    case, NULL title when absent, malformed payload bytes survive the
    cast (U+FFFD, never an ANSI abort), unresolvable hrefs drop."""
    from dbqt_spark.sources.warc import wat_metadata

    rows = [
        ("f", "<1>", "https://h.example/a", "2024-01-01T00:00:00Z",
         "text/html", 200,
         '<HTML><head><TITLE lang="en"> Hello </TITLE></head>'
         '<a href="/x">1</a> <a href="/x#frag">dup</a> '
         '<a href="//cdn.example/y">2</a> '
         '<a href="https://abs.example/z">3</a> '
         '<a href="mailto:a@b">drop</a> <a href="rel/path">drop</a>'
         .encode()),
        ("f", "<2>", "https://h.example/b", "2024-01-01T00:00:00Z",
         "text/html", 200, b"<p>no title no links</p>"),
        ("f", "<3>", "https://h.example/c", "2024-01-01T00:00:00Z",
         "text/html", 200,
         b'<title>ok</title><a href="/p">x</a>\xff\xfe broken bytes'),
    ]
    parsed = spark.createDataFrame(
        rows,
        "warc_file string, record_id string, url string, "
        "warc_date string, mime string, http_status int, payload binary",
    )
    got = {r.record_id: r for r in wat_metadata(parsed).collect()}
    one = got["<1>"]
    assert one.title == "Hello"
    assert one.links == sorted([
        "https://h.example/x",
        "https://cdn.example/y",
        "https://abs.example/z",
    ])
    assert one.n_links == 3
    two = got["<2>"]
    assert two.title is None and two.n_links == 0 and two.links == []
    three = got["<3>"]
    assert three.title == "ok"
    assert three.links == ["https://h.example/p"]


def test_wet_conversion_record_round_trip(spark, tmp_path):
    """conversion records serialize -> build_warc -> read back: type,
    url, date, text/plain mime via the WARC-level fallback, payload
    bytes, deterministic id, and the Refers-To header all survive."""
    from dbqt_spark.sources.warc import (
        build_warc,
        read_warc,
        warc_conversion_record,
    )

    recs = [
        warc_conversion_record(
            f"https://ex.com/p/{i}",
            "2024-05-01T00:00:00Z",
            f"plain text body {i}".encode(),
            refers_to=f"<urn:uuid:src-{i}>",
        )
        for i in range(3)
    ]
    raw = b"".join(recs)
    assert b"WARC-Type: conversion" in raw
    assert b"WARC-Refers-To: <urn:uuid:src-1>" in raw
    assert b"Content-Type: text/plain" in raw

    p = tmp_path / "wet-00000.warc.wet.gz"
    p.write_bytes(build_warc(recs, gzip_per_record=True))
    rows = sorted(
        read_warc(spark, str(p), record_types=("conversion",)).collect(),
        key=lambda r: r.url,
    )
    assert len(rows) == 3
    for i, r in enumerate(rows):
        assert r.record_type == "conversion"
        assert r.url == f"https://ex.com/p/{i}"
        assert r.mime == "text/plain"
        assert r.http_status is None
        assert bytes(r.payload) == f"plain text body {i}".encode()
    # deterministic id: same input, same bytes
    again = warc_conversion_record(
        "https://ex.com/p/0", "2024-05-01T00:00:00Z", b"x"
    )
    rid = [
        ln for ln in again.split(b"\r\n") if ln.startswith(b"WARC-Record-ID")
    ][0]
    first = [
        ln
        for ln in recs[0].split(b"\r\n")
        if ln.startswith(b"WARC-Record-ID")
    ][0]
    assert rid == first  # id depends on (url, date) only


def test_wet_records_projection(spark):
    """wet_records: 2xx text rows become conversion rows with stripped
    text, the serializer-default conversion id, and refers_to lineage;
    non-text and error rows drop."""
    from dbqt_spark.sources.warc import (
        warc_conversion_record,
        wet_records,
    )

    rows = [
        ("f", "<urn:uuid:a>", "response", "https://ex.com/1",
         "2024-05-01T00:00:00Z", "text/html", 200, None,
         b"<p>Hello <b>world</b> &amp; co</p>"),
        ("f", "<urn:uuid:b>", "response", "https://ex.com/2",
         "2024-05-01T00:00:01Z", "image/png", 200, None, b"\x89PNG"),
        ("f", "<urn:uuid:c>", "response", "https://ex.com/3",
         "2024-05-01T00:00:02Z", "text/html", 404, None, b"gone"),
    ]
    from dbqt_spark.sources.warc import WARC_ROW_SCHEMA

    parsed = spark.createDataFrame(rows, WARC_ROW_SCHEMA)
    out = wet_records(parsed).collect()
    assert len(out) == 1
    r = out[0]
    assert r.record_type == "conversion" and r.mime == "text/plain"
    assert r.http_status is None and r.refers_to == "<urn:uuid:a>"
    assert bytes(r.payload) == b"Hello world & co"
    # the JVM-derived id == the serializer's default for (url, date)
    rec = warc_conversion_record(
        "https://ex.com/1", "2024-05-01T00:00:00Z", b""
    )
    rid = [
        ln
        for ln in rec.split(b"\r\n")
        if ln.startswith(b"WARC-Record-ID: ")
    ][0].split(b": ", 1)[1].decode()
    assert r.record_id == rid


def test_write_warc_archive_conversion_mode(spark, tmp_path):
    """The distributed sink writes a WET segment: returned frame
    matches a re-read, Refers-To headers land in the archive bytes,
    response-mode columns stay ignored."""
    from dbqt_spark.sources.warc import (
        WARC_ROW_SCHEMA,
        read_warc,
        wet_records,
        write_warc_archive,
    )

    rows = [
        ("f", f"<urn:uuid:src-{i}>", "response", f"https://ex.com/{i}",
         "2024-05-01T00:00:00Z", "text/html", 200, None,
         f"<p>doc {i} text</p>".encode())
        for i in range(5)
    ]
    parsed = spark.createDataFrame(rows, WARC_ROW_SCHEMA)
    wet = wet_records(parsed).repartition(1)
    out_dir = str(tmp_path / "wet")
    returned = write_warc_archive(
        wet,
        out_dir,
        record_kind="conversion",
        refers_to_col="refers_to",
        segment_prefix="wet",
    ).collect()
    assert len(returned) == 5
    assert all(r.record_type == "conversion" for r in returned)
    assert all(r.mime == "text/plain" for r in returned)
    assert all(r.http_status is None for r in returned)

    import glob
    import gzip as _gzip

    (seg,) = glob.glob(out_dir + "/*.warc.gz")
    raw = _gzip.open(seg, "rb").read()
    assert raw.count(b"WARC-Refers-To: <urn:uuid:src-") == 5

    reread = read_warc(
        spark, seg, record_types=("conversion",)
    ).collect()
    assert {bytes(r.payload) for r in reread} == {
        f"doc {i} text".encode() for i in range(5)
    }
    assert {r.record_id for r in reread} == {
        r.record_id for r in returned
    }
