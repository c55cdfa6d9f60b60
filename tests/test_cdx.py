"""SURT keys + CDXJ index build/parse (sources/cdx.py)."""

from pyspark.sql import functions as F

from dbqt_spark.operators.urltools import surt_col
from dbqt_spark.sources.cdx import cdx_index, parse_cdxj


def test_surt_transform_table(spark):
    cases = [
        ("http://www.Example.com:80/A/b?y=2&x=1",
         "com,example,www)/a/b?x=1&y=2"),
        # conventional root form + preserved trailing slash (ADVICE
        # r14: keys must range-match external CDX indexes)
        ("https://example.com/", "com,example)/"),
        ("https://example.com", "com,example)/"),
        ("https://sub.a.example.com/Deep/Path/",
         "com,example,a,sub)/deep/path/"),
        ("http://example.com:8080/p", "com,example:8080)/p"),
        ("https://user:pw@example.com/p#frag", "com,example)/p"),
        ("ftp://files.example.com/x", "com,example,files)/x"),
        ("not a url", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)],
        "i long, url string",
    )
    got = {
        r.i: r.s
        for r in df.select("i", surt_col("url").alias("s")).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)
    # the range property: a domain and its subdomains share a prefix
    assert got[3].startswith("com,example,")


def _parsed_fixture(spark):
    rows = [
        ("seg-00000.warc.gz", "<id1>", "response",
         "https://B.example/Page/One", "2024-03-01T00:00:01Z",
         "text/html", 200, None, b"<html>one</html>"),
        ("seg-00000.warc.gz", "<id2>", "response",
         "https://a.example/x?b=2&a=1", "2024-03-01T00:00:02Z",
         "text/plain", 404, None, b"gone"),
        # non-URL target: no SURT key, dropped from the index
        ("seg-00000.warc.gz", "<id3>", "response",
         "urn:uuid:opaque", "2024-03-01T00:00:03Z",
         "text/plain", 200, None, b"x"),
        # a quote in the URL must stay valid JSON
        ("seg-00001.warc", "<id4>", "response",
         'https://a.example/q?t="v"', "2024-03-01T00:00:04Z",
         "text/html", 200, None, b"q"),
    ]
    from dbqt_spark.sources.warc import WARC_ROW_SCHEMA

    return spark.createDataFrame(rows, WARC_ROW_SCHEMA)


def test_cdx_index_lines_and_order(spark):
    idx = cdx_index(_parsed_fixture(spark)).collect()
    assert [r.surt_key for r in idx] == [
        'example,a)/q?t="v"',
        "example,a)/x?a=1&b=2",
        "example,b)/page/one",
    ]
    one = idx[2]
    assert one.ts14 == "20240301000001"
    import hashlib
    import json

    blob = json.loads(one.cdxj)
    assert blob["url"] == "https://B.example/Page/One"
    assert blob["status"] == 200
    assert blob["length"] == len(b"<html>one</html>")
    assert blob["digest"] == hashlib.md5(b"<html>one</html>").hexdigest()
    assert blob["filename"] == "seg-00000.warc.gz"
    # the quoted-URL line is still parseable JSON
    assert json.loads(idx[0].cdxj)["url"] == 'https://a.example/q?t="v"'


def test_cdxj_round_trip_and_junk_lines(spark):
    idx = cdx_index(_parsed_fixture(spark))
    lines = idx.select(
        F.concat_ws(" ", "surt_key", "ts14", "cdxj").alias("line")
    )
    junk = spark.createDataFrame(
        [(" ",), ("# comment",), ("broken line without json",)],
        "line string",
    )
    back = parse_cdxj(lines.unionByName(junk)).collect()
    assert len(back) == 3  # junk dropped
    by_key = {r.surt_key: r for r in back}
    r = by_key["example,b)/page/one"]
    assert (r.url, r.mime, r.status, r.length, r.filename) == (
        "https://B.example/Page/One", "text/html", 200, 16,
        "seg-00000.warc.gz",
    )
    import hashlib

    assert r.digest == hashlib.md5(b"<html>one</html>").hexdigest()


def test_database_kind_cdx(spark, tmp_path):
    """kind: cdx — CDXJ files are discoverable tables that load as
    typed capture frames (gz transparently); remote roots fail
    discovery with the remedy named (the warc contract)."""
    import gzip

    import pytest

    from dbqt_spark.sources.database import connect

    idx = cdx_index(_parsed_fixture(spark))
    lines = "\n".join(
        f"{r.surt_key} {r.ts14} {r.cdxj}" for r in idx.collect()
    )
    d = tmp_path / "cdx"
    d.mkdir()
    (d / "idx-00000.cdxj").write_text(lines + "\n")
    (d / "idx-00001.cdx.gz").write_bytes(
        gzip.compress((lines + "\n").encode())
    )
    db = connect(spark, {"type": "cdx", "path": str(d)})
    assert db.list_tables() == ["idx-00000", "idx-00001"]
    plain = db.load("idx-00000")
    assert plain.count() == 3
    row = plain.filter("surt_key = 'example,b)/page/one'").collect()[0]
    assert (row.url, row.status, row.filename) == (
        "https://B.example/Page/One", 200, "seg-00000.warc.gz",
    )
    # gz arm parses identically
    assert sorted(r.surt_key for r in db.load("idx-00001").collect()) == \
        sorted(r.surt_key for r in plain.collect())
    with pytest.raises(ValueError, match="remote cdx roots"):
        connect(spark, {"type": "cdx", "path": "s3a://b/idx"}).list_tables()


def test_cdx_index_sort_is_narrow(spark):
    """The index sort must move only the ~200 B (surt_key, ts14, cdxj)
    rows — the payload bytes fold into digest/length inside the
    pre-sort projection and never ride the range exchange."""
    import re

    from dbqt_spark.plans import formatted_plan

    plan = formatted_plan(cdx_index(_parsed_fixture(spark)))
    for block in re.split(r"\n\n", plan):
        if re.match(r"\(\d+\) Exchange", block.strip()):
            assert "payload#" not in block, block
    assert "rangepartitioning" in plan


def test_cdx_index_drops_dateless_rows_and_truncates_fractional(spark):
    """A NULL/short WARC date cannot key a capture (the row drops —
    it would serialize to a malformed line the parser silently
    discards); fractional-second dates truncate to 14 digits."""
    from dbqt_spark.sources.warc import WARC_ROW_SCHEMA

    rows = [
        ("f", "<a>", "response", "https://a.example/x", None,
         "text/html", 200, None, b"x"),
        ("f", "<b>", "response", "https://a.example/y",
         "2024-03-01T00:00:01.123456Z", "text/html", 200, None, b"y"),
        ("f", "<c>", "response", "https://a.example/z", "2024",
         "text/html", 200, None, b"z"),
    ]
    idx = cdx_index(
        spark.createDataFrame(rows, WARC_ROW_SCHEMA)
    ).collect()
    assert [(r.surt_key, r.ts14) for r in idx] == [
        ("example,a)/y", "20240301000001"),
    ]


def test_surt_fragment_never_leaks_into_the_key(spark):
    """A '?' inside the fragment (the SPA pattern) is not a query —
    two captures differing only in fragment share one index key."""
    df = spark.createDataFrame(
        [(1, "https://app.example/#/x?tab=1"),
         (2, "https://app.example/"),
         (3, "https://app.example/p?a=1#frag?b=2")],
        "i long, url string",
    )
    got = {
        r.i: r.s
        for r in df.select("i", surt_col("url").alias("s")).collect()
    }
    assert got[1] == "example,app)/"
    assert got[1] == got[2]
    assert got[3] == "example,app)/p?a=1"
