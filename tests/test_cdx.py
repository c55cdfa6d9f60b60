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


def _write_archives(tmp_path, spark=None):
    """Two .warc.gz archives with deterministic captures + the parsed
    offset-carrying frame rows for each."""
    from dbqt_spark.sources.warc import (
        build_warc_indexed,
        warc_response_record,
    )

    files = {}
    for seg, urls in (
        ("seg-a.warc.gz",
         [("https://a.example/p/1", b"<html>alpha one</html>"),
          ("https://a.example/p/2", b"<html>alpha two</html>")]),
        ("seg-b.warc.gz",
         [("https://b.example/q/1", b"<html>beta one</html>")]),
    ):
        recs = [
            warc_response_record(u, "2024-03-01T00:00:01Z", body)
            for u, body in urls
        ]
        blob, index = build_warc_indexed(recs)
        (tmp_path / seg).write_bytes(blob)
        files[seg] = (urls, recs, blob, index)
    return files


def test_build_warc_indexed_offsets_are_seekable(tmp_path):
    """Each (offset, length) must select exactly one gzip member whose
    decompressed bytes are the original record — the property cdx_fetch
    relies on."""
    import gzip

    files = _write_archives(tmp_path)
    for seg, (urls, recs, blob, index) in files.items():
        assert len(index) == len(recs)
        assert sum(ln for _, ln in index) == len(blob)
        for rec, (off, ln) in zip(recs, index):
            member = blob[off:off + ln]
            assert gzip.decompress(member) == rec


def test_read_warc_with_offsets_matches_writer_index(spark, tmp_path):
    """The read-side member accounting must reproduce the writer's
    byte index — for the gzip layout AND the plain layout."""
    from dbqt_spark.sources.warc import (
        build_warc_indexed,
        read_warc,
        warc_response_record,
    )

    files = _write_archives(tmp_path)
    parsed = read_warc(spark, str(tmp_path), with_offsets=True)
    got = {
        (r.warc_file.split("/")[-1], r.url): (r.warc_offset, r.warc_length)
        for r in parsed.collect()
    }
    for seg, (urls, recs, blob, index) in files.items():
        for (u, _), coord in zip(urls, index):
            assert got[(seg, u)] == coord, (seg, u)
    # plain (uncompressed) layout via the counting reader
    recs = [
        warc_response_record(f"https://p.example/{i}",
                             "2024-03-01T00:00:02Z", b"x" * (10 + i))
        for i in range(3)
    ]
    blob, index = build_warc_indexed(recs, gzip_per_record=False)
    (tmp_path / "plain.warc").write_bytes(blob)
    rows = read_warc(
        spark, str(tmp_path / "plain.warc"), with_offsets=True
    ).orderBy("warc_offset").collect()
    assert [(r.warc_offset, r.warc_length) for r in rows] == index


def test_cdx_fetch_reads_only_the_target_byte_range(spark, tmp_path):
    """VERDICT r14 #3 'done' condition: fetching ONE capture touches
    only its archive file and only its byte range. Proven by
    corrupting every OTHER byte of the corpus — the other archive
    entirely, and the target archive outside [offset, offset+len) —
    and fetching successfully anyway."""
    from dbqt_spark.sources.cdx import cdx_fetch, cdx_index, parse_cdxj
    from dbqt_spark.sources.warc import read_warc

    files = _write_archives(tmp_path)
    parsed = read_warc(spark, str(tmp_path), with_offsets=True)
    # normalize warc_file to the bare segment name (fetch joins it to
    # archive_dir), then build + parse back the seekable index
    from pyspark.sql import functions as F

    parsed = parsed.withColumn(
        "warc_file", F.element_at(F.split("warc_file", "/"), -1)
    )
    text = "\n".join(
        f"{r.surt_key} {r.ts14} {r.cdxj}"
        for r in cdx_index(parsed).collect()
    )
    # the index is a FILE (as in real archives) — the fetch below must
    # not lazily recompute it from the archives we are about to corrupt
    (tmp_path / "index.cdxj").write_text(text + "\n")
    index = parse_cdxj(
        spark.read.text(str(tmp_path / "index.cdxj")).withColumnRenamed(
            "value", "line"
        )
    )
    assert index.filter(F.col("offset").isNull()).count() == 0

    # target: the second capture of seg-a (nonzero offset)
    urls, recs, blob, idx = files["seg-a.warc.gz"]
    off, ln = idx[1]
    assert off > 0
    # corrupt seg-b wholesale and seg-a outside the target range
    (tmp_path / "seg-b.warc.gz").write_bytes(b"\x00" * 10)
    garbled = b"\xff" * off + blob[off:off + ln] + b"\xff" * 7
    (tmp_path / "seg-a.warc.gz").write_bytes(garbled)

    got = cdx_fetch(
        index, str(tmp_path), surt_prefix="example,a)/p/2"
    ).collect()
    assert len(got) == 1
    assert got[0].url == "https://a.example/p/2"
    assert bytes(got[0].payload) == b"<html>alpha two</html>"
    assert got[0].surt_key == "example,a)/p/2"


def test_cdx_fetch_rejects_legacy_offsetless_lines(spark, tmp_path):
    """An index without byte coordinates cannot seek — cdx_fetch must
    fail with the re-index remedy, never silently scan the archive."""
    import pytest

    from dbqt_spark.sources.cdx import cdx_fetch, cdx_index, parse_cdxj
    from dbqt_spark.sources.warc import read_warc
    from pyspark.sql import functions as F

    _write_archives(tmp_path)
    parsed = read_warc(spark, str(tmp_path))  # no offsets -> legacy blob
    lines = cdx_index(parsed).select(
        F.concat_ws(" ", "surt_key", "ts14", "cdxj").alias("line")
    )
    index = parse_cdxj(lines)
    with pytest.raises(Exception, match="with_offsets"):
        cdx_fetch(index, str(tmp_path), surt_prefix="example,a)").collect()


def test_write_warc_archive_sink_round_trip_and_fetch(spark, tmp_path):
    """The write-side loop: corpus -> write_warc_archive (per-partition
    segments + offset-carrying frame, no archive re-read) -> cdx_index
    -> cdx_fetch seeks one capture. The returned frame must equal what
    read_warc(with_offsets=True) re-parses from the written files."""
    from dbqt_spark.sources.cdx import cdx_fetch, cdx_index, parse_cdxj
    from dbqt_spark.sources.warc import read_warc, write_warc_archive

    out = tmp_path / "archives"
    corpus = spark.createDataFrame(
        [
            (f"https://w{i % 3}.example/d/{i}",
             f"2024-04-01T00:00:{i:02d}Z",
             f"<html>doc {i}</html>".encode())
            for i in range(12)
        ],
        "url string, warc_date string, payload binary",
    ).repartition(3)
    written = write_warc_archive(corpus, str(out)).localCheckpoint()
    assert written.count() == 12
    segs = sorted(p.name for p in out.iterdir())
    assert len(segs) == 3 and all(s.endswith(".warc.gz") for s in segs)
    assert not any(s.endswith(".tmp") for s in segs)

    reread = read_warc(spark, str(out), with_offsets=True)
    from pyspark.sql import functions as F

    norm = reread.withColumn(
        "warc_file", F.element_at(F.split("warc_file", "/"), -1)
    )
    a = {
        (r.warc_file, r.url): (r.warc_offset, r.warc_length,
                               bytes(r.payload), r.record_id)
        for r in norm.collect()
    }
    b = {
        (r.warc_file, r.url): (r.warc_offset, r.warc_length,
                               bytes(r.payload), r.record_id)
        for r in written.collect()
    }
    assert a == b

    # index from the RETURNED frame (no re-read), then seek-fetch
    lines = cdx_index(written).select(
        F.concat_ws(" ", "surt_key", "ts14", "cdxj").alias("line")
    )
    index = parse_cdxj(lines)
    assert index.filter(F.col("offset").isNull()).count() == 0
    got = cdx_fetch(index, str(out), surt_prefix="example,w1)/d/7").collect()
    assert len(got) == 1
    assert bytes(got[0].payload) == b"<html>doc 7</html>"


def test_cdx_store_lookup_pushes_prefix_to_parquet(spark, tmp_path):
    """The parquet-persisted index must answer a SURT-prefix lookup
    with a PUSHED filter (StringStartsWith reaches the scan, ReadSchema
    stays narrow) — the partition-pruning claim behind 'domain lookups
    touch only their key range'."""
    from dbqt_spark.plans import formatted_plan
    from dbqt_spark.sources.cdx import cdx_index, cdx_lookup, cdx_store, \
        parse_cdxj

    rows = _parsed_fixture(spark)
    lines = cdx_index(rows).select(
        F.concat_ws(" ", "surt_key", "ts14", "cdxj").alias("line")
    )
    idx = parse_cdxj(lines)
    out = str(tmp_path / "cdxpq")
    cdx_store(idx, out, buckets=2)
    got = cdx_lookup(spark, out, surt_prefix="example,a)")
    plan = formatted_plan(got.select("surt_key", "ts14", "url"))
    assert "StartsWith" in plan, plan
    assert "PushedFilters" in plan
    keys = sorted(r.surt_key for r in got.collect())
    assert keys == ['example,a)/q?t="v"', "example,a)/x?a=1&b=2"]
    # ts window narrows further
    one = cdx_lookup(spark, out, surt_prefix="example,a)",
                     ts_from="20240301000003").collect()
    assert [r.surt_key for r in one] == ['example,a)/q?t="v"']


def test_cdx_dedup_picks_earliest_capture_per_digest(spark):
    from dbqt_spark.sources.cdx import cdx_dedup, cdx_index, parse_cdxj
    from dbqt_spark.sources.warc import WARC_ROW_SCHEMA

    rows = [
        # same bytes captured three times across two archives
        ("seg-a.warc.gz", "<1>", "response", "https://a.example/x",
         "2024-03-02T00:00:00Z", "text/html", 200, None, b"same"),
        ("seg-b.warc.gz", "<2>", "response", "https://b.example/y",
         "2024-03-01T00:00:00Z", "text/html", 200, None, b"same"),
        ("seg-a.warc.gz", "<3>", "response", "https://c.example/z",
         "2024-03-03T00:00:00Z", "text/html", 200, None, b"same"),
        # unique bytes
        ("seg-b.warc.gz", "<4>", "response", "https://d.example/w",
         "2024-03-01T00:00:05Z", "text/html", 200, None, b"other"),
    ]
    parsed = spark.createDataFrame(rows, WARC_ROW_SCHEMA)
    lines = cdx_index(parsed).select(
        F.concat_ws(" ", "surt_key", "ts14", "cdxj").alias("line")
    )
    got = {r.digest: r for r in cdx_dedup(parse_cdxj(lines)).collect()}
    import hashlib

    same = got[hashlib.md5(b"same").hexdigest()]
    assert same.n_dups == 3
    assert same.total_bytes == 12  # 3 captures x 4 payload bytes
    # earliest ts14 wins
    assert (same.ts14, same.url) == ("20240301000000",
                                     "https://b.example/y")
    other = got[hashlib.md5(b"other").hexdigest()]
    assert (other.n_dups, other.filename) == (1, "seg-b.warc.gz")


def test_cdx_cli_index_lookup_fetch_dedup(spark, tmp_path, capsys):
    """cdx CLI: index a WARC dir to a parquet store, look up a SURT
    prefix, seek-fetch the matching captures, and report duplicate
    groups — the full lifecycle through the tool surface."""
    from dbqt_spark.app import main

    _write_archives(tmp_path)
    store = str(tmp_path / "index.parquet")
    assert main([
        "cdx", "index", "--warc-dir", str(tmp_path),
        "--output-parquet", store, "--buckets", "2",
    ]) == 0
    out = str(tmp_path / "hits.parquet")
    assert main([
        "cdx", "fetch", "--warc-dir", str(tmp_path),
        "--index", store, "--surt-prefix", "example,a)/p/2",
        "--output-parquet", out,
    ]) == 0
    rows = spark.read.parquet(out).collect()
    assert [r.url for r in rows] == ["https://a.example/p/2"]
    assert bytes(rows[0].payload) == b"<html>alpha two</html>"
    # lookup prints rows; dedup reports groups (all payloads unique)
    assert main([
        "cdx", "lookup", "--index", store, "--surt-prefix", "example,b)",
    ]) == 0
    assert "example,b)/q/1" in capsys.readouterr().out
    assert main(["cdx", "dedup", "--index", store]) == 0
    assert "n_dups" in capsys.readouterr().out


def test_streaming_cdx_index_exactly_once_and_seekable(spark, tmp_path):
    """run_cdx_index_stream: segments index as they land (exactly-once
    across runs via the file-source checkpoint), lines carry byte
    offsets, and a capture fetched THROUGH the streamed index seeks
    straight into its archive."""
    from dbqt_spark.sources.cdx import cdx_fetch, parse_cdxj
    from dbqt_spark.streaming.crawl import run_cdx_index_stream

    drop = tmp_path / "drop"
    drop.mkdir()
    idx_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    files = _write_archives(drop)

    run_cdx_index_stream(spark, str(drop), idx_dir, ckpt)
    lines = spark.read.text(idx_dir).withColumnRenamed("value", "line")
    n1 = lines.count()
    assert n1 == 3  # 2 + 1 captures
    # re-run: nothing new, no duplicate lines
    run_cdx_index_stream(spark, str(drop), idx_dir, ckpt)
    assert spark.read.text(idx_dir).count() == n1
    # a third segment lands -> exactly its captures append
    from dbqt_spark.sources.warc import build_warc, warc_response_record

    (drop / "seg-c.warc.gz").write_bytes(
        build_warc([warc_response_record(
            "https://c.example/n/1", "2024-03-02T00:00:00Z", b"<html>c</html>"
        )])
    )
    run_cdx_index_stream(spark, str(drop), idx_dir, ckpt)
    idx = parse_cdxj(
        spark.read.text(idx_dir).withColumnRenamed("value", "line")
    )
    assert idx.count() == n1 + 1
    assert idx.filter("offset IS NULL").count() == 0
    got = cdx_fetch(idx, str(drop), surt_prefix="example,b)/q/1").collect()
    assert len(got) == 1
    assert bytes(got[0].payload) == b"<html>beta one</html>"


def test_cdx_delta_statuses_and_latest_per_key_window(spark):
    """All four statuses from typed index frames, with the latest-per-
    key window picking the newest capture (an intermediate edit plus a
    later revert must report 'unchanged')."""
    from dbqt_spark.sources.cdx import cdx_delta

    cols = "surt_key string, ts14 string, url string, digest string"

    def idx(rows):
        return spark.createDataFrame(rows, cols)

    old = idx([
        ("com,a)/p1", "20240301000000", "https://a.com/p1", "d1"),
        ("com,a)/p2", "20240301000000", "https://a.com/p2", "d2"),
        ("com,a)/p3", "20240301000000", "https://a.com/p3", "d3"),
        # p3 also has an older capture — latest (d3) must win
        ("com,a)/p3", "20240229000000", "https://a.com/p3", "stale"),
        ("com,a)/gone", "20240301000000", "https://a.com/gone", "dg"),
    ])
    new = idx([
        ("com,a)/p1", "20240302000000", "https://a.com/p1", "d1"),
        ("com,a)/p2", "20240302000000", "https://a.com/p2", "d2x"),
        # p3: intermediate edit then revert -> unchanged
        ("com,a)/p3", "20240302000000", "https://a.com/p3", "tmp"),
        ("com,a)/p3", "20240303000000", "https://a.com/p3", "d3"),
        ("com,a)/new", "20240302000000", "https://a.com/new", "dn"),
    ])
    got = {
        r.surt_key: (r.status, r.old_digest, r.new_digest, r.url)
        for r in cdx_delta(old, new).collect()
    }
    assert got["com,a)/p1"] == ("unchanged", "d1", "d1", "https://a.com/p1")
    assert got["com,a)/p2"] == ("changed", "d2", "d2x", "https://a.com/p2")
    assert got["com,a)/p3"] == ("unchanged", "d3", "d3", "https://a.com/p3")
    assert got["com,a)/gone"] == ("gone", "dg", None, "https://a.com/gone")
    assert got["com,a)/new"] == ("new", None, "dn", "https://a.com/new")
    assert len(got) == 5


def test_cdx_delta_same_second_refetch_tiebreak_is_deterministic(spark):
    """Two same-ts14 captures of one key: the (ts14, digest, url) desc
    total order picks the max digest on BOTH sides — re-runs and
    repartitionings cannot flip the verdict."""
    from dbqt_spark.sources.cdx import cdx_delta

    cols = "surt_key string, ts14 string, url string, digest string"
    old = spark.createDataFrame(
        [("com,a)/p", "20240301000000", "u", "aaa"),
         ("com,a)/p", "20240301000000", "u", "zzz")], cols
    )
    new = spark.createDataFrame(
        [("com,a)/p", "20240302000000", "u", "zzz"),
         ("com,a)/p", "20240302000000", "u", "aaa")], cols
    )
    rows = cdx_delta(old, new).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.status, r.old_digest, r.new_digest) == (
        "unchanged", "zzz", "zzz"
    )


def test_cdx_delta_shuffles_only_on_the_index_sort_key(spark):
    """Scale shape: the per-side latest-per-key windows are the ONLY
    shuffles — the full-outer join runs on the same surt_key
    partitioning (or broadcasts under AQE), never re-exchanging the
    frames on another key."""
    import re

    from dbqt_spark.plans import formatted_plan
    from dbqt_spark.sources.cdx import cdx_delta

    cols = "surt_key string, ts14 string, url string, digest string"
    idx = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).selectExpr(
        "'com,x)/' || doc_id AS surt_key",
        "'20240301000000' AS ts14",
        "'https://x.com/' || doc_id AS url",
        "md5(text) AS digest",
    )
    plan = formatted_plan(cdx_delta(idx, idx))
    tree = plan.split("\n\n")[0]
    shuffles = [
        ln for ln in tree.splitlines() if re.search(r"\bExchange\b", ln)
    ]
    assert len(shuffles) <= 2, tree
    # and every exchange block keys on surt_key
    for block in re.split(r"\n\n", plan):
        if re.match(r"\(\d+\) Exchange", block.strip()):
            assert "surt_key#" in block, block


def test_cdx_cli_delta(spark, tmp_path, capsys):
    """cdx delta CLI: diff two stored snapshots — seg-a alone vs the
    full crawl — prints new/unchanged verdicts."""
    from dbqt_spark.app import main

    old_dir = tmp_path / "old"
    new_dir = tmp_path / "new"
    old_dir.mkdir()
    new_dir.mkdir()
    _write_archives(new_dir)
    # old snapshot = only seg-a's captures
    import shutil

    shutil.copy(new_dir / "seg-a.warc.gz", old_dir / "seg-a.warc.gz")
    old_store = str(tmp_path / "old.parquet")
    new_store = str(tmp_path / "new.parquet")
    for src, store in ((old_dir, old_store), (new_dir, new_store)):
        assert main([
            "cdx", "index", "--warc-dir", str(src),
            "--output-parquet", store,
        ]) == 0
    out = str(tmp_path / "delta.parquet")
    assert main([
        "cdx", "delta", "--old-index", old_store, "--index", new_store,
        "--output-parquet", out,
    ]) == 0
    got = {
        r.surt_key: r.status for r in spark.read.parquet(out).collect()
    }
    assert got == {
        "example,a)/p/1": "unchanged",
        "example,a)/p/2": "unchanged",
        "example,b)/q/1": "new",
    }
    # missing --old-index is a usage error
    import pytest

    with pytest.raises(SystemExit):
        main(["cdx", "delta", "--index", new_store])
