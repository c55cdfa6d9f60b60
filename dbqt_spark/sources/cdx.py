"""CDX(J) web-archive index — build from a parsed crawl, read back.

Beyond the reference surface (north-star crawl-pipeline format): every
WARC archive ships with a CDX index — one line per capture, keyed by
the SURT-transformed URL plus a 14-digit timestamp, with a compact
JSON blob of capture metadata (the Common Crawl / OpenWayback CDXJ
convention, a public format). The index answers "which captures exist
for this URL / this domain?" WITHOUT touching the archives, and the
SURT key ordering turns per-domain lookups into contiguous RANGE
scans.

Two directions, both pure JVM expressions (no UDF, no shuffle beyond
the final sort):

- ``cdx_index``: parsed WARC rows (``WARC_ROW_SCHEMA`` — the
  ``read_warc`` output) -> ``(surt_key, ts14, cdxj)`` CDXJ lines. The
  JSON blob is built with ``concat`` (not ``to_json``) so the bytes
  are engine-reproducible; url/filename strings get minimal JSON
  escaping (backslash, quote). Digest = md5 of the payload bytes —
  the exact-dup fingerprint the dedup tiers already use, so an index
  row can pre-answer "have I stored these bytes?".
- ``parse_cdxj``: CDXJ text lines -> typed columns (``from_json``
  with the fixed schema — Jackson JVM-side, no Python).

Scale shape: building the index is one narrow projection per capture
row; the ``orderBy(surt_key, ts14)`` is THE product (a CDX file IS
its sort order — range-scannable, mergeable). At 100 TB write it
sorted/partitioned by surt prefix and domain lookups become partition
pruning + a range predicate; the corpus payload column never moves —
only the ~200 B index rows shuffle in the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the capture-metadata fields a CDXJ blob carries (fixed public set).
#: ``offset``/``warc_length`` are the record's stored byte coordinates
#: in the archive (gzip member start + compressed length — what makes
#: the index SEEKABLE); absent in legacy lines, they parse as NULL.
#: House divergence from Common Crawl CDXJ: ``length`` here is the
#: PAYLOAD byte count (the dedup-tier fingerprint pair of ``digest``);
#: the stored/compressed size lives in ``warc_length``.
CDXJ_SCHEMA = (
    "url string, mime string, status int, digest string, "
    "length bigint, offset bigint, warc_length bigint, filename string"
)


def _json_escape(col):
    """Minimal JSON string escaping (backslash first, then quote) —
    enough for URL/filename fields, engine-portable."""
    return F.regexp_replace(
        F.regexp_replace(col, r"\\", r"\\\\"), '"', r'\\"'
    )


def cdx_index(
    parsed: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    sort: bool = True,
) -> DataFrame:
    """CDXJ index lines from a parsed WARC frame: ``(surt_key, ts14,
    cdxj)`` sorted by (surt_key, ts14) — the archive-lookup index.
    ``sort=False`` skips the global sort for STREAMING frames (a
    stream cannot sort; per-batch unsorted lines merge-sort at read
    or ``cdx_store`` time — the standard per-segment-then-merge CDX
    workflow).
    Rows whose URL yields no SURT key (non-URL targets) are dropped:
    they cannot be looked up. ``ts14`` is the WARC date's digits
    (``YYYYMMDDHHMMSS``).

    When the parsed frame carries ``warc_offset``/``warc_length``
    (``read_warc(..., with_offsets=True)`` or a
    ``build_warc_indexed`` sink), the blob gains ``offset`` and
    ``warc_length`` — the capture becomes SEEKABLE: ``cdx_fetch``
    reads exactly ``[offset, offset+warc_length)`` of the named
    archive, never the rest (VERDICT r14 #3). Without them the blob
    keeps the legacy enumerate/dedup-only shape."""
    from ..operators.urltools import surt_col

    key = surt_col(F.col(url_col))
    seekable = (
        "warc_offset" in parsed.columns and "warc_length" in parsed.columns
    )
    offset_fields = (
        (
            F.lit(',"offset":'),
            F.coalesce(F.col("warc_offset").cast("string"), F.lit("-1")),
            F.lit(',"warc_length":'),
            F.coalesce(F.col("warc_length").cast("string"), F.lit("-1")),
        )
        if seekable
        else ()
    )
    # digits of the WARC date, truncated to 14 (fractional-second
    # dates carry 15+ digits); a NULL/short date yields no usable key
    # and the row is dropped below — a NULL ts14 would serialize to a
    # malformed line that parse-back silently discards
    ts_digits = F.regexp_replace(F.col(date_col), r"[^0-9]", "")
    ts14 = F.substring(ts_digits, 1, 14)
    blob = F.concat(
        F.lit('{"url":"'),
        _json_escape(F.col(url_col)),
        F.lit('","mime":"'),
        F.coalesce(_json_escape(F.col("mime")), F.lit("")),
        F.lit('","status":'),
        F.coalesce(F.col("http_status").cast("string"), F.lit("-1")),
        F.lit(',"digest":"'),
        F.md5(F.coalesce(F.col("payload"), F.lit(b""))),
        F.lit('","length":'),
        F.coalesce(
            F.length(F.col("payload")).cast("string"), F.lit("0")
        ),
        *offset_fields,
        F.lit(',"filename":"'),
        F.coalesce(_json_escape(F.col("warc_file")), F.lit("")),
        F.lit('"}'),
    )
    out = (
        parsed.filter(key.isNotNull() & (F.length(ts_digits) >= 14))
        .select(
            key.alias("surt_key"),
            ts14.alias("ts14"),
            blob.alias("cdxj"),
        )
    )
    return out.orderBy("surt_key", "ts14") if sort else out


def parse_cdxj(
    df: DataFrame, line_col: str = "line"
) -> DataFrame:
    """Typed capture rows from CDXJ text lines: ``(surt_key, ts14,
    url, mime, status, digest, length, filename)``. Lines that do not
    split into key/timestamp/JSON (comments, blanks) are dropped; JSON
    fields that fail to parse surface as NULL columns (``from_json``
    permissive mode), never a job abort — real CDX files are
    machine-written but real pipelines still meet truncated ones."""
    # ONE 3-way split per line (limit=3 keeps spaces inside the JSON
    # blob intact), then cheap shape checks — not three regex passes:
    # at archive-index scale the per-line parse cost is the operator
    line = F.trim(F.col(line_col))
    parts = F.split(line, " ", 3)
    # try_element_at: a short line (blank, comment) yields NULLs that
    # the validity mask drops — plain element_at ABORTS under ANSI
    surt = F.try_element_at(parts, F.lit(1))
    ts14 = F.try_element_at(parts, F.lit(2))
    blob = F.try_element_at(parts, F.lit(3))
    valid = (
        (F.size(parts) == 3)
        & surt.rlike(r"^\S+$")
        & ts14.rlike(r"^\d{14}$")
        & blob.startswith("{")
        & blob.endswith("}")
    )
    parsed = df.select(
        surt.alias("surt_key"),
        ts14.alias("ts14"),
        F.from_json(blob, CDXJ_SCHEMA).alias("__j"),
        valid.alias("__ok"),
    ).filter(F.col("__ok"))
    return parsed.select(
        "surt_key",
        "ts14",
        F.col("__j.url").alias("url"),
        F.col("__j.mime").alias("mime"),
        F.col("__j.status").alias("status"),
        F.col("__j.digest").alias("digest"),
        F.col("__j.length").alias("length"),
        F.col("__j.offset").alias("offset"),
        F.col("__j.warc_length").alias("warc_length"),
        F.col("__j.filename").alias("filename"),
    )


def cdx_store(
    index: DataFrame,
    path: str,
    buckets: int = 0,
    mode: str = "overwrite",
) -> None:
    """Persist a typed CDX index (``parse_cdxj`` columns) as parquet
    laid out for LOOKUP: range-partitioned and sorted by
    ``(surt_key, ts14)``, so every file covers one contiguous SURT
    range and its footer min/max stats answer a prefix predicate —
    ``cdx_lookup`` then reads only the files whose range can match
    (row-group pruning + pushed filters, no index scan). ``buckets``
    sets the file count (0 = let the current partitioning stand,
    sorted within partitions)."""
    df = index
    if buckets > 0:
        df = df.repartitionByRange(buckets, F.col("surt_key"), F.col("ts14"))
    df.sortWithinPartitions("surt_key", "ts14").write.mode(mode).parquet(
        path
    )


def cdx_lookup(
    spark,
    path: str,
    surt_prefix: "str | None" = None,
    ts_from: "str | None" = None,
    ts_to: "str | None" = None,
) -> DataFrame:
    """Capture lookup over a ``cdx_store`` parquet index: the SURT
    prefix becomes a ``startswith`` predicate the parquet scan pushes
    down (``PushedFilters: [StringStartsWith(surt_key, ...)]`` — the
    range-sorted layout makes file/row-group min-max stats decisive),
    so a domain query touches only its key range's files regardless
    of index size. Compose with ``cdx_fetch`` for the byte reads."""
    df = spark.read.parquet(path)
    if surt_prefix is not None:
        df = df.filter(F.col("surt_key").startswith(surt_prefix))
    if ts_from is not None:
        df = df.filter(F.col("ts14") >= ts_from)
    if ts_to is not None:
        df = df.filter(F.col("ts14") <= ts_to)
    return df


def cdx_dedup(index: DataFrame) -> DataFrame:
    """Exact-duplicate triage WITHOUT touching the archives: the CDXJ
    digest is md5 of the payload bytes (the dedup tiers' exact-dup
    fingerprint), so grouping the INDEX by digest answers "which
    captures store identical bytes" from ~200 B rows. Keeps the
    earliest capture per digest (ts14, then surt_key, then filename —
    a total order), with ``n_dups`` and the kept capture's
    coordinates; one map-side-combined aggregate, payload never
    moves. The 100 TB shape of "have I already stored these bytes?"."""
    first = F.min(
        F.struct("ts14", "surt_key", "filename", "offset", "warc_length",
                 "url")
    ).alias("__first")
    return (
        index.groupBy("digest")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dups"),
            F.sum("length").cast("long").alias("total_bytes"),
            first,
        )
        .select(
            "digest",
            "n_dups",
            "total_bytes",
            F.col("__first.ts14").alias("ts14"),
            F.col("__first.surt_key").alias("surt_key"),
            F.col("__first.url").alias("url"),
            F.col("__first.filename").alias("filename"),
            F.col("__first.offset").alias("offset"),
            F.col("__first.warc_length").alias("warc_length"),
        )
    )


def cdx_fetch(
    index: DataFrame,
    archive_dir: str,
    surt_prefix: "str | None" = None,
    ts_from: "str | None" = None,
    ts_to: "str | None" = None,
    record_types: "tuple[str, ...] | None" = None,
) -> DataFrame:
    """Targeted capture fetch THROUGH the index (VERDICT r14 #3 — what
    makes a CDX index an INDEX at 100 TB): filter the typed index
    frame (``parse_cdxj`` output, or ``cdx_index`` parsed back) by a
    SURT-key prefix and optional ts14 range, then read ONLY each hit's
    ``[offset, offset+warc_length)`` byte range from its archive file
    — one ``seek``+bounded ``read`` per capture, never a file scan.

    Returns parsed rows (``WARC_ROW_SCHEMA`` + the echoed
    ``surt_key``/``ts14``). Rows without offset coordinates (legacy
    index lines) raise — an un-seekable line silently falling back to
    a full archive scan would hide an O(file) cost inside an O(record)
    API; re-index with ``read_warc(..., with_offsets=True)``.

    Scale shape: the prefix predicate is a range over the index's own
    sort/partition order (``startswith`` pushes to parquet min/max
    stats — partition pruning, not a scan), and the fetch stage is a
    ``mapInPandas`` over the NARROW (filename, offset, length) hit
    rows — parallelism follows the hit count, payload bytes move only
    for fetched captures."""
    import os

    from .warc import WARC_ROW_SCHEMA, rows_from_stream

    hits = index
    if surt_prefix is not None:
        hits = hits.filter(F.col("surt_key").startswith(surt_prefix))
    if ts_from is not None:
        hits = hits.filter(F.col("ts14") >= ts_from)
    if ts_to is not None:
        hits = hits.filter(F.col("ts14") <= ts_to)
    coords = hits.select("surt_key", "ts14", "filename", "offset",
                         "warc_length")
    types = tuple(record_types) if record_types is not None else None
    out_schema = WARC_ROW_SCHEMA + ", surt_key string, ts14 string"

    def fetch(batches):
        import io as _io

        import pandas as pd

        cols = [c.split()[0] for c in out_schema.split(", ")]
        for pdf in batches:
            rows = []
            # one handle per distinct file per batch (a prefix-range
            # fetch hits many captures of ONE segment — opening per
            # capture would be O(captures) syscalls)
            handles: dict = {}
            try:
                for surt, ts14, fname, off, ln in zip(
                    pdf["surt_key"],
                    pdf["ts14"],
                    pdf["filename"],
                    pdf["offset"],
                    pdf["warc_length"],
                ):
                    # NULL coordinates parse back as NaN; a legacy
                    # frame that carried the columns serializes them
                    # as -1 — both mean "cannot seek", and a negative
                    # length would silently read to EOF (every
                    # remaining record under one capture's key)
                    if (
                        off is None
                        or ln is None
                        or pd.isna(off)
                        or pd.isna(ln)
                        or int(off) < 0
                        or int(ln) <= 0
                    ):
                        raise ValueError(
                            "cdx_fetch: index line for %r has no usable "
                            "offset/warc_length — re-index the archive "
                            "with read_warc(..., with_offsets=True)"
                            % (surt,)
                        )
                    fname = str(fname)
                    fh = handles.get(fname)
                    if fh is None:
                        fh = open(os.path.join(archive_dir, fname), "rb")
                        handles[fname] = fh
                    fh.seek(int(off))
                    member = fh.read(int(ln))
                    for row in rows_from_stream(
                        _io.BytesIO(member), fname, types
                    ):
                        rows.append(row + (surt, ts14))
            finally:
                for fh in handles.values():
                    fh.close()
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return coords.mapInPandas(fetch, schema=out_schema)


def cdx_delta(
    old: DataFrame,
    new: DataFrame,
) -> DataFrame:
    """Cross-snapshot crawl diff from the indexes alone: what changed
    between two crawls of the same web, answered from ~200 B CDX rows
    without touching either snapshot's archives — the scheduling input
    for incremental recrawls ("fetch only 'changed'+'new'") and the
    freshness report between corpus versions.

    Per side, the LATEST capture per ``surt_key`` wins (``ts14`` desc,
    then digest/url desc — a total order, so re-runs are bit-stable
    even when a snapshot holds same-second refetches). The two latest
    frames full-outer join on the key:

    - ``new``       — key only in the new snapshot
    - ``gone``      — key only in the old snapshot
    - ``changed``   — both, latest payload digests differ
    - ``unchanged`` — both, latest digests equal (refetch, same bytes)

    Scale shape: one window per side partitioned by ``surt_key`` and
    one join on the SAME key — frames read from ``cdx_store`` arrive
    range-partitioned and sorted by exactly that key, so the exchanges
    align and only index rows ever move. Output is one row per live-
    or-formerly-live key with both sides' coordinates."""
    from pyspark.sql.window import Window

    def latest(df: DataFrame, side: str) -> DataFrame:
        w = Window.partitionBy("surt_key").orderBy(
            F.col("ts14").desc(), F.col("digest").desc(),
            F.col("url").desc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                "surt_key",
                F.col("url").alias(f"{side}_url"),
                F.col("ts14").alias(f"{side}_ts14"),
                F.col("digest").alias(f"{side}_digest"),
            )
        )

    o, n = latest(old, "old"), latest(new, "new")
    j = o.join(n, "surt_key", "full_outer")
    status = (
        F.when(F.col("old_ts14").isNull(), F.lit("new"))
        .when(F.col("new_ts14").isNull(), F.lit("gone"))
        .when(F.col("old_digest") == F.col("new_digest"),
              F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "surt_key",
        status.alias("status"),
        F.coalesce("new_url", "old_url").alias("url"),
        "old_ts14",
        "new_ts14",
        "old_digest",
        "new_digest",
    )
