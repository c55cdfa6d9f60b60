"""CLI regression tests — app.main() driven in-process (reuses the test
SparkSession via getOrCreate)."""

import os

import pytest

from dbqt_spark.app import main


def _write(path, text):
    with open(path, "w") as f:
        f.write(text)
    return str(path)


def test_help_lists_tools(capsys):
    assert main([]) == 0
    out = capsys.readouterr().out
    assert "dbstats" in out and "colcompare" in out and "findkey->keyfinder" in out


def test_unknown_tool():
    assert main(["nosuch"]) == 2


def test_rowcount_and_nullcheck(spark, sf_dir, tmp_path, capsys):
    cfg = _write(
        tmp_path / "c.yaml",
        f"connection:\n  type: parquet\n  path: {sf_dir}\n"
        "excluded_tables:\n  - 'e%'\n",
    )
    out_html = str(tmp_path / "r.html")
    assert main(["rowcount", "--config", cfg, "--output", out_html]) == 0
    assert os.path.exists(out_html)

    out_md = str(tmp_path / "n.md")
    assert main(["nullcheck", "--config", cfg, "--output", out_md]) == 0
    md = open(out_md).read()
    assert "# Null Column Check Results" in md
    assert "## LINEITEM" in md
    assert "EVENTS" not in md  # excluded by pattern
    assert "EMBEDDINGS" not in md


def test_dbstats_dual_with_pair_csv(spark, sf_dir, tmp_path):
    src = _write(
        tmp_path / "s.yaml",
        f"connection:\n  type: parquet\n  path: {sf_dir}\n"
        f"tables_file: {tmp_path / 'pairs.csv'}\n",
    )
    tgt = _write(
        tmp_path / "t.yaml",
        f"connection:\n  type: parquet\n  path: {sf_dir}\n",
    )
    _write(
        tmp_path / "pairs.csv",
        "source_table,target_table\norders,orders\nlineitem,lineitem\n",
    )
    out_html = str(tmp_path / "d.html")
    assert (
        main(
            [
                "dbstats",
                "--config",
                src,
                "--target-config",
                tgt,
                "--output",
                out_html,
            ]
        )
        == 0
    )
    html = open(out_html).read()
    assert '"difference": 0' in html


def test_dbstats_dual_pair_csv_honors_exclusions(spark, sf_dir, tmp_path):
    """CSV-listed PAIRS are filtered by the union of both configs'
    excluded_tables (reference utils.py:241-254): the rowcount phase
    must skip the same tables colcompare skips — here 'lineitem'
    matches only the TARGET config's pattern yet must vanish from the
    counts tab too."""
    src = _write(
        tmp_path / "s.yaml",
        f"connection:\n  type: parquet\n  path: {sf_dir}\n"
        f"tables_file: {tmp_path / 'pairs.csv'}\n",
    )
    tgt = _write(
        tmp_path / "t.yaml",
        f"connection:\n  type: parquet\n  path: {sf_dir}\n"
        "excluded_tables:\n  - 'line%'\n",
    )
    _write(
        tmp_path / "pairs.csv",
        "source_table,target_table\norders,orders\nlineitem,lineitem\n",
    )
    out_html = str(tmp_path / "d.html")
    assert main(
        ["dbstats", "--config", src, "--target-config", tgt,
         "--output", out_html]
    ) == 0
    html = open(out_html).read()
    assert "orders" in html
    assert "lineitem" not in html


def test_keyfinder_cli(spark, sf_dir, capsys):
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        cfg = _write(
            os.path.join(d, "c.yaml"),
            f"connection:\n  type: parquet\n  path: {sf_dir}\n",
        )
        assert main(["findkey", "--config", cfg, "--table", "orders"]) == 0
        out = capsys.readouterr().out
        assert "o_orderkey" in out


def test_dbstats_honors_csv_connection_kind(spark, tmp_path, capsys):
    """A csv-kind config must produce REAL counts through Database.load,
    not ERROR notes from assuming <root>/<table>.parquet."""
    (tmp_path / "people.csv").write_text("id,name\n1,ann\n2,bo\n3,cy\n")
    (tmp_path / "pets.csv").write_text("pet_id,kind\n1,cat\n")
    cfg = _write(
        tmp_path / "c.yaml",
        f"connection:\n  type: csv\n  path: {tmp_path}\n",
    )
    out_html = str(tmp_path / "s.html")
    assert main(["dbstats", "--config", cfg, "--output", out_html]) == 0
    html = open(out_html).read()
    assert '"row_count": 3' in html and '"row_count": 1' in html
    assert "ERROR" not in html


def test_dbstats_dual_two_sources_one_target(spark, sf_dir, tmp_path):
    """Two source tables paired with the SAME target table: counts must
    join on the pair id, not the (colliding) table name."""
    src = _write(
        tmp_path / "s.yaml",
        f"connection:\n  type: parquet\n  path: {sf_dir}\n"
        f"tables_file: {tmp_path / 'pairs.csv'}\n",
    )
    tgt = _write(
        tmp_path / "t.yaml",
        f"connection:\n  type: parquet\n  path: {sf_dir}\n",
    )
    _write(
        tmp_path / "pairs.csv",
        "source_table,target_table\norders,orders\nlineitem,orders\n",
    )
    out_html = str(tmp_path / "d.html")
    assert (
        main(
            ["dbstats", "--config", src, "--target-config", tgt,
             "--output", out_html]
        )
        == 0
    )
    html = open(out_html).read()
    # orders vs orders -> difference 0; lineitem vs orders -> nonzero
    assert '"difference": 0' in html
    assert '"source_table": "lineitem"' in html
    assert html.count('"source_table"') >= 2


def test_example_configs_round_trip():
    """Every shipped examples/*.yaml.example parses through the real
    config loader into a connection type the Database source supports
    (onboarding parity with the reference's examples directory)."""
    import glob

    from dbqt_spark.config import EngineConfig
    from dbqt_spark.sources.database import _JDBC_URLS

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(here, "examples", "*.yaml.example")))
    # the checks-suite example is not a connection config
    paths = [p for p in paths if "checks_suite" not in p]
    # athena, cdx, duckdb, mssql, oracle, snowflake, warc
    assert len(paths) == 7
    supported = set(_JDBC_URLS) | {
        "parquet", "csv", "json", "orc", "duckdb", "s3parquet", "jdbc",
        "warc", "cdx",
    }
    for p in paths:
        cfg = EngineConfig.load(p)
        kind = (cfg.connection.get("type") or "").lower()
        assert kind in supported, f"{p}: unsupported type {kind!r}"
        # every example names a tables CSV, except warc/cdx (tables
        # are discovered from the file directory)
        assert cfg.tables_file or kind in ("warc", "cdx")


def test_colcompare_generate_config_roundtrip(tmp_path, capsys):
    """--generate-config writes the default type-mapping YAML; loading it
    back yields exactly the default groups (reference colcompare.py:98),
    and an existing file is refused rather than overwritten."""
    from dbqt_spark.typecompat import DEFAULT_TYPE_MAPPINGS, load_type_mappings

    out = str(tmp_path / "cc.yaml")
    assert main(["colcompare", "--generate-config", out]) == 0
    assert load_type_mappings(out) == DEFAULT_TYPE_MAPPINGS
    # second run refuses to clobber a user-edited file
    assert main(["colcompare", "--generate-config", out]) == 1
    text = (tmp_path / "cc.yaml").read_text()
    assert "excluded_cols" in text and "type_mappings" in text


@pytest.mark.parametrize(
    "method,extra",
    [
        pytest.param("exact", [], marks=pytest.mark.slow),
        ("minhash", ["--threshold", "0.5"]),
        pytest.param(
            "ngram",
            ["--threshold", "0.5", "--pairs-parquet", "PAIRS"],
            marks=pytest.mark.slow,
        ),
        pytest.param(
            "simhash", ["--max-hamming", "6"], marks=pytest.mark.slow
        ),
    ],
)
def test_dedup_tool_methods(tmp_path, capsys, method, extra):
    """The dedup CLI runs each tier end-to-end over a parquet-dir config
    and writes the report (+ optional pairs parquet). One tier (the
    minhash default) stays in the default suite; the other three are
    slow-tier (each runs a full band pipeline — VERDICT r15 #6)."""
    cfg = tmp_path / "conn.yaml"
    cfg.write_text(
        "connection:\n  type: parquet\n  path: /root/testdata/sf0.001\n"
    )
    extra = [
        str(tmp_path / "pairs.pq") if a == "PAIRS" else a for a in extra
    ]
    out = str(tmp_path / f"dedup_{method}.html")
    rc = main(
        ["dedup", "--config", str(cfg), "--table", "documents",
         "--method", method, "--output", out, *extra]
    )
    assert rc == 0
    assert os.path.exists(out)
    assert "Report saved" in capsys.readouterr().out
    if method == "ngram":
        assert os.path.exists(tmp_path / "pairs.pq")


def test_textstats_tool(tmp_path, capsys):
    cfg = tmp_path / "conn.yaml"
    cfg.write_text(
        "connection:\n  type: parquet\n  path: /root/testdata/sf0.001\n"
    )
    out = str(tmp_path / "ts.html")
    rc = main(
        ["textstats", "--config", str(cfg), "--table", "documents",
         "--sample", "50", "--output", out]
    )
    assert rc == 0 and os.path.exists(out)
    html = open(out).read()
    for tab in ("Token Stats", "Quality", "Language ID", "Fingerprints",
                "LM Score", "Gopher Rules"):
        assert tab in html


def test_search_tool_bm25(tmp_path, capsys):
    cfg = tmp_path / "conn.yaml"
    cfg.write_text(
        "connection:\n  type: parquet\n  path: /root/testdata/sf0.001\n"
    )
    out = str(tmp_path / "s.html")
    rc = main(
        ["search", "--config", str(cfg), "--table", "documents",
         "--query", "spark data", "-k", "5", "--output", out]
    )
    assert rc == 0 and os.path.exists(out)
    lines = [
        ln for ln in capsys.readouterr().out.splitlines()
        if "\t" in ln
    ]
    assert 0 < len(lines) <= 5
    # ranked descending by score
    scores = [float(ln.split("\t")[1]) for ln in lines]
    assert scores == sorted(scores, reverse=True)


def test_dedup_tool_embedding(tmp_path, capsys):
    cfg = tmp_path / "conn.yaml"
    cfg.write_text(
        "connection:\n  type: parquet\n  path: /root/testdata/sf0.001\n"
    )
    out = str(tmp_path / "dedup_emb.html")
    rc = main(
        ["dedup", "--config", str(cfg), "--table", "embeddings",
         "--method", "embedding", "--id-column", "vec_id",
         "--threshold", "0.3", "--output", out]
    )
    assert rc == 0 and os.path.exists(out)

    # exactness-contract tier: blocked all-pairs matmul, same report
    out2 = str(tmp_path / "dedup_emb_exact.html")
    rc = main(
        ["dedup", "--config", str(cfg), "--table", "embeddings",
         "--method", "embedding-exact", "--id-column", "vec_id",
         "--threshold", "0.3", "--output", out2]
    )
    assert rc == 0 and os.path.exists(out2)


def test_cli_decontaminate_and_split(spark, sf_dir, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    db = tmp_path / "db"
    db.mkdir()
    leak = "the secret benchmark answer is forty two"
    pq.write_table(
        pa.table({
            "doc_id": [1, 2, 3],
            "text": [f"intro {leak} outro", "clean one here", "clean two here"],
        }),
        str(db / "corpus.parquet"),
    )
    pq.write_table(
        pa.table({"doc_id": [9], "text": [f"q: {leak}?"]}),
        str(db / "bench.parquet"),
    )
    cfg = _write(
        tmp_path / "c.yaml",
        f"connection:\n  type: parquet\n  path: {db}\n",
    )

    clean = str(tmp_path / "clean")
    out = str(tmp_path / "d.html")
    assert main([
        "decontaminate", "--config", cfg, "--table", "corpus",
        "--eval-table", "bench", "--ngram", "5",
        "--clean-parquet", clean, "--output", out,
    ]) == 0
    assert "1 contaminated documents flagged" in capsys.readouterr().out
    kept = sorted(r["doc_id"] for r in spark.read.parquet(clean).collect())
    assert kept == [2, 3]
    assert os.path.exists(out)

    splits = str(tmp_path / "splits")
    assert main([
        "split", "--config", cfg, "--table", "corpus",
        "--weights", "a=0.5,b=0.5", "--output-parquet", splits,
    ]) == 0
    outtext = capsys.readouterr().out
    assert "a: " in outtext and "b: " in outtext
    rows = spark.read.parquet(splits).collect()
    assert len(rows) == 3 and {r["split"] for r in rows} <= {"a", "b"}

    # bad weights surface as an argparse error, not a stack trace
    import pytest

    with pytest.raises(SystemExit):
        main(["split", "--config", cfg, "--table", "corpus",
              "--weights", "nonsense"])


def test_cli_curate(spark, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    db = tmp_path / "db"
    db.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": list(range(20)),
            "text": [f"plain unique document {i} with common words" for i in range(18)]
            + ["mail root@host.example.org now", "mail root@host.example.org now"],
            "lang": ["en"] * 20,
        }),
        str(db / "corpus.parquet"),
    )
    cfg = _write(
        tmp_path / "c.yaml",
        f"connection:\n  type: parquet\n  path: {db}\n",
    )
    out = str(tmp_path / "curated")
    assert main([
        "curate", "--config", cfg, "--table", "corpus",
        "--quality-quantile", "0.0", "--output-parquet", out,
        "--report",
    ]) == 0
    text = capsys.readouterr().out
    assert "curated corpus written to" in text
    assert "n_dropped_dedup: 1" in text
    back = spark.read.parquet(out)
    # one of the two exact dups dropped; redaction applied
    assert back.count() == 19
    masked = back.filter("redacted_text like '%<EMAIL>%'").count()
    assert masked == 1


def test_dedup_tool_clusters(tmp_path, capsys):
    cfg = tmp_path / "conn.yaml"
    cfg.write_text(
        "connection:\n  type: parquet\n  path: /root/testdata/sf0.001\n"
    )
    out = str(tmp_path / "dedup_clusters.html")
    rc = main(
        ["dedup", "--config", str(cfg), "--table", "documents",
         "--method", "minhash", "--threshold", "0.5", "--clusters",
         "--output", out,
         "--pairs-parquet", str(tmp_path / "clusters.pq")]
    )
    assert rc == 0 and os.path.exists(out)
    text = capsys.readouterr().out
    assert "clustered docs found" in text
    import pyarrow.parquet as pq

    # --pairs-parquet honors its contract even with --clusters: PAIRS
    cols = set(pq.read_schema(
        next((tmp_path / "clusters.pq").glob("*.parquet"))
    ).names)
    assert {"id_a", "id_b"} <= cols


def test_cli_sample(spark, tmp_path, capsys):
    cfg = _write(
        tmp_path / "c.yaml",
        "connection:\n  type: parquet\n  path: /root/testdata/sf0.001\n",
    )
    strat = str(tmp_path / "strat")
    assert main([
        "sample", "--config", cfg, "--table", "documents",
        "--method", "stratified", "--per-group", "5",
        "--output-parquet", strat,
    ]) == 0
    assert "25 rows sampled" in capsys.readouterr().out  # 5 langs x 5

    budget = str(tmp_path / "budget")
    assert main([
        "sample", "--config", cfg, "--table", "documents",
        "--method", "budget", "--budget-tokens", "2000",
        "--output-parquet", budget,
    ]) == 0
    out = capsys.readouterr().out
    assert "rows sampled" in out
    back = spark.read.parquet(budget)
    assert 0 < back.count() < 500  # a strict subset

    mix = str(tmp_path / "mix")
    assert main([
        "sample", "--config", cfg, "--table", "documents",
        "--method", "mixture", "--group-column", "lang",
        "--rate", "en=0.0", "--default-rate", "1.0",
        "--output-parquet", mix,
    ]) == 0
    back = spark.read.parquet(mix)
    # every en doc sampled out; all other languages kept whole
    assert back.filter("lang = 'en'").count() == 0
    assert back.count() == spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter("lang <> 'en'").count()


def test_cli_profile(spark, tmp_path):
    cfg = _write(
        tmp_path / "c.yaml",
        "connection:\n  type: parquet\n  path: /root/testdata/sf0.001\n",
    )
    out = str(tmp_path / "profile.html")
    assert main([
        "profile", "--config", cfg, "--table", "events",
        "--buckets", "5", "--top-k", "3",
        "--outlier-value-column", "value",
        "--outlier-group-column", "event_type",
        "--outlier-id-column", "event_id",
        "--output", out,
    ]) == 0
    html = open(out).read()
    for tab in ("Columns", "Histograms", "Correlations",
                "Frequent values", "Outliers"):
        assert tab in html
    # approx mode drives the HLL + double-sum arms through the same tool
    out2 = str(tmp_path / "profile2.html")
    assert main([
        "profile", "--config", cfg, "--table", "events",
        "--approx", "--output", out2,
    ]) == 0
    assert os.path.exists(out2)


def test_dbstats_mode_both_single_discovery(spark, sf_dir, tmp_path, monkeypatch):
    """dbstats --mode both over two parquet roots: the merged report
    carries all four tabs (Row Counts + the three colcompare tabs) in
    one run, AND table discovery runs exactly ONCE per database — the
    colcompare phase reuses the rowcount phase's lists (the reference's
    dbstats orchestration contract, dbqt/tools/dbstats.py:334-390).
    Golden shape: the target root is the source minus one table plus a
    renamed-type clone, so every tab has deterministic content."""
    import shutil

    import pyarrow.parquet as pq

    # target root: copy two tables, drop the rest, retype one column
    tgt_root = tmp_path / "tgt"
    tgt_root.mkdir()
    shutil.copy(os.path.join(sf_dir, "orders.parquet"), tgt_root / "orders.parquet")
    t = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    import pyarrow as pa
    import pyarrow.compute as pc

    t = t.set_column(
        t.schema.get_field_index("n_nationkey"),
        "n_nationkey",
        pc.cast(t["n_nationkey"], pa.string()),
    )
    pq.write_table(t, tgt_root / "nation.parquet")

    src = _write(
        tmp_path / "s.yaml",
        f"connection:\n  type: parquet\n  path: {sf_dir}\n",
    )
    tgt = _write(
        tmp_path / "t.yaml",
        f"connection:\n  type: parquet\n  path: {tgt_root}\n",
    )

    from dbqt_spark.sources import database as dbmod

    calls = {"n": 0}
    orig = dbmod.Database.list_tables

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(dbmod.Database, "list_tables", counting)

    out_html = str(tmp_path / "both.html")
    assert (
        main(
            [
                "dbstats",
                "--config", src,
                "--target-config", tgt,
                "--mode", "both",
                "--output", out_html,
            ]
        )
        == 0
    )
    # ONE discovery pass per database, reused by both phases
    assert calls["n"] == 2, f"discovery ran {calls['n']} times"

    html = open(out_html).read()
    for tab in (
        "Row Counts", "Table Comparison", "Column Comparison",
        "Datatype Mismatches",
    ):
        assert tab in html, f"missing tab {tab}"
    # rowcounts: common tables match; source-only tables noted, skipped
    assert '"difference": 0' in html
    assert "row count skipped" in html
    # colcompare: the retyped column surfaces as a datatype mismatch
    # (colcompare uppercases names — reference parity)
    assert "N_NATIONKEY" in html and "Different Types" in html


def test_dedup_lines_cli(spark, sf_dir, tmp_path, capsys):
    """dedup --method lines end-to-end: rebuilt corpus to parquet,
    removal counts in the report."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path / "data"
    root.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": [1, 2, 3],
            "text": ["alpha\nboiler", "boiler\nbeta", "boiler"],
        }),
        str(root / "docs.parquet"),
    )
    cfg = _write(
        tmp_path / "c.yaml",
        f"connection:\n  type: parquet\n  path: {root}\n",
    )
    outp = str(tmp_path / "rebuilt")
    assert (
        main(
            [
                "dedup", "--config", cfg, "--table", "docs",
                "--method", "lines", "--output-parquet", outp,
                "--output", str(tmp_path / "r.html"),
            ]
        )
        == 0
    )
    assert "2 docs had lines removed" in capsys.readouterr().out
    rows = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(outp).collect()
    }
    assert rows == {1: "alpha\nboiler", 2: "beta", 3: ""}


def test_dedup_spans_cli(spark, tmp_path, capsys):
    """dedup --method spans end-to-end: the shared 3-token span is
    removed from both docs, rebuilt corpus lands in parquet."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path / "data"
    root.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": [1, 2, 3],
            "text": [
                "aa bb cc unique one",
                "two aa bb cc three",
                "clean words only here",
            ],
        }),
        str(root / "docs.parquet"),
    )
    cfg = _write(
        tmp_path / "c.yaml",
        f"connection:\n  type: parquet\n  path: {root}\n",
    )
    outp = str(tmp_path / "rebuilt")
    assert (
        main(
            [
                "dedup", "--config", cfg, "--table", "docs",
                "--method", "spans", "--span-k", "3",
                "--output-parquet", outp,
                "--output", str(tmp_path / "r.html"),
            ]
        )
        == 0
    )
    assert "2 docs had duplicated spans removed" in capsys.readouterr().out
    rows = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(outp).collect()
    }
    assert rows == {
        1: "unique one", 2: "two three", 3: "clean words only here"
    }


def test_dedupindex_cli_lifecycle(spark, tmp_path, capsys):
    """dedupindex build -> append -> query -> compact end-to-end: the
    queried pairs match the live-frames cross operator on identical
    sides."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    root = tmp_path / "data"
    root.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": [0, 2],
            "text": [base + "corpus0", "something entirely different here"],
        }),
        str(root / "corpus_a.parquet"),
    )
    pq.write_table(
        pa.table({"doc_id": [4], "text": [base + "corpus4"]}),
        str(root / "corpus_b.parquet"),
    )
    pq.write_table(
        pa.table({
            "doc_id": [1, 3],
            "text": [base + "crawl1", "also unrelated text over here ok"],
        }),
        str(root / "crawl.parquet"),
    )
    cfg = _write(
        tmp_path / "c.yaml",
        f"connection:\n  type: parquet\n  path: {root}\n",
    )
    idx = str(tmp_path / "idx")
    assert main(["dedupindex", "build", "--index-path", idx,
                 "--config", cfg, "--table", "corpus_a"]) == 0
    assert main(["dedupindex", "append", "--index-path", idx,
                 "--config", cfg, "--table", "corpus_b"]) == 0
    outp = str(tmp_path / "hits")
    assert main(["dedupindex", "query", "--index-path", idx,
                 "--config", cfg, "--table", "crawl",
                 "--corpus-table", "corpus_a,corpus_b",
                 "--threshold", "0.5", "--output-parquet", outp,
                 "--output", str(tmp_path / "q.html")]) == 0
    out = capsys.readouterr().out
    assert "near-dup pairs found" in out
    hits = {
        (r["query_id"], r["corpus_id"])
        for r in spark.read.parquet(outp).collect()
    }
    # crawl doc 1 near-dups corpus docs 0 (built) and 4 (appended);
    # the unrelated docs never pair
    assert hits == {(1, 0), (1, 4)}
    assert main(["dedupindex", "compact", "--index-path", idx]) == 0
    # query still correct after compaction
    assert main(["dedupindex", "query", "--index-path", idx,
                 "--config", cfg, "--table", "crawl",
                 "--corpus-table", "corpus_a,corpus_b",
                 "--threshold", "0.5", "--output-parquet", outp]) == 0
    hits2 = {
        (r["query_id"], r["corpus_id"])
        for r in spark.read.parquet(outp).collect()
    }
    assert hits2 == hits


def test_statstore_cli(spark, sf_dir, tmp_path, capsys):
    """statstore append x2 -> profile: merged exact stats match a
    direct aggregate; no corpus rescan at profile time (the merged
    report reads only segment rows)."""
    cfg = _write(
        tmp_path / "c.yaml",
        f"connection:\n  type: parquet\n  path: {sf_dir}\n",
    )
    store = str(tmp_path / "store")
    for _ in range(2):
        assert main(["statstore", "append", "--store-path", store,
                     "--config", cfg, "--table", "region"]) == 0
    out_html = str(tmp_path / "s.html")
    assert main(["statstore", "profile", "--store-path", store,
                 "--output", out_html]) == 0
    html = open(out_html).read()
    # two appends of the same 5-row region table -> n_rows 10 per col
    assert '"n_rows": 10' in html and "r_regionkey" in html


def test_cli_datadiff(spark, tmp_path, capsys):
    """datadiff end to end: identical tables exit 0; a perturbed copy
    exits 1 with the right summary; agg mode flags the checksum."""
    src_dir = tmp_path / "src"
    tgt_dir = tmp_path / "tgt"
    df = spark.range(100).selectExpr(
        "id AS k", "CAST(id * 2 AS DOUBLE) AS v", "'x' AS s"
    )
    df.write.parquet(str(src_dir / "t.parquet"))
    # target: drop k=7, change v at k=3
    df.filter("k <> 7").selectExpr(
        "k", "CASE WHEN k = 3 THEN v + 1 ELSE v END AS v", "s"
    ).write.parquet(str(tgt_dir / "t.parquet"))
    scfg = _write(
        tmp_path / "s.yaml",
        f"connection:\n  type: parquet\n  path: {src_dir}\n",
    )
    tcfg = _write(
        tmp_path / "t.yaml",
        f"connection:\n  type: parquet\n  path: {tgt_dir}\n",
    )

    # identical: exit 0
    assert main([
        "datadiff", "--config", scfg, "--table", "t", "--keys", "k",
    ]) == 0
    assert "0 rows differ" in capsys.readouterr().out

    # differing: exit 1, summary names the changed column
    assert main([
        "datadiff", "--config", scfg, "--table", "t",
        "--target-config", tcfg, "--keys", "k",
    ]) == 1
    out = capsys.readouterr().out
    assert "removed: 1" in out and "changed: 1" in out
    assert "column:v: 1" in out and "2 rows differ" in out

    # agg mode: mismatch on count and sum, exit 1
    assert main([
        "datadiff", "--config", scfg, "--table", "t",
        "--target-config", tcfg, "--keys", "k", "--mode", "agg",
        "--columns", "v",
    ]) == 1
    out = capsys.readouterr().out
    assert "MISMATCH" in out

    # rows mode writes only differing rows
    rows_out = str(tmp_path / "diffrows")
    assert main([
        "datadiff", "--config", scfg, "--table", "t",
        "--target-config", tcfg, "--keys", "k", "--mode", "rows",
        "--output-parquet", rows_out,
    ]) == 0
    back = {r["k"]: r for r in spark.read.parquet(rows_out).collect()}
    assert set(back) == {3, 7}
    assert back[3]["diff_status"] == "changed"
    assert back[7]["diff_status"] == "removed"


def test_cli_datadiff_html_report(spark, tmp_path, capsys):
    src_dir = tmp_path / "hsrc"
    df = spark.range(20).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    df.write.parquet(str(src_dir / "t.parquet"))
    cfg = _write(
        tmp_path / "h.yaml",
        f"connection:\n  type: parquet\n  path: {src_dir}\n",
    )
    out = str(tmp_path / "diff.html")
    assert main([
        "datadiff", "--config", cfg, "--table", "t", "--keys", "k",
        "--output", out,
    ]) == 0
    html = open(out).read()
    assert "identical" in html and "Diff summary" in html


def test_chunk_cluster_classify_cli(spark, sf_dir, tmp_path, capsys):
    """The chunk / cluster / classify tools run end-to-end against the
    testdata tables and write their parquet artifacts."""
    import json

    cfg = _write(
        tmp_path / "c.yaml",
        f"connection:\n  type: parquet\n  path: {sf_dir}\n",
    )
    chunks = str(tmp_path / "chunks")
    assert main(["chunk", "--config", cfg, "--table", "documents",
                 "--chunk-tokens", "16", "--overlap", "4",
                 "--output-parquet", chunks]) == 0
    cdf = spark.read.parquet(chunks)
    assert cdf.count() > 0
    assert set(cdf.columns) == {
        "doc_id", "chunk_id", "text", "start_token", "n_tokens"
    }

    assigns = str(tmp_path / "assigns")
    assert main(["cluster", "--config", cfg, "--table", "embeddings",
                 "--k", "3", "--iters", "1",
                 "--output-parquet", assigns]) == 0
    out = capsys.readouterr().out
    assert "assignments written" in out and "cluster 0:" in out
    adf = spark.read.parquet(assigns)
    assert adf.select("cluster").distinct().count() <= 3

    wpath = tmp_path / "w.json"
    wpath.write_text(json.dumps({"the": 0.5, "and": 0.3}))
    scores = str(tmp_path / "scores")
    assert main(["classify", "--config", cfg, "--table", "documents",
                 "--weights-json", str(wpath),
                 "--output-parquet", scores]) == 0
    sdf = spark.read.parquet(scores)
    assert set(sdf.columns) == {"doc_id", "score"}
    kept = str(tmp_path / "kept")
    assert main(["classify", "--config", cfg, "--table", "documents",
                 "--weights-json", str(wpath), "--threshold", "0.5",
                 "--output-parquet", kept]) == 0
    kdf = spark.read.parquet(kept)
    assert 0 < kdf.count() <= sdf.count()
    assert "text" in kdf.columns  # filter returns the docs, not scores


def test_repair_cli(spark, sf_dir, tmp_path, capsys):
    """repair impute/clip/castreport end-to-end over events."""
    cfg = _write(
        tmp_path / "c.yaml",
        f"connection:\n  type: parquet\n  path: {sf_dir}\n",
    )
    fixed = str(tmp_path / "fixed")
    assert main(["repair", "impute", "--config", cfg, "--table", "events",
                 "--columns", "value", "--group-column", "event_type",
                 "--output-parquet", fixed]) == 0
    out_df = spark.read.parquet(fixed)
    # imputation only fills groups that HAVE a median; with per-type
    # grouping every type has values, so no NULLs remain
    assert out_df.filter("value IS NULL").count() == 0

    clipped = str(tmp_path / "clipped")
    assert main(["repair", "clip", "--config", cfg, "--table", "events",
                 "--columns", "value", "--lower-q", "0.1",
                 "--upper-q", "0.9", "--output-parquet", clipped]) == 0
    assert spark.read.parquet(clipped).count() == out_df.count()

    assert main(["repair", "castreport", "--config", cfg,
                 "--table", "events",
                 "--columns", "value:int,props:double"]) == 0
    out = capsys.readouterr().out
    assert "props -> double:" in out and "value -> int:" in out


def test_curate_cli_classifier_and_span_flags(spark, tmp_path, capsys):
    """curate --classifier-weights-json / --span-k run the optional
    stages end-to-end from the CLI."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path / "data"
    root.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": [1, 2, 3],
            "lang": ["en", "en", "en"],
            "text": [
                "the good aa bb cc dd ee data words",
                "more aa bb cc dd ee the good data",
                "click buy free subscribe spam now junk here",
            ],
        }),
        str(root / "docs.parquet"),
    )
    cfg = _write(
        tmp_path / "c.yaml",
        f"connection:\n  type: parquet\n  path: {root}\n",
    )
    wpath = tmp_path / "w.json"
    wpath.write_text(json.dumps({
        "the": 1.0, "good": 1.0, "data": 1.0,
        "click": -3.0, "buy": -3.0, "free": -3.0, "subscribe": -3.0,
    }))
    outp = str(tmp_path / "curated")
    assert main([
        "curate", "--config", cfg, "--table", "docs",
        "--quality-quantile", "0.0", "--dedup", "none", "--no-redact",
        "--classifier-weights-json", str(wpath),
        "--classifier-threshold", "0.5", "--span-k", "5",
        "--output-parquet", outp,
    ]) == 0
    rows = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(outp).collect()}
    assert 3 not in rows                      # classifier dropped spam
    assert set(rows) == {1, 2}
    assert "aa bb cc dd ee" not in rows[1]    # span surgery applied
    assert "aa bb cc dd ee" not in rows[2]


def test_example_checks_suite_round_trip(spark, sf_dir):
    """The shipped examples/checks_suite.yaml.example loads through the
    real suite loader and every check runs green against the testdata
    (onboarding parity with the connection examples)."""
    import os as _os

    from dbqt_spark.catalog import load_tables
    from dbqt_spark.operators.checks import load_check_suite, run_checks

    here = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    suite = _os.path.join(here, "examples", "checks_suite.yaml.example")
    checks = load_check_suite(suite)
    assert len(checks) == 8
    assert {c.kind for c in checks} == {
        "not_null", "unique", "in_set", "range", "regex",
        "stats_range", "ref_integrity", "drift",
    }
    out = run_checks(spark, load_tables(spark, sf_dir), checks).collect()
    assert len(out) == 8
    assert all(r["passed"] for r in out)


def test_cli_export_jsonl_roundtrip(spark, tmp_path, capsys):
    import duckdb

    cfg = _write(
        tmp_path / "c.yaml",
        "connection:\n  type: parquet\n  path: /root/testdata/sf0.001\n",
    )
    out = str(tmp_path / "docs_jsonl")
    assert main([
        "export", "--config", cfg, "--table", "documents",
        "--columns", "doc_id,text,lang", "--compression", "gzip",
        "--shards", "3", "--shard-by", "doc_id",
        "--output", out,
    ]) == 0
    assert "500 rows exported" in capsys.readouterr().out
    # spark round-trip
    back = spark.read.json(out)
    assert back.count() == 500
    assert set(back.columns) == {"doc_id", "text", "lang"}
    # a foreign reader (duckdb) must agree — JSONL is the hand-off format
    rows = duckdb.sql(
        f"SELECT COUNT(*), COUNT(DISTINCT doc_id) FROM "
        f"read_json_auto('{out}/*.json.gz')"
    ).fetchone()
    assert rows == (500, 500)


def test_cli_sample_topk(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    cfg = _write(
        tmp_path / "c.yaml",
        "connection:\n  type: parquet\n  path: /root/testdata/sf0.001\n",
    )
    out = str(tmp_path / "topk")
    assert main([
        "sample", "--config", cfg, "--table", "documents",
        "--method", "topk", "--group-column", "lang",
        "--score-column", "n_chars", "--per-group", "5",
        "--output-parquet", out,
    ]) == 0
    assert "25 rows sampled" in capsys.readouterr().out  # 5 langs x 5
    back = spark.read.parquet(out)
    # each kept doc's length is within its language's top-5
    kept = {(r["lang"], r["n_chars"]) for r in back.collect()}
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for lang in [r["lang"] for r in docs.select("lang").distinct().collect()]:
        top = sorted(
            (r["n_chars"] for r in docs.filter(F.col("lang") == lang)
             .select("n_chars").collect()),
            reverse=True,
        )
        floor5 = top[4]
        assert all(c >= floor5 for (lg, c) in kept if lg == lang)


def test_cli_dedup_edit(spark, tmp_path, capsys):
    cfg = _write(
        tmp_path / "c.yaml",
        "connection:\n  type: parquet\n  path: /root/testdata/sf0.001\n",
    )
    pairs = str(tmp_path / "pairs")
    assert main([
        "dedup", "--config", cfg, "--table", "documents",
        "--method", "edit", "--max-distance", "2",
        "--text-column", "text", "--max-len", "300",
        "--output", str(tmp_path / "r.html"),
        "--pairs-parquet", pairs,
    ]) == 0
    out = capsys.readouterr().out
    assert "pairs" in out
    back = spark.read.parquet(pairs)
    assert set(back.columns) == {"id_a", "id_b", "distance"}


def test_cli_curate_blocklist(spark, tmp_path, capsys):
    cfg = _write(
        tmp_path / "c.yaml",
        "connection:\n  type: parquet\n  path: /root/testdata/sf0.001\n",
    )
    bl = tmp_path / "bad.txt"
    bl.write_text("spark\n\nwindow\n")
    out = str(tmp_path / "curated")
    assert main([
        "curate", "--config", cfg, "--table", "documents",
        "--quality-quantile", "0.0", "--dedup", "none", "--no-redact",
        "--blocklist", "hash", "--blocklist-file", str(bl),
        "--output-parquet", out,
    ]) == 0
    back = spark.read.parquet(out)
    # no surviving doc contains any blocked token
    from pyspark.sql import functions as F
    bad = back.filter(
        F.expr(r"exists(split(lower(text), '\\s+'), "
               r"x -> x IN ('spark', 'window', 'hash'))")
    ).count()
    assert bad == 0 and back.count() > 0


def test_cli_dedup_clusters_keep_best(spark, tmp_path, capsys):
    cfg = _write(
        tmp_path / "c.yaml",
        "connection:\n  type: parquet\n  path: /root/testdata/sf0.001\n",
    )
    assert main([
        "dedup", "--config", cfg, "--table", "documents",
        "--method", "minhash", "--threshold", "0.5",
        "--clusters", "--keep", "best", "--keep-score-column", "n_chars",
        "--output", str(tmp_path / "r.html"),
        "--pairs-parquet", str(tmp_path / "pairs"),
    ]) == 0
    out = capsys.readouterr().out
    assert "clustered docs" in out
    # pairs contract still honored
    back = spark.read.parquet(str(tmp_path / "pairs"))
    assert {"id_a", "id_b"} <= set(back.columns)


def test_cli_sample_weighted(spark, tmp_path, capsys):
    cfg = _write(
        tmp_path / "c.yaml",
        "connection:\n  type: parquet\n  path: /root/testdata/sf0.001\n",
    )
    out = str(tmp_path / "weighted")
    assert main([
        "sample", "--config", cfg, "--table", "documents",
        "--method", "weighted", "--weight-column", "n_chars",
        "--output-parquet", out,
    ]) == 0
    # n_chars >> 1, so every weight clamps to 1.0: all rows kept —
    # the deterministic upper edge
    assert "500 rows sampled" in capsys.readouterr().out


def test_cli_layout(spark, tmp_path, capsys):
    cfg = _write(
        tmp_path / "c.yaml",
        "connection:\n  type: parquet\n  path: /root/testdata/sf0.001\n",
    )
    out = str(tmp_path / "zordered")
    assert main([
        "layout", "--config", cfg, "--table", "events",
        "--mode", "zorder", "--zorder-columns", "user_id,value",
        "--files", "4", "--output-parquet", out,
    ]) == 0
    assert "rows rewritten z-ordered" in capsys.readouterr().out
    import glob as _glob
    assert len(_glob.glob(out + "/part-*.parquet")) == 4
    assert main([
        "layout", "--config", cfg, "--table", "events",
        "--mode", "filestats", "--output", str(tmp_path / "f.html"),
    ]) == 0
    assert "files profiled" in capsys.readouterr().out
    assert main([
        "layout", "--config", cfg, "--table", "events",
        "--mode", "rowgroups", "--output", str(tmp_path / "rg.html"),
    ]) == 0
    assert "row groups reported" in capsys.readouterr().out


def test_cli_shuffle(spark, tmp_path, capsys):
    """shuffle tool: shard-size summary printed; written parquet is
    partitioned by shard with gap-free per-shard positions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    db = tmp_path / "db"
    db.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": list(range(20)),
            "text": [f"doc {i}" for i in range(20)],
        }),
        str(db / "corpus.parquet"),
    )
    cfg = _write(
        tmp_path / "c.yaml",
        f"connection:\n  type: parquet\n  path: {db}\n",
    )
    out = str(tmp_path / "shards")
    assert main([
        "shuffle", "--config", cfg, "--table", "corpus",
        "--n-shards", "4", "--output-parquet", out,
    ]) == 0
    assert "20 rows -> " in capsys.readouterr().out
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 20
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(int(r["shard"]), []).append(r["pos"])
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))


def test_cli_classify_fit(spark, tmp_path, capsys):
    """classify --fit-label-column trains NB on the table, persists
    model/ + class_stats/ parquet, and reports per-class + overall
    train accuracy; a separable corpus fits to 100%."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    db = tmp_path / "db"
    db.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": [1, 2, 3, 4],
            "text": ["buy cheap pills", "cheap offer pills now",
                     "team meeting notes", "quarterly team notes"],
            "label": ["spam", "spam", "ham", "ham"],
        }),
        str(db / "corpus.parquet"),
    )
    cfg = _write(
        tmp_path / "c.yaml",
        f"connection:\n  type: parquet\n  path: {db}\n",
    )
    out = str(tmp_path / "nbmodel")
    assert main([
        "classify", "--config", cfg, "--table", "corpus",
        "--fit-label-column", "label", "--output-parquet", out,
    ]) == 0
    text = capsys.readouterr().out
    assert "overall: 4/4" in text
    model = spark.read.parquet(out + "/model")
    assert {r["label"] for r in model.select("label").distinct().collect()} == {
        "spam", "ham"
    }
    stats = spark.read.parquet(out + "/class_stats")
    assert stats.count() == 2

    # exactly one mode must be chosen
    import pytest

    with pytest.raises(SystemExit):
        main(["classify", "--config", cfg, "--table", "corpus",
              "--output-parquet", out])


def test_urls_and_pack_cli(spark, sf_dir, tmp_path, capsys):
    """The urls (canonicalize/dedup/domains) and pack (place/write/
    efficiency) tools run end-to-end; curate accepts --extract-main."""
    data = str(tmp_path / "data")
    os.makedirs(data)
    spark.createDataFrame(
        [
            (1, "HTTP://WWW.A.com:80/x/?utm_source=f&q=1#t", "aaaa"),
            (2, "http://www.a.com/x?q=1", "bbbb"),
            (3, "https://b.org/y", "cc"),
        ],
        "doc_id long, url string, text string",
    ).write.parquet(os.path.join(data, "pages.parquet"))
    cfg = _write(
        tmp_path / "u.yaml",
        f"connection:\n  type: parquet\n  path: {data}\n",
    )

    canon = str(tmp_path / "canon")
    assert main(["urls", "canonicalize", "--config", cfg, "--table",
                 "pages", "--output-parquet", canon]) == 0
    got = {
        r["doc_id"]: r["url"]
        for r in spark.read.parquet(canon).collect()
    }
    assert got[1] == got[2] == "http://www.a.com/x?q=1"

    dedup = str(tmp_path / "dedup")
    assert main(["urls", "dedup", "--config", cfg, "--table", "pages",
                 "--output-parquet", dedup]) == 0
    ddf = spark.read.parquet(dedup)
    assert sorted(r["doc_id"] for r in ddf.collect()) == [1, 3]

    assert main(["urls", "domains", "--config", cfg, "--table",
                 "pages", "--text-column", "text"]) == 0
    out = capsys.readouterr().out
    assert "a.com: 2 docs, 1 urls" in out

    # pack against the real documents table
    scfg = _write(
        tmp_path / "s.yaml",
        f"connection:\n  type: parquet\n  path: {sf_dir}\n",
    )
    assert main(["pack", "efficiency", "--config", scfg, "--table",
                 "documents", "--seq-lens", "128,512"]) == 0
    out = capsys.readouterr().out
    assert "seq_len 128:" in out and "seq_len 512:" in out

    packed = str(tmp_path / "packed")
    assert main(["pack", "write", "--config", scfg, "--table",
                 "documents", "--seq-len", "256",
                 "--output-parquet", packed]) == 0
    pdf = spark.read.parquet(packed)
    assert set(pdf.columns) == {"seq_id", "text", "n_tokens"}
    assert pdf.filter("n_tokens = 256").count() >= pdf.count() - 1


def test_curate_extract_main_cli(spark, tmp_path, capsys):
    data = str(tmp_path / "data")
    os.makedirs(data)
    nav = (
        '<nav><a href="/">Home</a> | <a href="/a">About page</a> | '
        '<a href="/c">Contact us now</a></nav>'
    )
    rows = [
        (i, nav + f"<p>Genuine prose document number {i} long enough "
         "to clear every heuristic gate in the chain.</p>", "en")
        for i in range(8)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(os.path.join(data, "docs.parquet"))
    cfg = _write(
        tmp_path / "c.yaml",
        f"connection:\n  type: parquet\n  path: {data}\n",
    )
    outp = str(tmp_path / "curated")
    assert main(["curate", "--config", cfg, "--table", "docs",
                 "--quality-quantile", "0.0", "--dedup", "none",
                 "--no-redact", "--extract-main",
                 "--output-parquet", outp]) == 0
    cdf = spark.read.parquet(outp)
    texts = [r["text"] for r in cdf.collect()]
    assert texts and all("Home" not in t for t in texts)
    assert all("Genuine prose document" in t for t in texts)


def test_cli_sample_dsir(spark, tmp_path, capsys):
    cfg = _write(
        tmp_path / "c.yaml",
        "connection:\n  type: parquet\n  path: /root/testdata/sf0.001\n",
    )
    out = str(tmp_path / "dsir")
    assert main([
        "sample", "--config", cfg, "--table", "documents",
        "--method", "dsir", "--target-table", "documents",
        "--k", "50", "--output-parquet", out,
    ]) == 0
    assert "50 rows sampled" in capsys.readouterr().out
    got = spark.read.parquet(out)
    assert got.count() == 50
    assert "text" in got.columns  # full rows survive the semi-join
    # missing flags fail as usage errors, not tracebacks
    import pytest
    with pytest.raises(SystemExit):
        main([
            "sample", "--config", cfg, "--table", "documents",
            "--method", "dsir", "--output-parquet", out,
        ])


def test_cli_bpe_train(spark, tmp_path, capsys):
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [("low low low newest newest newest newest",),
         ("newest newest widest widest lower",)],
        "text string",
    ).write.parquet(corpus)
    out = str(tmp_path / "merges")
    assert main([
        "bpe", "train", "--input", corpus, "--merges", "4",
        "--output-parquet", out,
    ]) == 0
    assert "4 merges written" in capsys.readouterr().out
    got = spark.read.parquet(out).orderBy("merge_rank").collect()
    assert [r.merge_rank for r in got] == [0, 1, 2, 3]
    assert got[0].lhs == "e" and got[0].rhs == "s"  # es in 6x newest
    # print mode
    assert main(["bpe", "train", "--input", corpus, "--merges", "2"]) == 0
    assert "e + s -> es" in capsys.readouterr().out


def test_cli_bloom_build_and_gate(spark, tmp_path, capsys):
    seen = str(tmp_path / "seen")
    arrivals = str(tmp_path / "arrivals")
    spark.createDataFrame(
        [(f"k{i}",) for i in range(0, 100, 2)], "key string"
    ).write.parquet(seen)
    spark.createDataFrame(
        [(i, f"k{i}") for i in range(100)], "id int, key string"
    ).write.parquet(arrivals)
    filt = str(tmp_path / "filter")
    assert main([
        "bloom", "build", "--input", seen, "--key-column", "key",
        "--filter", filt, "--fpp", "0.001",
    ]) == 0
    assert "bloom filter written" in capsys.readouterr().out
    out = str(tmp_path / "gated")
    assert main([
        "bloom", "gate", "--input", arrivals, "--key-column", "key",
        "--filter", filt, "--output-parquet", out,
    ]) == 0
    msg = capsys.readouterr().out
    assert "maybe_seen:" in msg and "definitely_new:" in msg
    got = {r.id: r.maybe_seen for r in spark.read.parquet(out).collect()}
    # no false negatives ever; at fpp=0.001 and 50 keys, no FPs expected
    assert all(got[i] for i in range(0, 100, 2))
    assert sum(1 for i in range(1, 100, 2) if got[i]) <= 2
    # usage errors fail clearly, not with tracebacks
    import pytest

    with pytest.raises(SystemExit):
        main([
            "bloom", "gate", "--input", arrivals, "--key-column", "key",
            "--filter", filt, "--mode", "shuffle",
        ])
    assert main([
        "bloom", "gate", "--input", arrivals, "--key-column", "key",
        "--filter", str(tmp_path / "nosuch"),
    ]) == 2


def test_cli_wet(spark, tmp_path):
    """wet tool: WARC dir -> WET segments; the segment re-reads as
    conversion records with stripped text."""
    from dbqt_spark.sources.warc import (
        build_warc,
        read_warc,
        warc_response_record,
    )

    d = tmp_path / "warc"
    d.mkdir()
    recs = [
        warc_response_record(
            f"https://ex.com/{i}",
            "2024-05-01T00:00:00Z",
            f"<p>doc {i} body</p>".encode(),
        )
        for i in range(4)
    ]
    (d / "seg.warc.gz").write_bytes(build_warc(recs))

    out = tmp_path / "wet"
    assert main(["wet", "--warc-dir", str(d),
                 "--out-dir", str(out), "--segments", "1"]) == 0
    rows = read_warc(
        spark, str(out), record_types=("conversion",)
    ).collect()
    assert {bytes(r.payload) for r in rows} == {
        f"doc {i} body".encode() for i in range(4)
    }
    assert all(r.mime == "text/plain" for r in rows)

    pq = tmp_path / "wetpq"
    assert main(["wet", "--warc-dir", str(d),
                 "--output-parquet", str(pq)]) == 0
    frame = spark.read.parquet(str(pq))
    assert frame.count() == 4 and "refers_to" in frame.columns


def test_cli_unigram(spark, tmp_path):
    """unigram tool: train writes a piece parquet; segment splits the
    corpus words under it."""
    src = tmp_path / "corpus"
    spark.createDataFrame(
        [(1, "low lower lowest low"), (2, "new newest new")],
        "doc_id long, text string",
    ).write.parquet(str(src))
    pieces = tmp_path / "pieces"
    assert main(["unigram", "train", "--input", str(src),
                 "--rounds", "1", "--seed-size", "10",
                 "--output-parquet", str(pieces)]) == 0
    pf = spark.read.parquet(str(pieces))
    assert {"piece", "cnt", "score_p"} <= set(pf.columns)
    assert pf.count() > 0

    seg = tmp_path / "seg"
    assert main(["unigram", "segment", "--input", str(src),
                 "--pieces", str(pieces),
                 "--output-parquet", str(seg)]) == 0
    sf = spark.read.parquet(str(seg))
    rows = {r.word: r.pieces for r in sf.collect()}
    assert set(rows) == {"low", "lower", "lowest", "new", "newest"}
    assert all(p.replace(" ", "") == w for w, p in rows.items())


def test_cli_wat(spark, tmp_path):
    from dbqt_spark.sources.warc import build_warc, warc_response_record

    d = tmp_path / "warc"
    d.mkdir()
    recs = [
        warc_response_record(
            f"https://ex.com/{i}",
            "2024-05-01T00:00:00Z",
            (
                f"<html><head><title>T{i}</title></head><body>"
                f'<a href="/next/{i}">n</a></body></html>'
            ).encode(),
        )
        for i in range(3)
    ]
    (d / "seg.warc.gz").write_bytes(build_warc(recs))
    pq = tmp_path / "wat"
    assert main(["wat", "--warc-dir", str(d),
                 "--output-parquet", str(pq)]) == 0
    rows = {r.url: r for r in spark.read.parquet(str(pq)).collect()}
    assert rows["https://ex.com/1"].title == "T1"
    assert rows["https://ex.com/1"].links == ["https://ex.com/next/1"]
