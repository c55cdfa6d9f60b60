"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its
``oracle_sql()`` twin in DuckDB over the same parquet, then compares
row count, sorted column names, dtype-aware value hash — the same
contract the driver applies. Usage::

    python check_correctness.py [query ...]
"""

from __future__ import annotations

import hashlib
import json
import sys

import os

import duckdb

import __spark_entry__ as entrymod
from dbqt_spark.session import get_spark

SF_DIR = os.environ.get("CORRECTNESS_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(only=None):
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    records = {}
    # CORRECTNESS_SHARD=i/n partitions the registry round-robin so a
    # full sweep can run as n parallel processes (the handful of
    # brute-force 18M-pair DuckDB oracles otherwise serialize an
    # sf0.1 sweep into hours); merge the per-shard artifacts after.
    shard_env = os.environ.get("CORRECTNESS_SHARD", "")
    shard_i, shard_n = 0, 1
    if shard_env:
        shard_i, shard_n = (int(x) for x in shard_env.split("/"))
    # per-shard default: parallel shards must not clobber one another's
    # artifact — an unset CORRECTNESS_OUT under sharding would leave the
    # last writer's partial file masquerading as a full-registry record
    default_out = (
        f"CORRECTNESS_LOCAL.{shard_i}of{shard_n}.json"
        if shard_n > 1
        else "CORRECTNESS_LOCAL.json"
    )
    out_file = os.environ.get("CORRECTNESS_OUT", default_out)

    # CORRECTNESS_WRITE_ONLY=1 lets a named-subset run still emit its
    # records, MERGED into whatever out_file already holds (r13 ADVICE:
    # pointing it at a committed full-sweep artifact must update that
    # record in place, not replace 162 queries with the subset). The
    # preexisting records load once, up front — this run's results win
    # on key collisions.
    write_only = os.environ.get("CORRECTNESS_WRITE_ONLY") == "1"
    preexisting = {}
    if write_only and only and out_file and os.path.exists(out_file):
        try:
            with open(out_file) as fh:
                preexisting = json.load(fh)
        except (OSError, json.JSONDecodeError):
            preexisting = {}

    def flush():
        # incremental: a killed sweep still leaves a complete record
        # of everything it finished; default keeps the old guard so a
        # quick subset check never clobbers a full-registry record.
        if out_file and (not only or write_only):
            with open(out_file, "w") as fh:
                json.dump(
                    {**preexisting, **records}, fh, indent=1, default=str
                )
                fh.write("\n")

    for idx, (name, fn) in enumerate(qs.items()):
        if shard_n > 1 and idx % shard_n != shard_i:
            continue
        if only and name not in only:
            continue
        if name not in oracles:
            results[name] = "no_oracle"
            records[name] = {"status": "no_oracle"}
            print(f"{name}: no_oracle")
            flush()
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            # the DRIVER's canon sorts a pandas frame by every column,
            # which crashes on unhashable cells — flag any top-level
            # array/map/struct output so it never reaches a rotation
            # sample (VERDICT r15 #1)
            nonscalar = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            srows = [tuple(r) for r in sdf.collect()]
            rel = con.sql(oracles[name])
            ocols = rel.columns
            orows = rel.fetchall()
            ok_rows = len(srows) == len(orows)
            ok_schema = sorted(c.lower() for c in scols) == sorted(
                c.lower() for c in ocols
            )
            sh = value_hash([c.lower() for c in scols], srows)
            oh = value_hash([c.lower() for c in ocols], orows)
            ok_hash = sh == oh
            status = "OK" if (ok_rows and ok_schema and ok_hash) else (
                f"FAIL rows={ok_rows}({len(srows)}/{len(orows)}) "
                f"schema={ok_schema} hash={ok_hash}"
            )
            if nonscalar and status == "OK":
                status = f"OK_BUT_NONSCALAR {nonscalar}"
            results[name] = status
            # same per-query shape the driver's CORRECTNESS_r{N}.json
            # records, so the two artifacts diff directly
            records[name] = {
                "rows_match": ok_rows,
                "schema_match": ok_schema,
                "hash_match": ok_hash,
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
                "err": None,
            }
            if nonscalar:
                records[name]["nonscalar_cols"] = nonscalar
            print(f"{name}: {status}", flush=True)
            flush()
        except Exception as e:  # noqa: BLE001
            results[name] = f"ERR {e}"
            records[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(e).__name__}: {e}",
            }
            print(f"{name}: ERR {type(e).__name__}: {e}", flush=True)
            flush()
    bad = {k: v for k, v in results.items() if v not in ("OK", "no_oracle")}
    print(json.dumps({"n": len(results), "bad": bad}, default=str))
    # persist the full-registry record as a committable artifact (the
    # driver's own sweep runs a pinned query list that can lag the live
    # registry) — same per-query shape as CORRECTNESS_r{N}.json
    flush()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(set(sys.argv[1:]) or None))
