#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dbqt_spark.queries import ORACLES, QUERIES
    from dbqt_spark.session import get_spark

    spark = get_spark(app_name="dbqt_spark_bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM/codegen warmup

    # Oracle-backed queries are the comparable benchmark surface; the
    # approximate ops (minhash/simhash/lsh) are benched separately below.
    bench_names = [n for n in QUERIES if n in ORACLES]
    extra_names = [n for n in QUERIES if n not in ORACLES]

    timings: dict[str, float] = {}
    for name in bench_names + extra_names:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = len(df.collect())
        except Exception as exc:  # keep the bench line parseable
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = float("nan")
            continue
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"bench: {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v == v), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "total_wall_sec_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
