#!/usr/bin/env python
"""Solo-measure queries on an otherwise-idle session: per-query wall
time split into build (query-function call, which runs any eager
driver-side stages) and collect, plus the number of Spark jobs each
phase submitted (job-group bracketing).

Usage: python tools/solo_measure.py [--repeat 2] query [query ...]

Run on an idle machine; numbers are meaningless under load.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from dbqt_spark.queries import QUERIES
    from dbqt_spark.session import get_spark

    spark = get_spark(app_name="solo_measure")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    tracker = sc.statusTracker()

    def jobs_in(group: str) -> int:
        try:
            return len(tracker.getJobIdsForGroup(group))
        except Exception:  # noqa: BLE001
            return -1

    print("query\trep\tbuild_s\tcollect_s\ttotal_s\tbuild_jobs\t"
          "collect_jobs\trows")
    for name in args.queries:
        if name not in QUERIES:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        for rep in range(args.repeat):
            gb = f"build_{name}_{rep}"
            sc.setJobGroup(gb, gb)
            t0 = time.perf_counter()
            df = QUERIES[name](spark, args.sf_dir)
            t1 = time.perf_counter()
            gc = f"collect_{name}_{rep}"
            sc.setJobGroup(gc, gc)
            rows = df.collect()
            t2 = time.perf_counter()
            sc.setJobGroup(None, None)
            print(
                f"{name}\t{rep}\t{t1 - t0:.3f}\t{t2 - t1:.3f}\t"
                f"{t2 - t0:.3f}\t{jobs_in(gb)}\t{jobs_in(gc)}\t{len(rows)}",
                flush=True,
            )


if __name__ == "__main__":
    main()
