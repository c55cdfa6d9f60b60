#!/usr/bin/env python
"""Capture .explain("formatted") for every registered query into
plans/<tag>/<name>_<suffix>.txt, plus a one-line plan-shape summary
(Exchange count, join strategies, Python-eval nodes, plan length) to
plans/<tag>/SHAPES_<suffix>.tsv.

Usage: python tools/capture_plans.py [--tag r15] [--suffix before] [query ...]

Building a query's DataFrame executes any eager driver-side stages the
query runs by contract (lifecycle chains, streaming drains), so a full
sweep takes minutes; the explain itself never executes the final frame.
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from dbqt_spark.queries import QUERIES
    from dbqt_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    out_dir = os.path.join("plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    names = args.queries or list(QUERIES)
    shapes_path = os.path.join(out_dir, f"SHAPES_{args.suffix}.tsv")
    with open(shapes_path, "w") as shapes:
        shapes.write(
            "query\tbuild_sec\texchanges\tbhj\tsmj\tshj\tpyeval\t"
            "aggregates\tplan_chars\n"
        )
        for name in names:
            if name not in QUERIES:
                print(f"skip unknown {name}", file=sys.stderr)
                continue
            t0 = time.perf_counter()
            try:
                df = QUERIES[name](spark, args.sf_dir)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            except Exception as exc:  # noqa: BLE001
                plan = f"ERROR building/explaining {name}: {exc}\n"
            build = round(time.perf_counter() - t0, 2)
            with open(
                os.path.join(out_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
            nex = len(re.findall(r"\bExchange\b", plan))
            bhj = len(re.findall(r"BroadcastHashJoin", plan))
            smj = len(re.findall(r"SortMergeJoin", plan))
            shj = len(re.findall(r"ShuffledHashJoin", plan))
            pyev = len(
                re.findall(
                    r"BatchEvalPython|ArrowEvalPython|MapInPandas"
                    r"|FlatMapGroupsInPandas|MapInArrow",
                    plan,
                )
            )
            aggs = len(re.findall(r"HashAggregate|SortAggregate"
                                  r"|ObjectHashAggregate", plan))
            shapes.write(
                f"{name}\t{build}\t{nex}\t{bhj}\t{smj}\t{shj}\t{pyev}\t"
                f"{aggs}\t{len(plan)}\n"
            )
            shapes.flush()
            print(f"{name}: build={build}s exch={nex} py={pyev} "
                  f"len={len(plan)}", file=sys.stderr)


if __name__ == "__main__":
    main()
