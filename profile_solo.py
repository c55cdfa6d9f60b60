#!/usr/bin/env python
"""Solo (no pool) profiling of selected queries at sf0.1."""
import sys
import time

from dbqt_spark.queries import QUERIES
from dbqt_spark.session import get_spark

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile_solo")
spark.range(1_000_000).selectExpr("sum(id)").collect()

for name in sys.argv[1:]:
    t0 = time.perf_counter()
    df = QUERIES[name](spark, sf_dir)
    n = len(df.collect())
    print(f"SOLO {name}: {time.perf_counter() - t0:.3f}s ({n} rows)", flush=True)
