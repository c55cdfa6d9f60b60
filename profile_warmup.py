#!/usr/bin/env python
"""Measure Python-worker warmup cost vs first UDF query."""
import time

import pandas as pd
from pyspark.sql import functions as F

from dbqt_spark.queries import QUERIES
from dbqt_spark.session import get_spark

spark = get_spark(app_name="profile_warmup")
spark.range(1_000_000).selectExpr("sum(id)").collect()

t0 = time.perf_counter()

@F.pandas_udf("long")
def _noop(s: pd.Series) -> pd.Series:
    return s

spark.range(64).repartition(64).select(_noop("id")).collect()
print(f"python worker warmup: {time.perf_counter()-t0:.3f}s", flush=True)

for name in ["minhash_near_dups", "simhash_near_dups", "keyfinder_search"]:
    t0 = time.perf_counter()
    df = QUERIES[name](spark, "/root/testdata/sf0.1")
    n = len(df.collect())
    print(f"SOLO {name}: {time.perf_counter()-t0:.3f}s ({n} rows)", flush=True)
