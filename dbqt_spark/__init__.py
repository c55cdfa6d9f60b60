"""dbqt_spark — a PySpark-native data-quality / analytics engine.

A from-scratch reimplementation of the capabilities of NamiLinkLabs/dbqt
(reference studied read-only at /root/reference) re-expressed Spark-first:
every check the reference pushes down as SQL text to external databases is
here a declarative DataFrame/SQL program that Catalyst optimizes and Spark
executes distributed.

Layout
------
- ``session``     : SparkSession factory tuned for the local[32] harness but
                    written for cluster scale (AQE, adaptive shuffle).
- ``catalog``     : table registry over a parquet directory (the testdata
                    star schema) — the engine's "database".
- ``schema_df``   : the 6-column schema IR (SCH_TABLE, COL_NAME, DATA_TYPE,
                    DATETIME_PRECISION, NUMERIC_PRECISION, NUMERIC_SCALE)
                    built from Spark schemas, incl. nested flattening.
                    (reference: dbqt/tools/utils.py:345-448)
- ``typecompat``  : type canonicalization + compatibility groups
                    (reference: dbqt/tools/colcompare.py:29-153)
- ``operators``   : the operator library (rowcount/dbstats, profile,
                    colcompare, keyfinder, combine, dynamic query, dedup,
                    textstats, similarity).
"""

__version__ = "0.1.0"
