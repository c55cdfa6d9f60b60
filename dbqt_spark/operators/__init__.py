"""Operator library — each operator is a function DataFrame -> DataFrame or
(SparkSession, config) -> DataFrame returning results-as-rows. Per-table
failures become note rows, never exceptions (the reference's error-as-data
contract, dbqt/tools/utils.py:120-138)."""
