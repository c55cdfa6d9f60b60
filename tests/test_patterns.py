"""Exclusion patterns — FIXTURES.md F-10 (reference: utils.py:186-210)."""

from dbqt_spark.patterns import filter_excluded_tables, matches_any_pattern


def test_f10_patterns():
    patterns = ["%_FINAL", "TMP_%", "%_BAK_%"]
    assert matches_any_pattern("ORDERS_FINAL", patterns)
    assert matches_any_pattern("tmp_x", patterns)
    assert matches_any_pattern("A_bak_B", patterns)
    assert not matches_any_pattern("FINAL_ORDERS", patterns)


def test_underscore_is_literal():
    # unlike SQL LIKE, '_' is literal in the reference's translation
    assert matches_any_pattern("TMP_X", ["TMP_%"])
    assert not matches_any_pattern("TMPX", ["TMP_%"])


def test_filter_list():
    names = ["ORDERS_FINAL", "tmp_x", "A_bak_B", "FINAL_ORDERS", "orders"]
    assert filter_excluded_tables(names, ["%_FINAL", "TMP_%", "%_BAK_%"]) == [
        "FINAL_ORDERS",
        "orders",
    ]
    assert filter_excluded_tables(names, []) == names
