"""Property-based tests (hypothesis) for the pure-function layer —
an upgrade over the reference's example-only unit tests (SURVEY.md §5)."""

from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

from dbqt_spark.operators.keyfinder import (
    calculate_total_combinations,
    is_id_column,
    prioritize_id_columns,
)
from dbqt_spark.patterns import matches_any_pattern, pattern_to_regex
from dbqt_spark.typecompat import (
    DEFAULT_TYPE_MAPPINGS,
    are_types_compatible,
    canonicalize,
)

type_names = st.sampled_from(
    sorted({t for g in DEFAULT_TYPE_MAPPINGS.values() for t in g})
    + ["TIMESTAMP(9)", "VARCHAR(255)", "DECIMAL(10,2)", "BLOB", "JSON", "UUID"]
)


@given(type_names, type_names)
def test_compat_symmetric(a, b):
    assert are_types_compatible(a, b) == are_types_compatible(b, a)


@given(type_names)
def test_compat_reflexive(a):
    assert are_types_compatible(a, a)


@given(type_names, type_names, st.integers(0, 30), st.integers(0, 10))
def test_compat_param_invariant(a, b, p, s):
    """Parenthesized parameters never change compatibility."""
    assert are_types_compatible(f"{canonicalize(a)}({p},{s})", b) == (
        are_types_compatible(a, b)
    )


@given(st.text(alphabet="abcXYZ_123", min_size=1, max_size=20))
def test_pattern_exact_self_match(name):
    assert matches_any_pattern(name, [name])
    assert matches_any_pattern(name.upper(), [name.lower()])


@given(st.text(alphabet="abcXYZ_123", min_size=0, max_size=20))
def test_pattern_percent_matches_all(name):
    assert matches_any_pattern(name, ["%"])


@given(
    st.text(alphabet="abc_", min_size=1, max_size=8),
    st.text(alphabet="abc_", min_size=0, max_size=8),
)
def test_pattern_suffix(prefix, suffix):
    assert matches_any_pattern(prefix + suffix, ["%" + suffix])
    assert matches_any_pattern(prefix + suffix, [prefix + "%"])


def test_pattern_regex_anchored():
    assert pattern_to_regex("AB").startswith("^")
    assert pattern_to_regex("AB").endswith("$")
    assert not matches_any_pattern("XABX", ["AB"])


@given(st.integers(1, 12), st.one_of(st.none(), st.integers(1, 12)))
@settings(max_examples=50)
def test_total_combinations_matches_bruteforce(n, max_size):
    cols = [f"c{i}" for i in range(n)]
    k = n if max_size is None else min(max_size, n)
    brute = sum(
        1 for size in range(1, k + 1) for _ in combinations(cols, size)
    )
    assert calculate_total_combinations(n, max_size) == brute


@given(st.lists(st.text(alphabet="abc_id", min_size=1, max_size=10), max_size=12))
def test_prioritize_stable_partition(cols):
    out = prioritize_id_columns(cols)
    assert sorted(out) == sorted(cols)
    ids = [c for c in cols if is_id_column(c)]
    assert out[: len(ids)] == ids  # ID columns first, original order kept
