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


# --------------------------------------------------------------------------
# WARC serializer/parser round trip (sources/warc.py — pure Python, no
# Spark session needed, so the fuzz runs at full hypothesis speed)
# --------------------------------------------------------------------------

_urlish = st.text(
    alphabet="abcdefghij0123456789:/?=&.-_%", min_size=1, max_size=60
).map(lambda s: "https://h.example/" + s)


@given(
    st.lists(
        st.tuples(
            _urlish,
            st.integers(0, 86399),
            st.binary(min_size=0, max_size=512),
            st.integers(100, 599),
        ),
        min_size=1,
        max_size=8,
    ),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_warc_round_trip_any_payload(recs, per_record_gzip):
    """serialize -> (maybe per-record gzip) -> parse recovers every
    record's url/date/status and the exact body bytes, for arbitrary
    binary payloads (including CRLFs, gzip magic, 'WARC/1.0' text)."""
    import io

    from dbqt_spark.sources.warc import (
        build_warc,
        iter_warc_records,
        split_http_payload,
        warc_response_record,
    )

    blobs = []
    for url, sec, body, status in recs:
        date = "2024-01-01T%02d:%02d:%02dZ" % (
            sec // 3600, (sec // 60) % 60, sec % 60
        )
        blobs.append(
            warc_response_record(url, date, body, status=status)
        )
    stream = build_warc(blobs, gzip_per_record=per_record_gzip)
    out = list(iter_warc_records(io.BytesIO(stream)))
    assert len(out) == len(recs)
    for rec, (url, sec, body, status) in zip(out, recs):
        assert rec.header("WARC-Target-URI") == url
        got_status, _, got_body = split_http_payload(rec.payload)
        assert got_status == status
        assert got_body == body


@given(
    st.text(
        alphabet="abcdefghij/0123456789.-_~%?=&()[]{}+^|\\",
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=100, deadline=None)
def test_robots_rule_regex_literal_prefix_property(rule):
    """For rules without * or $, the translated pattern must behave as
    a PLAIN PREFIX match: it matches exactly the strings that start
    with the rule, no matter which regex metacharacters the rule
    contains (escaping property of robots._rule_to_regex, checked via
    Python re on the same Java-compatible pattern)."""
    import re

    # build the pattern exactly as the operator does, driver-side
    escaped = re.sub(r"([\\.\[\]\{\}\(\)\+\?\^\|])", r"\\\1", rule)
    pattern = "^" + re.sub(r"\$", r"\\$", escaped).replace("*", ".*")
    assert re.search(pattern, rule), (rule, pattern)
    assert re.search(pattern, rule + "/suffix")
    if not rule.startswith("x"):
        assert not re.search(pattern, "x" + rule)
