"""functions.portable_math: the engine-portable ln / rounding used by
the DSIR oracle contract (r14 driver red — libm 1-ulp knife edge).

The property under test is BIT-IDENTITY: Spark (JVM) and DuckDB (C++)
must produce the same double for the same input, because every op in
the expression is an exactly-rounded IEEE primitive. Accuracy vs libm
is a secondary, much looser bound (~1e-12 relative)."""

import math
import random
import struct

import duckdb
import pytest

from dbqt_spark.functions.portable_math import (
    apply_steps,
    chain_ctes,
    gumbel_steps,
    ln_int_steps,
    ln_pos_steps,
    ln_ratio_steps,
    round_dec_expr,
    select_items,
)


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def _duck_ln_ratio(pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(num BIGINT, den BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    steps = ln_ratio_steps("num", "den", "lnr", "duckdb")
    block, last = chain_ctes(steps, "t", "c")
    return con.execute(
        f"WITH {block} SELECT num, den, lnr FROM {last}"
    ).fetchall()


def _spark_ln_ratio(spark, pairs):
    sdf = spark.createDataFrame(pairs, "num bigint, den bigint")
    steps = ln_ratio_steps("num", "den", "lnr", "spark")
    return apply_steps(sdf, steps).select("num", "den", "lnr").collect()


def test_ln_ratio_bit_identical_across_engines(spark):
    random.seed(1234)
    pairs = []
    for _ in range(1500):
        mode = random.random()
        if mode < 0.34:
            pairs.append(
                (random.randint(1, 10**14), random.randint(1, 10**14))
            )
        elif mode < 0.67:
            den = random.randint(10**6, 10**12)
            pairs.append(
                (max(1, den + random.randint(-1000, 1000)), den)
            )
        else:
            pairs.append((random.randint(1, 100), random.randint(1, 10**14)))
    pairs += [
        (1, 1), (1, 2), (2, 1), (1, 10**14), (10**14, 1),
        (2**61 - 1, 2**61), (3, 2), (7, 5), (10**14, 10**14 - 1),
    ]
    svals = {(r.num, r.den): r.lnr for r in _spark_ln_ratio(spark, pairs)}
    for num, den, lnr in _duck_ln_ratio(pairs):
        assert _bits(svals[(num, den)]) == _bits(lnr), (num, den)
        # loose accuracy bound vs libm
        true = math.log(num) - math.log(den)
        assert abs(lnr - true) <= 1e-12 * max(abs(true), 1.0)


def test_boundary_adjacent_ratio_rounds_identically(spark):
    """The r14 failure class, reproduced on purpose: ln(2000001/2000000)
    = 4.99999875e-7 sits ~1.25e-13 from the .5e-6 rounding boundary —
    a 1-ulp libm divergence between engines flips the 6th decimal.
    The portable ln + portable rounding must agree bit-for-bit and
    round to the same DECIMAL on both engines."""
    cases = [
        (2000001, 2000000),   # ln ~ 5.0e-7 - 1.25e-13 (just BELOW .5e-6)
        (2000000, 2000001),   # mirrored negative
        (666667, 666667 * 3), # ln(1/3 + eps)
        (1000001, 1000000),   # ln ~ 1e-6 (just under)
    ]
    srows = _spark_ln_ratio(spark, cases)
    sdf = spark.createDataFrame(cases, "num bigint, den bigint")
    s6 = {
        (r.num, r.den): r.r6
        for r in apply_steps(
            sdf, ln_ratio_steps("num", "den", "lnr", "spark")
        ).selectExpr(
            "num", "den", round_dec_expr("lnr", 6, "spark") + " AS r6"
        ).collect()
    }
    svals = {(r.num, r.den): r.lnr for r in srows}

    con = duckdb.connect()
    con.execute("CREATE TABLE t(num BIGINT, den BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    block, last = chain_ctes(
        ln_ratio_steps("num", "den", "lnr", "duckdb"), "t", "c"
    )
    drows = con.execute(
        f"WITH {block} SELECT num, den, lnr, "
        f"{round_dec_expr('lnr', 6, 'duckdb')} AS r6 FROM {last}"
    ).fetchall()
    for num, den, lnr, r6 in drows:
        assert _bits(svals[(num, den)]) == _bits(lnr)
        assert s6[(num, den)] == r6
    # and the first case really is boundary-adjacent
    margin = abs(abs(math.log(2000001 / 2000000)) - 0.5e-6)
    assert margin < 1e-12


def test_ln_pos_bit_identical_across_engines(spark):
    random.seed(99)
    ws = [random.uniform(2**-60, 1.0) for _ in range(400)]
    ws += [random.uniform(1.0, 2**60) ** random.random() for _ in range(400)]
    ws += [1.0, 0.5, 2.0, 1.4142135623730951, 0.7071067811865476,
           42.3, 1e-18, 1e18, 2**-62 * 1.01]
    sdf = spark.createDataFrame([(w,) for w in ws], "w double")
    srows = apply_steps(
        sdf, ln_pos_steps("w", "lnw", "spark")
    ).select("w", "lnw").collect()
    svals = {_bits(r.w): r.lnw for r in srows}
    con = duckdb.connect()
    con.execute("CREATE TABLE tw(w DOUBLE)")
    con.executemany("INSERT INTO tw VALUES (?)", [(w,) for w in ws])
    block, last = chain_ctes(ln_pos_steps("w", "lnw", "duckdb"), "tw", "c")
    for w, lnw in con.execute(
        f"WITH {block} SELECT w, lnw FROM {last}"
    ).fetchall():
        assert _bits(svals[_bits(w)]) == _bits(lnw), w
        true = math.log(w)
        assert abs(lnw - true) <= 1e-12 * max(abs(true), 1.0)


def test_gumbel_bit_identical_and_gumbel_shaped(spark):
    ids = [(str(i),) for i in range(2000)]
    sdf = spark.createDataFrame(ids, "id string")
    srows = apply_steps(
        sdf, gumbel_steps("id", 7, "g", "spark")
    ).select("id", "g").collect()
    sg = {r.id: r.g for r in srows}
    con = duckdb.connect()
    con.execute("CREATE TABLE ti(id VARCHAR)")
    con.executemany("INSERT INTO ti VALUES (?)", ids)
    block, last = chain_ctes(gumbel_steps("id", 7, "g", "duckdb"), "ti", "c")
    drows = con.execute(f"WITH {block} SELECT id, g FROM {last}").fetchall()
    assert all(sg[i] == g for i, g in drows)
    # statistically Gumbel: mean near Euler–Mascheroni
    vals = [float(g) for _, g in drows]
    mean = sum(vals) / len(vals)
    assert 0.45 < mean < 0.72
    # accuracy vs the libm gumbel on the same hash inputs
    import hashlib
    for i, g in drows[:200]:
        h = int(hashlib.md5(f"7:{i}".encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(1 << 60)
        assert abs(float(g) - (-math.log(-math.log(u)))) < 1e-5


def test_round_dec_half_away_parity(spark):
    xs = [i / 2**20 - 5.0 for i in range(0, 10**7, 9973)]
    xs += [0.1234565, -0.1234565, 0.12345649999999, 1e-7, -1e-7, 0.0,
           0.9999995, -0.9999995]
    sdf = spark.createDataFrame([(x,) for x in xs], "x double")
    srows = sdf.selectExpr(
        "x", round_dec_expr("x", 6, "spark") + " AS r"
    ).collect()
    svals = {_bits(r.x): r.r for r in srows}
    con = duckdb.connect()
    con.execute("CREATE TABLE tx(x DOUBLE)")
    con.executemany("INSERT INTO tx VALUES (?)", [(x,) for x in xs])
    for x, r in con.execute(
        f"SELECT x, {round_dec_expr('x', 6, 'duckdb')} AS r FROM tx"
    ).fetchall():
        assert svals[_bits(x)] == r, x
    # half-away semantics on exactly-representable halves
    got = {float(r.x): float(r.r) for r in srows}
    assert got[0.0] == 0.0


def test_ln_int_matches_ln_ratio_den_one(spark):
    vals = [(1,), (2,), (3,), (10**14,), (999983,)]
    sdf = spark.createDataFrame(vals, "v bigint")
    a = apply_steps(sdf, ln_int_steps("v", "l", "spark")).select("v", "l")
    b = apply_steps(
        sdf, ln_ratio_steps("v", "1", "l", "spark")
    ).select("v", "l")
    assert {(r.v, _bits(r.l)) for r in a.collect()} == {
        (r.v, _bits(r.l)) for r in b.collect()
    }


def test_dialect_validation():
    with pytest.raises(ValueError, match="dialect"):
        ln_ratio_steps("a", "b", "o", "sqlite")
    with pytest.raises(ValueError, match="places"):
        round_dec_expr("x", 0, "spark")
    # select_items renders something embeddable for short chains
    items = select_items(ln_ratio_steps("num", "den", "lnr", "duckdb"))
    assert "AS lnr" in items
