"""Engine-portable transcendental SQL expressions (Spark + DuckDB).

The cross-engine parity problem (r14 driver red, ``dsir_weights`` /
``dsir_select``): IEEE 754 requires +, -, *, / and sqrt to be CORRECTLY
ROUNDED — bit-identical on every conforming engine — but transcendentals
(``ln``, ``exp``, ``pow``) are delegated to libm, and the JVM's and
DuckDB's implementations may legitimately differ by 1 ulp. A parity
contract of the form ``round(ln(x), 6)`` therefore carries a knife edge:
when the true value sits within ~1e-16 of a .5e-6 rounding boundary, the
two engines can round to different 6th decimals, and one flipped bucket
ratio poisons every downstream sum.

The fix implemented here: compute ``ln`` from exactly-rounded primitives
ONLY, with the identical expression shape on both engines, so both
produce the SAME double bit-for-bit — approximation error then cancels
out of the parity question entirely (both engines round the same bits).

1. **Integer range reduction.** For ``x = num/den`` (positive bigints),
   ``e = bitlength(num) - bitlength(den)`` via ``length(bin(v))`` —
   a pure integer computation with identical semantics in Spark SQL and
   DuckDB — puts ``m = x / 2^e`` in ``(0.5, 2)``. Scaling a double by an
   exact power of two (built as ``cast(shiftleft(1, |e|) as double)``)
   changes only the exponent field: NO rounding.
2. **Center to ``[sqrt(1/2), sqrt(2))``** with one more exact
   halving/doubling, bounding ``|z| = |(m-1)/(m+1)| <= 0.1716``.
3. **atanh series**: ``ln(m) = 2z(1 + z²/3 + z⁴/5 + … + z¹⁴/15)``,
   a fully-parenthesized Horner form whose every op is a correctly
   rounded double add/mul/div. Truncation error < 2e-14 relative —
   irrelevant for parity (identical on both engines) and far inside a
   6-decimal contract for accuracy. Constants are E-notation literals
   (``0.3333333333333333e0``), which BOTH engines lex directly as
   DOUBLE with correctly-rounded decimal→binary parsing; bare decimal
   literals must be avoided (both engines type them DECIMAL, with
   engine-specific precision arithmetic).
4. **Deterministic rounding**: engine ``round()`` implementations
   differ in how they inspect the double (Spark: shortest-repr
   BigDecimal; DuckDB: exact binary expansion) — another knife edge.
   ``round_dec_expr`` rounds half-away-from-zero via
   ``floor(x·10^k + 0.5)`` — floor and scale are exact IEEE ops.

Reference parity target: the DSIR / lm_score / tfidf "6-place-rounded
log, DECIMAL-canonicalized before the sum" house contract (see
``operators/dsir.py``, ``operators/textstats.py``). The reference repo
has no analogue — this is driver-portability infrastructure for the
oracle gate (VERDICT r14 task #1/#2).

Builders return ordered ``(name, sql)`` step lists so callers can bind
intermediates as lateral column aliases (one ``selectExpr``/SELECT —
supported by Spark ≥3.4 and DuckDB) or as chained CTE projections,
keeping the emitted SQL linear in the number of steps.
"""

from __future__ import annotations

from typing import List, Tuple

Steps = List[Tuple[str, str]]

# repr() of the exact Python doubles — correctly-rounded parse on both
# engines reproduces the same bit patterns (verified by fuzz test).
_LN2 = "0.6931471805599453e0"
_SQRT_HALF = "0.7071067811865476e0"
_SQRT2 = "1.4142135623730951e0"
# 1/3, 1/5, ..., 1/15 for the atanh Horner tail
_INV = {
    3: "0.3333333333333333e0",
    5: "0.2e0",
    7: "0.14285714285714285e0",
    9: "0.1111111111111111e0",
    11: "0.09090909090909091e0",
    13: "0.07692307692307693e0",
    15: "0.06666666666666667e0",
}

_DIALECTS = ("spark", "duckdb")


def _check_dialect(dialect: str) -> None:
    if dialect not in _DIALECTS:
        raise ValueError(f"dialect must be one of {_DIALECTS}, got {dialect!r}")


def _shl1(e_sql: str, dialect: str) -> str:
    """2^e as BIGINT for 0 <= e <= 62."""
    if dialect == "spark":
        return f"shiftleft(cast(1 as bigint), {e_sql})"
    return f"(CAST(1 AS BIGINT) << ({e_sql}))"


def _horner_h(z2: str) -> str:
    """1 + z²/3 + z⁴/5 + … + z¹⁴/15 as a fully parenthesized Horner
    chain — explicit association so both engines evaluate the identical
    sequence of correctly-rounded ops."""
    h = _INV[15]
    for k in (13, 11, 9, 7, 5, 3):
        h = f"({_INV[k]} + ({z2} * {h}))"
    return f"(1.0e0 + ({z2} * {h}))"


def _series_steps(p: str, m0: str, e0: str, out: str) -> Steps:
    """Shared tail: center m0 ∈ (0.5, 2) into [√½, √2), run the atanh
    series, recombine with e·ln2. All double ops exactly rounded."""
    return [
        (
            f"{p}_m",
            f"(case when {m0} < {_SQRT_HALF} then ({m0} * 2.0e0) "
            f"when {m0} >= {_SQRT2} then ({m0} * 0.5e0) "
            f"else {m0} end)",
        ),
        (
            f"{p}_e",
            f"(case when {m0} < {_SQRT_HALF} then ({e0} - 1) "
            f"when {m0} >= {_SQRT2} then ({e0} + 1) "
            f"else {e0} end)",
        ),
        (f"{p}_z", f"(({p}_m - 1.0e0) / ({p}_m + 1.0e0))"),
        (f"{p}_z2", f"({p}_z * {p}_z)"),
        (f"{p}_h", _horner_h(f"{p}_z2")),
        (
            out,
            f"((cast({p}_e as double) * {_LN2}) + "
            f"((2.0e0 * {p}_z) * {p}_h))",
        ),
    ]


def ln_ratio_steps(
    num_sql: str,
    den_sql: str,
    out: str,
    dialect: str,
    prefix: str = "__plr",
) -> Steps:
    """Steps computing ``out = ln(num/den)`` as a DOUBLE, bit-identical
    across engines, for POSITIVE BIGINT expressions ``num``/``den``
    (each >= 1; products must fit int64 — callers cast sums down from
    DuckDB HUGEINT). ``num_sql``/``den_sql`` are evaluated 2-3 times —
    pass column references, not heavy expressions."""
    _check_dialect(dialect)
    p = prefix
    steps: Steps = [
        (
            f"{p}_x",
            f"(cast({num_sql} as double) / cast({den_sql} as double))",
        ),
        (
            f"{p}_eb",
            f"(length(bin(cast({num_sql} as bigint))) - "
            f"length(bin(cast({den_sql} as bigint))))",
        ),
        (
            f"{p}_sc",
            f"cast({_shl1(f'abs({p}_eb)', dialect)} as double)",
        ),
        (
            f"{p}_m0",
            f"(case when {p}_eb >= 0 then ({p}_x / {p}_sc) "
            f"else ({p}_x * {p}_sc) end)",
        ),
    ]
    steps += _series_steps(p, f"{p}_m0", f"{p}_eb", out)
    return steps


def ln_pos_steps(
    w_sql: str,
    out: str,
    dialect: str,
    prefix: str = "__plp",
) -> Steps:
    """Steps computing ``out = ln(w)`` as a DOUBLE, bit-identical across
    engines, for a POSITIVE DOUBLE expression ``w`` in [2^-62, 2^62).
    The binary exponent comes from the bitlength of ``floor(w)`` (w>=1)
    or ``floor(w·2^62)`` (w<1) — both exact. ``w_sql`` is referenced
    several times — bind it as a column first."""
    _check_dialect(dialect)
    p = prefix
    two62 = f"cast({_shl1('62', dialect)} as double)"
    steps: Steps = [
        (
            f"{p}_n",
            f"(case when {w_sql} >= 1.0e0 "
            f"then cast(floor({w_sql}) as bigint) "
            f"else cast(floor({w_sql} * {two62}) as bigint) end)",
        ),
        (
            f"{p}_eb",
            f"(case when {w_sql} >= 1.0e0 then length(bin({p}_n)) - 1 "
            f"else length(bin({p}_n)) - 63 end)",
        ),
        (
            f"{p}_sc",
            f"cast({_shl1(f'abs({p}_eb)', dialect)} as double)",
        ),
        (
            f"{p}_m0",
            f"(case when {p}_eb >= 0 then ({w_sql} / {p}_sc) "
            f"else ({w_sql} * {p}_sc) end)",
        ),
    ]
    steps += _series_steps(p, f"{p}_m0", f"{p}_eb", out)
    return steps


def round_dec_expr(x_sql: str, places: int, dialect: str) -> str:
    """Half-away-from-zero rounding of a double to ``places`` decimals,
    returned as DECIMAL(18, places) — via ``floor(|x|·10^k + 0.5)``
    (exact IEEE ops), sidestepping the engines' divergent ``round()``
    implementations. Requires |x|·10^k < 2^52 (the +0.5 must not be
    absorbed) — true for every log-magnitude this repo rounds."""
    _check_dialect(dialect)
    if not (0 < places <= 12):
        raise ValueError(f"places must be in 1..12, got {places}")
    sc = f"1.0e{places}"
    micros = (
        f"(case when ({x_sql}) >= 0.0e0 "
        f"then cast(floor((({x_sql}) * {sc}) + 0.5e0) as bigint) "
        f"else -cast(floor(((-({x_sql})) * {sc}) + 0.5e0) as bigint) end)"
    )
    # micros/10^k is within 1 ulp of an exactly-6-decimal value, so the
    # double→decimal cast rounds to the same decimal on both engines
    # (the boundary margin is 0.5e-k, ~1e10 ulps wide).
    return (
        f"cast((cast({micros} as double) / {sc}) as decimal(18,{places}))"
    )


def gumbel_steps(
    id_sql: str,
    seed: int,
    out: str,
    dialect: str,
    prefix: str = "__pg",
) -> Steps:
    """Steps computing ``out = round(-ln(-ln(u)), 6)::DECIMAL(18,6)``,
    the deterministic per-id Gumbel draw (``operators/dsir``), with
    both ``ln``s portable: ``u = (h + 0.5)/2^60`` for the 60-bit
    md5-prefix ``h`` of ``"<seed>:<id>"``, so
    ``ln(u) = ln((2h+1) / 2^61)`` — an exact integer ratio."""
    _check_dialect(dialect)
    p = prefix
    sid = str(int(seed))
    if dialect == "spark":
        h = (
            f"cast(conv(substring(md5(concat_ws(':', '{sid}', "
            f"cast({id_sql} as string))), 1, 15), 16, 10) as bigint)"
        )
    else:
        h = (
            f"CAST(CAST(('0x' || substr(md5('{sid}:' || "
            f"CAST({id_sql} AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)"
        )
    steps: Steps = [
        (f"{p}_u", f"(({h} * 2) + 1)"),
    ]
    # 2^61 = 2305843009213693952 (exact int64)
    steps += ln_ratio_steps(
        f"{p}_u", "2305843009213693952", f"{p}_lnu", dialect, f"{p}_a"
    )
    # clamp w away from 0: for h = 2^60-1, (2h+1)/2^61 rounds to
    # exactly 1.0 as a double, so the series returns lnu = 0.0 and an
    # unclamped w would fall below ln_pos's [2^-62, 2^62) domain
    # (bin(0) garbage). greatest() keeps that one-in-16^15 draw finite
    # and ~correct (true g ≈ ln 2^61) with identical bits on both
    # engines; every other id is unaffected (w > 2^-62 already).
    steps += [
        (
            f"{p}_w",
            f"greatest((0.0e0 - {p}_lnu), 2.168404344971009e-19)",
        )
    ]
    steps += ln_pos_steps(f"{p}_w", f"{p}_lnw", dialect, f"{p}_b")
    steps += [(out, round_dec_expr(f"(0.0e0 - {p}_lnw)", 6, dialect))]
    return steps


def ln_int_steps(
    v_sql: str, out: str, dialect: str, prefix: str = "__pli"
) -> Steps:
    """``out = ln(v)`` for a positive BIGINT expression (>= 1) — the
    den=1 specialization of ``ln_ratio_steps``. Summing several of
    these (e.g. ``ln a + ln b - ln c - ln d``) keeps every bitlength
    argument inside int64 even when the mathematical product would
    overflow — the DSIR ratio shape at 100 TB gram counts."""
    return ln_ratio_steps(v_sql, "1", out, dialect, prefix)


def select_items(steps: Steps) -> str:
    """Render steps as a comma-joined SELECT-item block (lateral column
    aliases). ONLY for short chains (~10 steps): both engines resolve
    lateral aliases by substitution, which grows multiplicatively with
    chain depth — a stacked 25-step chain (e.g. ``gumbel_steps``) hangs
    DuckDB. Prefer ``chain_ctes`` / ``apply_steps``."""
    return ",\n  ".join(f"{sql} AS {name}" for name, sql in steps)


def chain_ctes(steps: Steps, src: str, prefix: str) -> Tuple[str, str]:
    """DuckDB-side embedding: render steps as a chain of single-step
    CTE projections (linear plan growth — each alias is materialized
    once per row, never substituted). Returns ``(cte_block, last_name)``
    to splice into a WITH list: ``WITH {cte_block} SELECT ... FROM
    {last_name}``."""
    ctes = []
    prev = src
    for i, (name, sql) in enumerate(steps):
        cur = f"{prefix}{i}"
        ctes.append(f"{cur} AS (SELECT *, {sql} AS {name} FROM {prev})")
        prev = cur
    return ",\n".join(ctes), prev


def apply_steps(df, steps: Steps):
    """Spark-side: bind steps as CHAINED projections (one selectExpr
    per step). Catalyst's CollapseProject keeps non-cheap duplicated
    aliases in separate Projects, so the plan stays linear — measured
    5x faster than one-shot lateral-alias binding for the 25-step
    gumbel chain."""
    for name, sql in steps:
        df = df.selectExpr("*", f"{sql} AS {name}")
    return df
