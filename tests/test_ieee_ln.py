"""Parity tests for the deterministic transcendental generators
(parity.sql_ln_* / sql_powi — round 6, VERDICT r5 item 4).

The whole point of these helpers is the three-way guarantee: the SQL
fragments evaluated by Spark, the same fragments evaluated by DuckDB,
and the Python reference (CPython floats ARE IEEE doubles) must produce
BIT-IDENTICAL results, because every step is a correctly-rounded IEEE
operation over identical literals.  These tests pin that guarantee over
a wide deterministic input sweep, plus absolute accuracy vs libm ln —
if either engine ever changed literal parsing or expression typing
(e.g. the Spark DECIMAL-literal trap), the bit compare fails loudly.
"""

from __future__ import annotations

import math
import struct

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from shared_solar_data_warehouse_spark.parity import (
    EXP_K,
    EXP_KLN2,
    EXP_P2K,
    EXP_R,
    EXP_Y,
    LN_ELN2,
    LN_P2,
    LN_S,
    LN_X,
    py_ieee_exp,
    py_ieee_ln,
    py_powi,
    sql_exp_final,
    sql_exp_k,
    sql_exp_ladders,
    sql_exp_r,
    sql_ln_final,
    sql_ln_ladders,
    sql_ln_s,
    sql_powi,
)


def _bits(v: float) -> str:
    return struct.pack("<d", v).hex()


#: Deterministic sweep: integer ratios (the idf/entropy shape), exact
#: powers of two (ladder rung boundaries), and near-boundary offsets.
def _sweep() -> list[float]:
    xs: list[float] = []
    for num in (1, 2, 3, 7, 10, 11, 101, 9973, 1048577, 10**9 + 7):
        for den in (1, 2, 3, 9, 64, 997, 10**6):
            xs.append(num / den)
    xs += [2.0**e for e in range(-40, 41, 5)]
    xs += [math.nextafter(2.0**e, 0.0) for e in range(-8, 9, 2)]
    xs += [math.nextafter(2.0**e, math.inf) for e in range(-8, 9, 2)]
    return sorted(set(xs))


def test_py_ieee_ln_accuracy_vs_libm():
    for x in _sweep():
        approx = py_ieee_ln(x)
        true = math.log(x)
        assert abs(approx - true) <= max(1e-12, abs(true) * 1e-12), (
            x,
            approx,
            true,
        )


def test_py_powi_accuracy_vs_libm():
    base = 1.0 / (1.0 + 0.10 / 365.0)
    for n in (0, 1, 2, 3, 17, 30, 365, 3650, 65535):
        approx = py_powi(base, n)
        true = base**n
        # squaring-chain error compounds ~2x per level: ~1.1e-12 rel at
        # the 16-bit ceiling (measured) — bound at 5e-12
        assert abs(approx - true) <= abs(true) * 5e-12, (n, approx, true)


def _duck_ln(xs: list[float]) -> list[float]:
    con = duckdb.connect()
    con.register("xs_tbl", pd.DataFrame({LN_X: pd.Series(xs, dtype="float64")}))
    p2, eln2 = sql_ln_ladders()
    q = f"""
    SELECT {sql_ln_final()} AS ln_val FROM (
      SELECT *, {sql_ln_s()} AS {LN_S} FROM (
        SELECT *, {p2} AS {LN_P2}, {eln2} AS {LN_ELN2} FROM xs_tbl
      )
    )
    """
    return [r[0] for r in con.execute(q).fetchall()]


def test_duckdb_bits_match_python_reference():
    xs = _sweep()
    got = _duck_ln(xs)
    for x, g in zip(xs, got):
        assert _bits(g) == _bits(py_ieee_ln(x)), (x, g, py_ieee_ln(x))


def test_spark_bits_match_python_reference(spark):
    xs = _sweep()
    df = spark.createDataFrame([(float(x),) for x in xs], f"{LN_X} double")
    p2, eln2 = sql_ln_ladders()
    out = (
        df.withColumn(LN_P2, F.expr(p2))
        .withColumn(LN_ELN2, F.expr(eln2))
        .withColumn(LN_S, F.expr(sql_ln_s()))
        .select(LN_X, F.expr(sql_ln_final()).alias("ln_val"))
        .collect()
    )
    assert len(out) == len(xs)
    for row in out:
        assert _bits(row.ln_val) == _bits(py_ieee_ln(row[LN_X])), (
            row[LN_X],
            row.ln_val,
        )


def test_spark_ln_output_is_double_not_decimal(spark):
    """The literal discipline guard: every literal the generators emit
    is scientific-notation (DOUBLE in Spark SQL); a plain decimal
    literal would silently type the whole chain DECIMAL (the
    win_zscore r6 leak class)."""
    from pyspark.sql.types import DoubleType

    df = spark.createDataFrame([(1.5,)], f"{LN_X} double")
    p2, eln2 = sql_ln_ladders()
    out = (
        df.withColumn(LN_P2, F.expr(p2))
        .withColumn(LN_ELN2, F.expr(eln2))
        .withColumn(LN_S, F.expr(sql_ln_s()))
        .select(F.expr(sql_ln_final()).alias("ln_val"))
    )
    assert isinstance(out.schema["ln_val"].dataType, DoubleType)


@pytest.mark.parametrize("n", [0, 1, 5, 29, 30, 31, 365, 65535])
def test_powi_cross_engine_bits(spark, n):
    base = 1.0 / (1.0 + 0.10 / 365.0)
    expr = sql_powi(base, "n")
    duck = duckdb.connect().execute(
        f"SELECT {expr} AS v FROM (SELECT CAST({n} AS BIGINT) AS n)"
    ).fetchone()[0]
    srow = (
        spark.range(1)
        .select(F.lit(n).cast("bigint").alias("n"))
        .select(F.expr(expr).alias("v"))
        .collect()[0]
    )
    ref = py_powi(base, n)
    assert _bits(duck) == _bits(ref) == _bits(srow.v), (n, duck, srow.v, ref)


# ---------------------------------------------------------------------------
# Hypothesis fuzz tier: the deterministic sweep above covers rung
# boundaries; this hunts arbitrary doubles for (a) accuracy drift vs
# libm and (b) Python-vs-DuckDB bit divergence (CPython floats are the
# reference IEEE implementation of the same op sequence).
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=300, deadline=None)
@given(
    st.floats(
        min_value=2.0**-60,
        max_value=2.0**60,
        allow_nan=False,
        allow_infinity=False,
    )
)
def test_py_ieee_ln_accuracy_fuzz(x):
    approx = py_ieee_ln(x)
    true = math.log(x)
    assert abs(approx - true) <= max(1e-12, abs(true) * 1e-12), (x, approx, true)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=2.0**-60,
            max_value=2.0**60,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=32,
    )
)
def test_duckdb_bits_match_python_fuzz(xs):
    got = _duck_ln(xs)
    for x, g in zip(xs, got):
        assert _bits(g) == _bits(py_ieee_ln(x)), (x, g, py_ieee_ln(x))


# ---------------------------------------------------------------------------
# Deterministic exp tier (round 7 — parity.sql_exp_*, the ts_survival_km
# libm retirement): same three-way bit guarantee as ln, plus accuracy.
# ---------------------------------------------------------------------------

#: exp sweep: ln-of-ratio shapes (the survival-curve input domain is
#: sums of negative ln terms), rung boundaries k*ln2, and the gate edge.
def _exp_sweep() -> list[float]:
    ys: list[float] = [0.0, -1e-15, 1e-15]
    for num, den in ((1, 2), (2, 3), (9, 10), (99, 100), (1, 997)):
        ys.append(math.log(num / den) * 1.0)
        ys.append(math.log(num / den) * 7.0)
    ys += [-0.25 * i for i in range(1, 170)]  # down to -42.25
    ys += [k * math.log(2.0) for k in range(-40, 5)]
    ys += [0.1, 0.5, 1.0, 2.5]
    # Accuracy domain with the default ladder (lo_k=-64): y such that
    # k = round(y/ln2) stays un-clamped, i.e. y >= ~-44.0.  Beyond it
    # the edge rung stays DETERMINISTIC (the bit tests below still
    # sweep it via fuzz bounds) but accuracy degrades by contract —
    # callers gate (ts_survival_km floors to 0 well before -40).
    return sorted({y for y in ys if y >= -43.5})


def test_py_ieee_exp_accuracy_vs_libm():
    for y in _exp_sweep():
        approx = py_ieee_exp(y)
        true = math.exp(y)
        assert abs(approx - true) <= abs(true) * 1e-13, (y, approx, true)


def _duck_exp(ys: list[float]) -> list[float]:
    con = duckdb.connect()
    con.register("ys_tbl", pd.DataFrame({EXP_Y: pd.Series(ys, dtype="float64")}))
    p2k, kln2 = sql_exp_ladders()
    q = f"""
    SELECT {sql_exp_final()} AS v FROM (
      SELECT *, {sql_exp_r()} AS {EXP_R} FROM (
        SELECT *, {p2k} AS {EXP_P2K}, {kln2} AS {EXP_KLN2} FROM (
          SELECT *, {sql_exp_k()} AS {EXP_K} FROM ys_tbl)))
    """
    return [r[0] for r in con.execute(q).fetchall()]


def test_exp_duckdb_bits_match_python_reference():
    ys = _exp_sweep()
    for y, g in zip(ys, _duck_exp(ys)):
        assert _bits(g) == _bits(py_ieee_exp(y)), (y, g, py_ieee_exp(y))


def test_exp_spark_bits_match_python_reference(spark):
    ys = _exp_sweep()
    df = spark.createDataFrame([(float(y),) for y in ys], f"{EXP_Y} double")
    p2k, kln2 = sql_exp_ladders()
    out = (
        df.withColumn(EXP_K, F.expr(sql_exp_k()))
        .withColumn(EXP_P2K, F.expr(p2k))
        .withColumn(EXP_KLN2, F.expr(kln2))
        .withColumn(EXP_R, F.expr(sql_exp_r()))
        .select(EXP_Y, F.expr(sql_exp_final()).alias("v"))
        .collect()
    )
    assert len(out) == len(ys)
    for row in out:
        assert _bits(row.v) == _bits(py_ieee_exp(row[EXP_Y])), (row[EXP_Y], row.v)


def test_exp_spark_output_is_double_not_decimal(spark):
    """Literal-discipline guard for the exp generators (the win_zscore
    r6 DECIMAL-typing leak class, applied to the new fragments)."""
    from pyspark.sql.types import DoubleType, LongType

    df = spark.createDataFrame([(-1.5,)], f"{EXP_Y} double")
    p2k, kln2 = sql_exp_ladders()
    staged = (
        df.withColumn(EXP_K, F.expr(sql_exp_k()))
        .withColumn(EXP_P2K, F.expr(p2k))
        .withColumn(EXP_KLN2, F.expr(kln2))
        .withColumn(EXP_R, F.expr(sql_exp_r()))
        .select(EXP_K, F.expr(sql_exp_final()).alias("v"))
    )
    assert isinstance(staged.schema[EXP_K].dataType, LongType)
    assert isinstance(staged.schema["v"].dataType, DoubleType)


@settings(max_examples=300, deadline=None)
@given(st.floats(min_value=-43.0, max_value=4.0, allow_nan=False))
def test_py_ieee_exp_accuracy_fuzz(y):
    approx = py_ieee_exp(y)
    true = math.exp(y)
    assert abs(approx - true) <= abs(true) * 1e-13, (y, approx, true)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-43.0, max_value=4.0, allow_nan=False),
        min_size=1,
        max_size=32,
    )
)
def test_exp_duckdb_bits_match_python_fuzz(ys):
    for y, g in zip(ys, _duck_exp(ys)):
        assert _bits(g) == _bits(py_ieee_exp(y)), (y, g, py_ieee_exp(y))


def test_powi_out_of_domain_is_null(spark):
    """ADVICE r6: exponents at or above 2^max_bits (or negative) must
    fail LOUDLY (NULL) instead of silently dropping high bits."""
    base = 1.0 / (1.0 + 0.10 / 365.0)
    expr = sql_powi(base, "n")
    for n in (-1, 65536, 1 << 20):
        duck = duckdb.connect().execute(
            f"SELECT {expr} AS v FROM (SELECT CAST({n} AS BIGINT) AS n)"
        ).fetchone()[0]
        srow = (
            spark.range(1)
            .select(F.lit(n).cast("bigint").alias("n"))
            .select(F.expr(expr).alias("v"))
            .collect()[0]
        )
        assert duck is None and srow.v is None and py_powi(base, n) is None, n
