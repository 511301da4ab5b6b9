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
    LN_ELN2,
    LN_P2,
    LN_S,
    LN_X,
    py_ieee_ln,
    py_powi,
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
