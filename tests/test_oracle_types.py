"""Graded-output type lint (VERDICT r4 item 5; SURVEY.md §5.4).

Round 4's two driver hash failures (``ts_changepoint``,
``agg_log2_histogram``) were IEEE-double output columns built through
``pow``/late division — the local mirror compared them equal but the
driver's hash split them.  The registry-level rule is now enforced
here: an op may emit a DOUBLE/FLOAT graded column ONLY if it is
registered in ``shared_solar_data_warehouse_spark.ieee_ok.IEEE_OK``
with a category documenting why both engines produce identical bits.

The sweep builds every non-streaming op's DataFrame once (schema
inspection only — no action is triggered beyond what the builder does
eagerly) and checks the register in both directions, so a NEW op that
silently adds an unvetted double output — or an op edit that changes
which columns are doubles — fails the suite until the register entry
is consciously written.

Streaming ops are excluded for the same reason as the plan-hygiene
sweep: building them drains a streaming query and their outputs are
covered by their own parity tests.
"""

from __future__ import annotations

from shared_solar_data_warehouse_spark.ieee_ok import CATEGORIES, IEEE_OK

from tests.conftest import SF_SMALL


def test_ieee_ok_categories_are_known():
    bad = {n: c for n, (c, _) in IEEE_OK.items() if c not in CATEGORIES}
    assert not bad, f"unknown ieee_ok categories: {bad}"


def test_no_unregistered_double_outputs(spark, registry):
    from pyspark.sql.types import DoubleType, FloatType

    actual: dict[str, str] = {}
    for name in sorted(registry):
        if name.startswith("stream_"):
            continue
        df = registry[name].builder(spark, SF_SMALL)
        dbl = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (DoubleType, FloatType))
        ]
        if dbl:
            actual[name] = ",".join(dbl)

    missing = {n: cols for n, cols in actual.items() if n not in IEEE_OK}
    assert not missing, (
        "ops emit unregistered IEEE-double graded columns — either emit "
        "exact integers (preferred, see ts_changepoint r5) or register "
        f"them in ieee_ok.py with a category: {missing}"
    )

    stale = {n for n in IEEE_OK if n not in actual}
    assert not stale, (
        f"ieee_ok.py entries for ops that no longer emit doubles: {stale}"
    )

    drifted = {
        n: (IEEE_OK[n][1], cols)
        for n, cols in actual.items()
        if IEEE_OK[n][1] != cols
    }
    assert not drifted, (
        f"double-column sets drifted from ieee_ok register: {drifted}"
    )
