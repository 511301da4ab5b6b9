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

import pytest

from shared_solar_data_warehouse_spark.ieee_ok import CATEGORIES, IEEE_OK
from shared_solar_data_warehouse_spark.mirror import duck_connect
from shared_solar_data_warehouse_spark.registry import load_all_ops

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


# ---------------------------------------------------------------------------
# Oracle result-type drift guard (VERDICT r01 item 8, rewritten r03,
# RESTORED r06 per ADVICE r5: the ieee_ok register above cannot catch
# HUGEINT-vs-BIGINT — both fetch as Python int, so the bit-exact mirror
# compares them equal.  mirror.canon_value DOES split Decimal from
# float since r6 (the 'dec:' token; test_mirror asserts the
# inequality), so a DECIMAL oracle output would also fail the mirror —
# this DESCRIBE sweep is the complementary STATIC ban on DECIMAL/
# HUGEINT oracle output (belt and suspenders: it names the offending
# column and type directly instead of surfacing as a row-level hash
# diff, and it catches columns the sf0.001 fixtures leave empty).
#
# The driver's correctness gate hashes raw cell values, so a DuckDB
# oracle that returns HUGEINT (``sum(BIGINT)``, ``count_if``) or DECIMAL
# where the Spark side returns BIGINT/DOUBLE hash-mismatches even when
# the values are numerically identical — the r1 `scan_csv_permissive`
# and r2 `agg_bool`/`text_source_quality` failures.  And any LIST/
# STRUCT/MAP column crashes the driver's pandas canonicalizer outright.
#
# Round 2's version inspected ``cursor.description``, which DuckDB's
# DB-API fills with the generic ``'NUMBER'`` for every numeric type —
# the ban could never fire (VERDICT r02 item 2).  This version uses
# ``DESCRIBE SELECT`` which reports real DuckDB type names (verified:
# ``HUGEINT``, ``DECIMAL(22,1)``, ``VARCHAR[]``, ``STRUCT(...)``).
# DuckDB-only (no SparkSession) — runs in seconds at sf0.001.
# ---------------------------------------------------------------------------

_SF_DUCK = "/root/testdata/sf0.001"

#: Width/type names Spark's python bindings never produce: HUGEINT has
#: no Spark equivalent, and the registry convention is to cast decimals
#: back to DOUBLE/BIGINT before output (parity.py docstring).  Small
#: ints are banned too: Spark's toPandas maps them to different numpy
#: dtypes than the BIGINT the builders emit.
_BANNED = ("HUGEINT", "DECIMAL", "UINTEGER", "UBIGINT", "TINYINT", "SMALLINT")

#: Complex-type markers in DuckDB DESCRIBE output ("VARCHAR[]",
#: "STRUCT(a INTEGER)", "MAP(...)").  These crash the driver
#: canonicalizer on EITHER engine's side, so they are banned from
#: oracle output entirely.
_COMPLEX = ("[]", "STRUCT(", "MAP(", "UNION(")


def _oracle_items():
    reg = load_all_ops()
    return [(name, o.oracle) for name, o in sorted(reg.items()) if o.oracle]


@pytest.fixture(scope="module")
def con():
    return duck_connect(_SF_DUCK)


@pytest.mark.parametrize("name,oracle", _oracle_items(), ids=lambda p: str(p)[:40])
def test_oracle_output_types_are_spark_safe(con, name, oracle):
    # DESCRIBE gives (column_name, column_type, ...) with REAL type
    # names — cursor.description would report 'NUMBER' for all numerics.
    desc = con.execute(f"DESCRIBE SELECT * FROM ({oracle}) __q").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in desc
        if any(b in typ.upper() for b in _BANNED)
    ]
    assert not bad, f"oracle `{name}` leaks non-Spark numeric types: {bad}"
    cx = [
        (col, typ)
        for col, typ, *_ in desc
        if any(c in typ.upper() for c in _COMPLEX)
    ]
    assert not cx, (
        f"oracle `{name}` outputs complex-typed columns {cx} — the driver "
        "canonicalizer crashes on array/map/struct cells; array_join/"
        "to_json them to strings on both engine sides"
    )


def test_events_value_positive_fixture_invariant(con):
    """FIXTURES.md documents events.value as 'skewed positive'.  Three
    oracles (`ts_energy_integrate`, `ts_coincidence_factor`,
    `ts_capacity_factor`) rely on non-negative numerators for DuckDB
    `//` (floor) and Spark `DIV` (truncate) to agree — pin the
    invariant so a fixture regen that breaks it fails loudly here
    instead of as a driver hash mismatch (ADVICE r02, restored r06)."""
    lo = con.execute("SELECT min(value) FROM events").fetchone()[0]
    assert lo is not None and lo >= 0.0, f"events.value went negative: min={lo}"


def test_describe_reports_real_type_names(con):
    """Meta-guard: if DuckDB ever stops reporting real type names via
    DESCRIBE, this whole module would silently pass on bad input again
    (exactly how the r2 cursor.description version died).  Pin the
    mechanism with known-bad expressions."""
    desc = con.execute(
        "DESCRIBE SELECT count_if(TRUE) AS h, 1.5 AS d, [1] AS l FROM range(1)"
    ).fetchall()
    types = {col: typ.upper() for col, typ, *_ in desc}
    assert "HUGEINT" in types["h"]
    assert "DECIMAL" in types["d"]
    assert "[]" in types["l"]
