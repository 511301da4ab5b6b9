"""Oracle result-type drift guard (VERDICT r01 item 8, rewritten r03).

The driver's correctness gate hashes raw cell values, so a DuckDB
oracle that returns HUGEINT (``sum(BIGINT)``, ``count_if``) or DECIMAL
where the Spark side returns BIGINT/DOUBLE hash-mismatches even when
the values are numerically identical — the r1 `scan_csv_permissive`
and r2 `agg_bool`/`text_source_quality` failures.  And any LIST/STRUCT/
MAP column crashes the driver's pandas canonicalizer outright
("unhashable type: ndarray/dict" — r2 `text_stopwords`,
`fn_struct_shape`).

Round 2's version of this guard inspected ``cursor.description``,
which DuckDB's DB-API fills with the generic ``'NUMBER'`` for every
numeric type — the ban could never fire and all 9 leaks sailed through
(VERDICT r02 item 2).  This rewrite uses ``DESCRIBE SELECT`` which
reports real DuckDB type names (verified: ``HUGEINT``,
``DECIMAL(22,1)``, ``VARCHAR[]``, ``STRUCT(...)``).

DuckDB-only (no SparkSession) — runs in seconds at sf0.001.  The
Spark-side twin of this lint lives in mirror.run_op (COMPLEX_OUTPUT)
and tests/test_output_types.py.
"""

from __future__ import annotations

import pytest

from shared_solar_data_warehouse_spark.mirror import duck_connect
from shared_solar_data_warehouse_spark.registry import load_all_ops

SF = "/root/testdata/sf0.001"

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
    return duck_connect(SF)


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
    instead of as a driver hash mismatch (ADVICE r02)."""
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
