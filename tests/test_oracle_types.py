"""Oracle result-type drift guard (VERDICT r01 item 8).

The driver's correctness gate hashes raw cell values, so a DuckDB
oracle that returns HUGEINT (``sum(BIGINT)``) or DECIMAL where the
Spark side returns BIGINT/DOUBLE hash-mismatches even when the values
are numerically identical — the exact failure `scan_csv_permissive`
hit in round 1.  The local mirror canonicalizes Decimal->float and so
CANNOT catch this class; this test binds every oracle's output types
in DuckDB directly and rejects any wide-integer/decimal leakage.

DuckDB-only (no SparkSession) — runs in seconds at sf0.001.
"""

from __future__ import annotations

import pytest

from shared_solar_data_warehouse_spark.mirror import duck_connect
from shared_solar_data_warehouse_spark.registry import load_all_ops

SF = "/root/testdata/sf0.001"

#: Type names (as substrings of DuckDB's description type string, which
#: includes list/struct element types) that must never reach the driver
#: compare: Spark has no HUGEINT, and the registry convention is to cast
#: decimals back to DOUBLE/BIGINT before output (parity.py docstring).
_BANNED = ("HUGEINT", "DECIMAL", "UINTEGER", "UBIGINT", "TINYINT", "SMALLINT")


def _oracle_items():
    reg = load_all_ops()
    return [(name, o.oracle) for name, o in sorted(reg.items()) if o.oracle]


@pytest.fixture(scope="module")
def con():
    return duck_connect(SF)


@pytest.mark.parametrize("name,oracle", _oracle_items(), ids=lambda p: str(p)[:40])
def test_oracle_output_types_are_spark_safe(con, name, oracle):
    cur = con.execute(f"SELECT * FROM ({oracle}) __q LIMIT 0")
    bad = [
        (d[0], str(d[1]))
        for d in cur.description
        if any(b in str(d[1]).upper() for b in _BANNED)
    ]
    assert not bad, f"oracle `{name}` leaks non-Spark types: {bad}"
