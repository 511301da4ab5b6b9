"""Tier-1 of the pyramid (SURVEY.md §5.3): the local oracle mirror —
every registry op vs its DuckDB twin on identical parquet.

Runs at sf0.001 for speed (the driver's gate runs sf0.01; run
`python -m shared_solar_data_warehouse_spark.mirror` for that).  A
registry entry may only exist if this passes — the test enforces it.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def _op_names():
    from shared_solar_data_warehouse_spark.registry import REGISTRY, load_all_ops

    load_all_ops()
    return sorted(REGISTRY)


@pytest.fixture(scope="module")
def duck():
    from shared_solar_data_warehouse_spark.mirror import duck_connect

    return duck_connect(SF_SMALL)


@pytest.mark.parametrize("name", _op_names())
def test_oracle_mirror(spark, registry, duck, name):
    from shared_solar_data_warehouse_spark.mirror import run_op

    o = registry[name]
    res = run_op(spark, duck, name, o.builder, o.oracle, SF_SMALL)
    assert res["status"] in ("PASS", "ROWS_ONLY"), res


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    rows = entry_mod.entry(spark).collect()
    assert len(rows) > 0
    assert set(rows[0].asDict()) == {"n_name", "revenue", "n_items"}


def test_every_query_has_contract_shape(registry):
    """queries()/oracle_sql() derive cleanly; oracle keys ⊆ query keys."""
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(registry)
    # rows-only ops are the documented minority
    assert len(o) >= 0.75 * len(q)
