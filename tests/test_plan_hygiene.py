"""Registry-wide physical-plan hygiene sweep (SURVEY.md §4/§5.3.2).

Two patterns are scale-killers at 100 TB and must never appear outside
the operators whose CONTRACT is exactly that pattern:

* ``CartesianProduct`` — a non-broadcast cross join shuffles |A|x|B|
  rows; only the contractual cross/theta-join surface ops may carry it
  (and even they go BroadcastNestedLoopJoin at fixture scale).
* ``BatchEvalPython`` — a row-at-a-time Python UDF (pickled row
  round-trip, ~10-100x slower than Arrow); only the contractual
  surface demo `udf_python_rowwise` (and the UDTF, whose eval is
  row-wise by API shape) may carry it.  Everything else must be
  JVM expressions or Arrow-batched (ArrowEvalPython, MapInPandas,
  FlatMapGroupsInPandas).

Streaming ops are excluded: building them drains a streaming query
(covered by their own mirror/parity tests) and the returned memory
table's plan is trivially clean.
"""

from __future__ import annotations

import pytest

from shared_solar_data_warehouse_spark.plans import explain_formatted

from tests.conftest import SF_SMALL

#: Ops whose contract IS a cross/theta join (SURVEY §2.3).
CARTESIAN_OK = {"join_cross", "join_theta"}

#: Ops whose contract IS a row-wise Python eval (SURVEY §2.11).
ROWWISE_PY_OK = {"udf_python_rowwise", "udf_udtf"}


def _names():
    from shared_solar_data_warehouse_spark.registry import REGISTRY, load_all_ops

    load_all_ops()
    return sorted(n for n in REGISTRY if not n.startswith("stream_"))


@pytest.mark.parametrize("name", _names())
def test_plan_hygiene(spark, registry, name):
    plan = explain_formatted(registry[name].builder(spark, SF_SMALL))
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: non-broadcast cross join"
    if name not in ROWWISE_PY_OK:
        assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF"
