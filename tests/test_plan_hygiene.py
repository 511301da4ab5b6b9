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
* raw single-partition exchange — an ``Exchange SinglePartition,
  ENSURE_REQUIREMENTS`` fed by a raw table scan (the shuffle under an
  unpartitioned Window / global running total over ungrouped rows)
  funnels the whole input through ONE task.  Unpartitioned windows
  over per-key AGGREGATES are allowed — their input is bounded by the
  key domain, with the two-pass distributed rank documented per op
  (VERDICT r03: agg_ks_test was the one offender; fixed by
  pre-aggregating on the quantized value domain).

Streaming ops are excluded: building them drains a streaming query
(covered by their own mirror/parity tests) and the returned memory
table's plan is trivially clean.
"""

from __future__ import annotations

import pytest

from shared_solar_data_warehouse_spark.plans import explain_formatted
from shared_solar_data_warehouse_spark.plans.inspect import (
    raw_single_partition_exchanges,
    simple_plan,
)

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
    df = registry[name].builder(spark, SF_SMALL)
    plan = explain_formatted(df)
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: non-broadcast cross join"
    if name not in ROWWISE_PY_OK:
        assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF"
    bad = raw_single_partition_exchanges(simple_plan(df))
    assert not bad, f"{name}: single-partition shuffle over a raw scan: {bad}"


def test_raw_single_partition_detector_positive(spark):
    """The detector must actually fire on the anti-pattern it bans
    (the pre-fix agg_ks_test shape: global running window over raw
    rows) — guards against the sweep passing vacuously."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bad_df = e.select(F.sum("value").over(w).alias("c"))
    assert raw_single_partition_exchanges(simple_plan(bad_df))
    # …and must stay quiet when the window input is pre-aggregated
    # (bounded by the key domain), the allowed shape.
    g = e.groupBy("user_id").agg(F.sum("value").alias("s"))
    wk = Window.orderBy("user_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    good_df = g.select(F.sum("s").over(wk).alias("c"))
    assert not raw_single_partition_exchanges(simple_plan(good_df))


#: Expensive per-row hash calls allowed in ONE operator line.  The
#: round-4 bug class: projection collapse INLINES a shared md5 column
#: reference into every consumer expression, silently multiplying
#: per-row hash cost (dedup_near_minhash carried 25 md5 nodes in one
#: Project; join_bloom_prefilter 6).  The fix pattern is binding the
#: hash once as a higher-order-function lambda variable; this sweep
#: keeps the class fixed.  Registry max after the r4 fixes is 3
#: (sample_split_train_test's legitimate split-bound pair).
MAX_MD5_PER_LINE = 4


@pytest.mark.parametrize("name", _names())
def test_no_inlined_hash_multiplication(spark, registry, name):
    plan = explain_formatted(registry[name].builder(spark, SF_SMALL))
    worst = max((ln.count("md5(") for ln in plan.splitlines()), default=0)
    assert worst <= MAX_MD5_PER_LINE, (
        f"{name}: {worst} md5 calls in one plan operator — a shared hash "
        "column was inlined into its consumers; bind it once via a "
        "transform/lambda variable (see dedup._lane_minima)"
    )


def test_inlined_hash_detector_positive(spark):
    """The census must fire on the anti-pattern (a shared md5 column
    consumed by many expressions after projection collapse)."""
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    h = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
    df = e.select(
        *[((h.cast("bigint") + F.lit(i)) % 97).alias(f"p{i}") for i in range(6)]
    )
    plan = explain_formatted(df)
    worst = max((ln.count("md5(") for ln in plan.splitlines()), default=0)
    assert worst > MAX_MD5_PER_LINE
