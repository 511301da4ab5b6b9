"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``shared_solar_data_warehouse_spark`` — this
file stays a thin adapter over its operator registry (SURVEY.md §7.0).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shared_solar_data_warehouse_spark import registry as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue by nation, SURVEY.md §7.1) on sf0.001."""
    _registry.load_all_ops()
    flagship = _registry.REGISTRY["flagship_revenue_by_nation"]
    return flagship.builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twin for every hash-checkable registry entry."""
    return _registry.oracle_sql()
