"""Physical-plan inspection helpers (SURVEY.md §4).

The engine's 100 TB posture is checked at the PLAN level, not just the
value level: filters/projections must reach the parquet scan, dimension
joins must broadcast, aggregates must be partial+final around a single
exchange, and hot expressions must sit inside WholeStageCodegen spans.
These helpers expose the formatted plan string and a coarse operator
census so tests (tests/test_plans.py) and the PLANS.md doc stay pinned
to the plans Catalyst actually produces.

Caveat (SURVEY.md §5.4): under AQE a plan containing an Exchange prints
PRE-finalization — no "codegen id :" markers, and exchange partition
counts may re-coalesce at run time.  Shape assertions should target
operator presence, not partition numbers.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame

#: Physical operators worth counting in a plan census.
_OPERATORS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Exchange",
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "Generate",
    "Window",
    "Sort",
    "Subquery",
)


def explain_formatted(df: DataFrame) -> str:
    """The `explain("formatted")` text of a DataFrame, returned instead
    of printed (Spark's own .explain only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def operator_counts(plan: str) -> Counter:
    """Census of physical operators in a formatted plan string."""
    found: Counter = Counter()
    for name in _OPERATORS:
        n = len(re.findall(rf"\b{name}\b", plan))
        if n:
            found[name] = n
    return found


def pushed_filters(plan: str) -> list[str]:
    """Every non-empty PushedFilters list in the plan (one entry per
    scan that actually received pushdown)."""
    return [
        m.group(1)
        for m in re.finditer(r"PushedFilters: \[([^\]]+)\]", plan)
        if m.group(1).strip()
    ]
