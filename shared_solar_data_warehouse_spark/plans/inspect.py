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


def simple_plan(df: DataFrame) -> str:
    """The executedPlan's simple tree string — unlike "formatted", node
    arguments print inline on the tree line (e.g. ``Exchange
    SinglePartition, ENSURE_REQUIREMENTS``), which the single-partition
    audit below needs."""
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


#: Tree nodes that bound the row count flowing up to their parent —
#: an exchange fed through one of these moves a key-domain-sized (or
#: limit-sized) input, not the raw table.
_BOUNDING = re.compile(
    r"\b(HashAggregate|SortAggregate|ObjectHashAggregate|LocalLimit|"
    r"TakeOrderedAndProject|CollectLimit|AQEShuffleRead)\b"
)


def _tree_lines(plan: str) -> list[tuple[int, str]]:
    out = []
    for line in plan.splitlines():
        m = re.match(r"^([\s:+|-]*)(.*)$", line)
        out.append((len(m.group(1)), m.group(2)))
    return out


def raw_single_partition_exchanges(plan: str) -> list[str]:
    """Every ``Exchange SinglePartition, ENSURE_REQUIREMENTS`` node
    (the shuffle Catalyst inserts under an unpartitioned Window / global
    sort) that is fed by a RAW table scan — i.e. some Scan in its
    subtree has no row-bounding ancestor (aggregate / limit) between
    itself and the exchange.  Such a node funnels the entire input
    through ONE task: the canonical 100 TB scale-killer (VERDICT r03 on
    agg_ks_test).  Unpartitioned windows over per-key AGGREGATES are
    fine (bounded by the key domain) and are not reported.

    Explicit ``repartition(1)`` (REPARTITION_BY_NUM origin) is out of
    scope — that's a deliberate, documented choice where it appears.
    """
    lines = _tree_lines(plan)
    flagged: list[str] = []
    for i, (depth, node) in enumerate(lines):
        if "Exchange SinglePartition" not in node or "ENSURE_REQUIREMENTS" not in node:
            continue
        # Scan the exchange's subtree (strictly deeper lines until the
        # indent returns to <= the exchange's own depth).
        raw_scan = False
        for j in range(i + 1, len(lines)):
            d2, n2 = lines[j]
            if d2 <= depth and n2:
                break
            if "Scan" not in n2:
                continue
            # Walk ancestors from the scan back up to the exchange: the
            # ancestor chain is the lines above with strictly decreasing
            # indentation.
            bounded = False
            min_depth = d2
            for k in range(j - 1, i, -1):
                dk, nk = lines[k]
                if dk < min_depth:
                    min_depth = dk
                    if _BOUNDING.search(nk):
                        bounded = True
                        break
            if not bounded:
                raw_scan = True
                break
        if raw_scan:
            flagged.append(node)
    return flagged


def pushed_filters(plan: str) -> list[str]:
    """Every non-empty PushedFilters list in the plan (one entry per
    scan that actually received pushdown)."""
    return [
        m.group(1)
        for m in re.finditer(r"PushedFilters: \[([^\]]+)\]", plan)
        if m.group(1).strip()
    ]
