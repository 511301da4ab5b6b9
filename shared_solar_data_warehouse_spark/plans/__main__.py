"""CLI: print the formatted physical plan (and operator census) for a
registry op — the tool behind PLANS.md.

    python -m shared_solar_data_warehouse_spark.plans <op_name> [sf_dir]
"""

from __future__ import annotations

import sys

from shared_solar_data_warehouse_spark.plans.inspect import (
    explain_formatted,
    operator_counts,
    pushed_filters,
)


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    name = argv[0]
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"

    from shared_solar_data_warehouse_spark.registry import load_all_ops
    from shared_solar_data_warehouse_spark.session import get_session

    ops = load_all_ops()
    if name not in ops:
        print(f"unknown op: {name}", file=sys.stderr)
        return 2
    spark = get_session("sswh-plans")
    plan = explain_formatted(ops[name].builder(spark, sf_dir))
    print(plan)
    print("## operator census:", dict(operator_counts(plan)))
    print("## pushed filters:", pushed_filters(plan))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
