"""Run one (or more) registry ops through the local DuckDB oracle
mirror — the fast inner loop while building a new operator.

Usage: python tools/run_one.py <op_name> [<op_name> ...] [--sf SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.001"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--sf":
            sf = sys.argv[1:][i + 1]
            args.remove(sf) if sf in args else None

    from shared_solar_data_warehouse_spark.mirror import duck_connect, run_op
    from shared_solar_data_warehouse_spark.registry import load_all_ops
    from shared_solar_data_warehouse_spark.session import get_session

    reg = load_all_ops()
    spark = get_session("sswh-run-one")
    con = duck_connect(sf)
    bad = 0
    for name in args:
        if name not in reg:
            print(f"{name}: NOT REGISTERED")
            bad += 1
            continue
        o = reg[name]
        res = run_op(spark, con, name, o.builder, o.oracle, sf)
        ok = res["status"] in ("PASS", "ROWS_ONLY")
        bad += 0 if ok else 1
        print(f"{name}: {res['status']} spark_rows={res.get('spark_rows')} "
              f"oracle_rows={res.get('oracle_rows')}")
        if not ok:
            print(res.get("detail") or res)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
