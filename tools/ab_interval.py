"""Interleaved same-session A/B of join_interval_overlap's lazy
localCheckpoint barrier (VERDICT r11 item 4: builder's A/B said 5%
faster, the driver window said 17% slower — re-measure at 32 cores,
keep or revert on the evidence).

Variant "barrier" is the op as shipped; variant "nobarrier" patches
DataFrame.localCheckpoint to the identity during the build, which
removes exactly the contested barrier (the builder contains no other
checkpoint call).  Interleaved N rounds, BENCH.json methodology
(len(df.toPandas()), builder re-invoked per run).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import pyspark.sql

    from shared_solar_data_warehouse_spark.registry import REGISTRY, load_all_ops
    from shared_solar_data_warehouse_spark.session import get_session

    load_all_ops()
    spark = get_session("sswh-ab-interval")
    build = REGISTRY["join_interval_overlap"].builder

    real_ckpt = pyspark.sql.DataFrame.localCheckpoint

    def run(patched: bool) -> float:
        if patched:
            pyspark.sql.DataFrame.localCheckpoint = (
                lambda self, eager=True: self
            )
        try:
            t0 = time.time()
            df = build(spark, sf)
            nrows = len(df.toPandas())
            dt = time.time() - t0
        finally:
            pyspark.sql.DataFrame.localCheckpoint = real_ckpt
        assert nrows == 30 or nrows > 0
        return dt

    # one untimed warm-up of each
    run(False)
    run(True)
    a, b = [], []
    for i in range(n):
        a.append(run(False))
        b.append(run(True))
    print(f"barrier   runs={[round(x, 3) for x in a]} min={min(a):.3f}")
    print(f"nobarrier runs={[round(x, 3) for x in b]} min={min(b):.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
