"""Phase-level timing probe for graph_triangle_count /
graph_local_clustering's driver-bitmap regime (VERDICT r11 item 1:
the op's 32-core driver-window steady time is 5.05 s while 8-core
steady is 0.69 s — something systematic hides in one phase).

Times each phase of the dense-regime path separately, N times, after
warming the co_supplier_pairs memo exactly the way bench.py's warm
pass does:

  count     pairs.count() on the memoized RDD
  topandas  pairs.toPandas() (Arrow collect of ~E rows)
  index     pandas id->index mapping
  pack      np.bitwise_or.at bitmap build
  popcount  chunked gather + AND + table popcount
  result    spark.createDataFrame(...) + .toPandas() of the output

Usage: python tools/probe_triangle_phases.py [--n 5] [--sf SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_runs = 5
    sf = "/root/testdata/sf0.1"
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--n":
            n_runs = int(argv[i + 1])
            i += 2
        elif argv[i] == "--sf":
            sf = argv[i + 1]
            i += 2
        else:
            i += 1

    import numpy as np
    import pandas as pd

    from shared_solar_data_warehouse_spark.materialize import memo_checkpoint
    from shared_solar_data_warehouse_spark.operators.graph import (
        _co_supplier_pairs,
    )
    from shared_solar_data_warehouse_spark.session import get_session

    spark = get_session("sswh-triangle-probe")
    t0 = time.time()
    pairs = memo_checkpoint(
        spark, ("co_supplier_pairs", sf), lambda: _co_supplier_pairs(spark, sf)
    )
    pairs.count()
    print(f"memo build+count (cold): {time.time() - t0:.3f}s")

    for run in range(n_runs):
        phases: dict[str, float] = {}

        def tick(name: str, start: float) -> float:
            now = time.time()
            phases[name] = round(now - start, 4)
            return now

        t = time.time()
        n_edges = pairs.count()
        t = tick("count", t)
        edges_pd = pairs.toPandas()
        t = tick("topandas", t)
        node_ids = np.unique(
            np.concatenate([edges_pd["u"].to_numpy(), edges_pd["v"].to_numpy()])
        )
        n = len(node_ids)
        idx = pd.Series(np.arange(n), index=node_ids)
        ui = idx[edges_pd["u"].to_numpy()].to_numpy()
        vi = idx[edges_pd["v"].to_numpy()].to_numpy()
        t = tick("index", t)
        nbytes = (n + 7) // 8
        packed = np.zeros((n, nbytes), dtype=np.uint8)
        np.bitwise_or.at(
            packed,
            (ui, vi >> 3),
            np.left_shift(np.uint8(1), (7 - (vi & 7)).astype(np.uint8)),
        )
        t = tick("pack", t)
        pop = (
            np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1)
            .sum(1)
            .astype(np.uint8)
        )
        n_tri = 0
        chunk = max(1, (64 << 20) // max(1, nbytes))
        for lo in range(0, len(ui), chunk):
            sl = slice(lo, lo + chunk)
            n_tri += int(
                pop[packed[ui[sl]] & packed[vi[sl]]].sum(dtype=np.int64)
            )
        t = tick("popcount", t)
        out = spark.createDataFrame(
            [(int(n), int(n_edges), n_tri)],
            "n_nodes long, n_edges long, n_triangles long",
        )
        out.toPandas()
        t = tick("result", t)
        total = sum(phases.values())
        print(
            f"run {run}: total={total:.3f}s  "
            + "  ".join(f"{k}={v}" for k, v in phases.items())
            + f"  (E={n_edges}, V={n})"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
