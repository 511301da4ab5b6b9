"""Phase-level timing for the graph iterate band (pagerank / cc /
bfs_layers / jaccard): how much of each op's steady-state cost is the
per-round barrier jobs vs the final collect — measured in ONE warm
session with the memo artifacts already built.

Usage: python tools/probe_graph_phases.py [n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark.sql import functions as F

    from shared_solar_data_warehouse_spark.operators import graph as G
    from shared_solar_data_warehouse_spark.registry import REGISTRY, load_all_ops
    from shared_solar_data_warehouse_spark.session import get_session

    load_all_ops()
    spark = get_session("sswh-graph-probe")

    # Warm the memos + JIT once.
    for name in ("graph_pagerank", "graph_connected_components",
                 "graph_bfs_layers", "graph_jaccard_neighbors"):
        _ = len(REGISTRY[name].builder(spark, sf).toPandas())

    edges = G._edges(spark, sf)
    n_edges = edges.count()
    n_nodes = G._n_graph_nodes(spark, sf)
    print(f"graph: {n_nodes} nodes, {n_edges} directed edge rows")

    # pagerank phases: edges_d materialization / per-round / collect
    for _ in range(n):
        t0 = time.time()
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        nd = F.lit(n_nodes).cast("double")
        edges_d = edges.join(G._node_side(deg, n_nodes), "src").localCheckpoint(
            eager=True
        )
        t1 = time.time()
        ranks = deg.select(
            F.col("src").alias("node"), (F.lit(1.0) / nd).alias("pr")
        )
        marks = []
        for rnd in range(G._ROUNDS):
            contribs = edges_d.join(
                G._node_side(
                    ranks.select(F.col("node").alias("src"), "pr"), n_nodes
                ),
                "src",
            ).select(
                "dst",
                F.floor(F.col("pr") / F.col("outdeg") * G._UNIT + 0.5)
                .cast("bigint")
                .alias("units"),
            )
            ranks = (
                contribs.groupBy("dst")
                .agg(F.sum("units").alias("s"))
                .select(
                    F.col("dst").alias("node"),
                    (
                        F.lit(0.15) / nd
                        + F.lit(0.85)
                        * (F.col("s").cast("double") / F.lit(G._UNIT))
                    ).alias("pr"),
                )
            )
            ranks = ranks.localCheckpoint(eager=True)
            marks.append(time.time())
        out = ranks.select(
            "node",
            (F.floor(F.col("pr") * 100000000.0 + 0.5) / 100000000.0).alias(
                "pagerank"
            ),
        )
        _ = len(out.toPandas())
        t_end = time.time()
        r = [round(marks[0] - t1, 3)] + [
            round(marks[i] - marks[i - 1], 3) for i in range(1, len(marks))
        ]
        print(
            f"pagerank: edges_d={t1 - t0:.3f} rounds={r} "
            f"collect={t_end - marks[-1]:.3f} total={t_end - t0:.3f}"
        )

    # Whole-op steady for the band, for reference.
    for name in ("graph_pagerank", "graph_connected_components",
                 "graph_bfs_layers", "graph_jaccard_neighbors"):
        runs = []
        for _ in range(n):
            t0 = time.time()
            _ = len(REGISTRY[name].builder(spark, sf).toPandas())
            runs.append(round(time.time() - t0, 3))
        print(f"{name}: runs={runs} min={min(runs):.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
