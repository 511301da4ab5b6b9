"""Graph operators over the trade network (SURVEY.md §2.8 extension) —
the customer–supplier bipartite graph induced by orders ⋈ lineitem
(who buys from whom), undirected.  The reference's domain analog is the
site/circuit interaction web; the LLM-pipeline analog is duplicate-
cluster / citation-graph analytics next to §2.10's dedup family.

The marquee entry is an ITERATIVE algorithm (PageRank) expressed as
unrolled DataFrame rounds — the shape the task brief calls genuinely
non-SQL-expressible, made hash-checkable anyway by unrolling the same
three rounds in the DuckDB oracle.

Determinism (SURVEY.md §5.4): per-round contributions are quantized to
1e-15 units with ``floor(x*1e15+0.5)`` and summed as BIGINT — an exact,
order-independent accumulation (values ≤ 1, so units < 2^53) — and the
damping arithmetic is one shared double expression; both engines agree
bit-for-bit, no float-sum nondeterminism anywhere.

Scale: edges materialize once (memo_checkpoint) and each round is one
shuffle on dst — at 100 TB you'd co-partition edges and ranks on the
join key once and reuse the exchange across rounds; node count N flows
through a broadcast 1-row cross join, never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shared_solar_data_warehouse_spark.materialize import memo_checkpoint
from shared_solar_data_warehouse_spark.registry import op
from shared_solar_data_warehouse_spark.sources.io import load_table

_DAMP = 0.85
_UNIT = 1_000_000_000_000_000.0  # 1e15 quantization grid for contributions
_ROUNDS = 3


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected customer–supplier edges, materialized once
    per (app, sf_dir): both pagerank rounds and the degree ops reuse
    the join+distinct instead of recomputing it."""

    def build() -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        pairs = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .select(
                F.concat(F.lit("c"), F.col("o_custkey")).alias("c_node"),
                F.concat(F.lit("s"), F.col("l_suppkey")).alias("s_node"),
            )
            .distinct()
        )
        return pairs.select(
            F.col("c_node").alias("src"), F.col("s_node").alias("dst")
        ).unionAll(
            pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
        )

    return memo_checkpoint(spark, ("trade_edges", sf_dir), build)


_EDGES_SQL = """
    pairs AS (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c_node,
                        's' || CAST(l_suppkey AS VARCHAR) AS s_node
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), edges AS (
        SELECT c_node AS src, s_node AS dst FROM pairs
        UNION ALL
        SELECT s_node AS src, c_node AS dst FROM pairs
    )
"""


@op(
    "graph_degree_dist",
    oracle=f"""
    WITH {_EDGES_SQL}
    SELECT degree, count(*) AS n_nodes
    FROM (SELECT src, count(*) AS degree FROM edges GROUP BY src) deg
    GROUP BY degree
    """,
)
def graph_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the trade graph (how many counterparties
    each actor trades with) — two chained exact-count aggregations, the
    standard first look at any graph's skew before partitioning it."""
    deg = _edges(spark, sf_dir).groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


def _pagerank_round_sql(prev: str, out: str) -> str:
    """One unrolled oracle round: quantized contributions, BIGINT sum,
    shared damping expression (mirrors the DataFrame round exactly)."""
    return f"""
    {out} AS (
        SELECT e.dst AS node,
               0.15 / CAST(max(nn.n) AS DOUBLE)
               + 0.85 * (CAST(sum(
                     CAST(floor(r.pr / d.outdeg * 1000000000000000.0 + 0.5)
                          AS BIGINT)) AS DOUBLE) / 1000000000000000.0) AS pr
        FROM edges e
        JOIN deg d ON e.src = d.src
        JOIN {prev} r ON e.src = r.node
        CROSS JOIN nn
        GROUP BY e.dst
    )
    """


@op(
    "graph_pagerank",
    oracle=f"""
    WITH {_EDGES_SQL},
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    nn AS (SELECT count(*) AS n FROM deg),
    r0 AS (SELECT src AS node, 1.0 / CAST(n AS DOUBLE) AS pr FROM deg CROSS JOIN nn),
    {_pagerank_round_sql('r0', 'r1')},
    {_pagerank_round_sql('r1', 'r2')},
    {_pagerank_round_sql('r2', 'r3')}
    SELECT node, floor(pr * 100000000.0 + 0.5) / 100000000.0 AS pagerank
    FROM r3
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three damped PageRank rounds (d=0.85) over the undirected trade
    graph, unrolled as DataFrame plans — the iterative-algorithm entry.

    Per round: rank/outdeg contributions quantized to exact BIGINT
    units (order-independent sum), then one shared double expression
    re-ranks every node; the undirected construction leaves no dangling
    nodes so rank mass needs no redistribution term.  The oracle unrolls
    the identical three rounds as chained CTEs — full hash parity for an
    algorithm SQL can't express un-unrolled.
    """
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    # Node-cardinality sides (deg, ranks) broadcast: edges outnumber
    # nodes ~30:1 here and far more at scale, so every per-round join
    # stays map-side and the only shuffle is the groupBy(dst).  If the
    # node set ever outgrew executor memory, the fallback is
    # co-partitioning edges and ranks on the join key once.
    edges_d = edges.join(F.broadcast(deg), "src")
    ranks = deg.crossJoin(nn).select(
        F.col("src").alias("node"),
        (F.lit(1.0) / F.col("n").cast("double")).alias("pr"),
    )
    for _ in range(_ROUNDS):
        contribs = edges_d.join(
            F.broadcast(ranks.select(F.col("node").alias("src"), "pr")), "src"
        ).select(
            "dst",
            F.floor(F.col("pr") / F.col("outdeg") * _UNIT + 0.5)
            .cast("bigint")
            .alias("units"),
        )
        ranks = (
            contribs.groupBy("dst")
            .agg(F.sum("units").alias("s"))
            .crossJoin(nn)
            .select(
                F.col("dst").alias("node"),
                (
                    F.lit(0.15) / F.col("n").cast("double")
                    + F.lit(0.85) * (F.col("s").cast("double") / F.lit(_UNIT))
                ).alias("pr"),
            )
        )
    return ranks.select(
        "node",
        (F.floor(F.col("pr") * 100000000.0 + 0.5) / 100000000.0).alias("pagerank"),
    )
