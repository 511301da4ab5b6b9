"""Window functions (SURVEY.md §2.5) — load profiles, running credit
balances, counter-reset detection are all window-shaped in the
reference's domain (§0.1 reconstruction).

Every window here partitions by an entity key, so at scale each
partition's state stays executor-local after one shuffle; frames over
doubles accumulate via decimal casts (exact, order-independent) exactly
like the grouped aggregates.  Window ORDER BY always ends in a unique
tie-break key — a frame boundary that depends on shuffle order is the
classic nondeterminism bug (SURVEY.md §5.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shared_solar_data_warehouse_spark.parity import DEC
from shared_solar_data_warehouse_spark.registry import op
from shared_solar_data_warehouse_spark.sources.io import load_table

#: Row ceiling for computing a GLOBAL rank/running-sum in one
#: unpartitioned window task (win_cumulative_share).  5M ranked rows ≈
#: a few hundred MB of window state — comfortable for one task; above
#: it the operator switches to the two-pass range-partitioned rank.
RANK_SINGLE_TASK_MAX = 5_000_000


@op(
    "win_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence numbering per entity (dedup/top-k scaffold)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("order_seq"),
    )


@op(
    "win_rank_dense",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           rank() OVER w AS bal_rank,
           dense_rank() OVER w AS bal_dense_rank,
           round(percent_rank() OVER w, 4) AS bal_pct_rank,
           round(cume_dist() OVER w, 4) AS bal_cume_dist,
           ntile(4) OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS bal_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank family.  rank/dense_rank/percent_rank/cume_dist are
    deterministic under value ties by definition; ntile is NOT (it
    splits tied rows by physical order), so its window adds the unique
    key to the ordering."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    w_ntile = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.round(F.percent_rank().over(w), 4).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("bal_cume_dist"),
        F.ntile(4).over(w_ntile).alias("bal_quartile"),
    )


@op(
    "win_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           round(value - lag(value, 1) OVER w, 4) AS delta_prev,
           round(lead(value, 1) OVER w - value, 4) AS delta_next,
           lag(event_id, 1) OVER w AS prev_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor access per user ordered by event time (the counter-delta
    primitive for cumulative-energy readings).  ts itself is never
    output (ns-precision parity trap)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.round(F.col("value") - F.lag("value", 1).over(w), 4).alias("delta_prev"),
        F.round(F.lead("value", 1).over(w) - F.col("value"), 4).alias("delta_next"),
        F.lag("event_id", 1).over(w).alias("prev_event_id"),
    )


@op(
    "win_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,8))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (the running-credit-balance shape).
    Decimal accumulation inside the frame: DuckDB evaluates moving
    frames with a segment tree whose combine order differs from Spark's
    running accumulator — exact decimals make both orders identical."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias(
            "running_total"
        ),
    )


@op(
    "win_sliding_rows",
    oracle="""
    SELECT user_id, event_id,
           round(CAST(sum(CAST(value AS DECIMAL(25,8))) OVER w AS DOUBLE)
                 / CAST(count(value) OVER w AS DOUBLE), 4) AS smoothed
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def win_sliding_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-readings moving average (reading smoother)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(
            F.sum(F.col("value").cast(DEC)).over(w).cast("double")
            / F.count("value").over(w).cast("double"),
            4,
        ).alias("smoothed"),
    )


@op(
    "win_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,8))) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_30d_total,
           count(*) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ) AS trailing_30d_orders
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range frame: trailing 30 days by VALUE distance (not row
    count) — peers at equal timestamps all enter the frame, so no
    unique tie-break is needed for determinism."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias(
            "trailing_30d_total"
        ),
        F.count(F.lit(1)).over(w).alias("trailing_30d_orders"),
    )


@op(
    "win_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           nth_value(o_totalprice, 3) OVER w AS third_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth over the FULL partition frame — the default frame
    (unbounded..current) makes last_value just 'current row', a classic
    silent bug; the explicit frame is the correct idiom."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 3).over(w).alias("third_price"),
    )


@op(
    "topk_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation (row_number + filter; at
    100 TB AQE handles the skewed-nation case and rank pushdown prunes
    per-partition before the filter)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


@op(
    "win_count_distinct",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(CASE WHEN first_seen THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_types_so_far
    FROM (
        SELECT user_id, event_id, ts,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) = 1 AS first_seen
        FROM events
    ) flagged
    """,
)
def win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per entity — how many distinct record
    types has this circuit emitted up to each reading.  Window
    functions cannot take DISTINCT aggregates, so this is the standard
    two-window composition: flag each (user, type)'s first occurrence
    with row_number()==1, then running-sum the flags per user.  Two
    exchanges (the partition keys differ) — unavoidable for this
    semantics — both integer-exact, no float parity surface."""
    e = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        (F.row_number().over(w_first) == 1).alias("first_seen"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum(F.when(F.col("first_seen"), 1).otherwise(0))
        .over(w_run)
        .cast("bigint")
        .alias("n_types_so_far"),
    )


@op(
    "win_moving_median",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           median(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS qty_moving_median
    FROM lineitem
    """,
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sliding-window median (robust smoother — the outlier-proof
    twin of ``win_sliding_rows``'s moving average).

    Spark's ``median`` aggregate rejects window frames
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC, verified on 4.1.2), so
    the frame's rows are collected with ``collect_list`` over the same
    ROWS frame, ``array_sort``-ed, and the middle element(s) picked —
    all JVM-side expressions, no Python.  The frame is O(1) rows (7),
    so the per-row array cost is constant and the whole op stays one
    window exchange on the partition key; the ORDER BY ends in the
    unique (l_orderkey, l_linenumber) so frame contents are
    deterministic under shuffle (SURVEY.md §5.4).  l_quantity is a
    whole BIGINT 1..50, so the even-count midpoint average (x.5) is
    exact in double — hash-parity safe.  At 100 TB this scales like any
    keyed window: one exchange on l_suppkey, per-key state streams
    through the sort; a wide frame (say 10k rows) would instead want
    the two-heap running-median over applyInPandas.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-3, 3)
    )
    arr = F.array_sort(F.collect_list("l_quantity").over(w))
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        arr.alias("_arr"),
    ).select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.expr(
            """CASE WHEN size(_arr) % 2 = 1
                    THEN CAST(element_at(_arr, CAST(size(_arr) DIV 2 + 1 AS INT)) AS DOUBLE)
                    ELSE (CAST(element_at(_arr, CAST(size(_arr) DIV 2 AS INT)) AS DOUBLE)
                          + CAST(element_at(_arr, CAST(size(_arr) DIV 2 + 1 AS INT)) AS DOUBLE)) / 2.0
               END"""
        ).alias("qty_moving_median"),
    )


@op(
    "win_share_of_total",
    oracle="""
    WITH m AS (
        SELECT user_id, event_type,
               CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
                   AS v_micro
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type, v_micro,
           (v_micro * 1000000) //
               CAST(sum(v_micro) OVER (PARTITION BY user_id) AS BIGINT)
               AS share_ppm
    FROM m
    """,
)
def win_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-group-total (the BI "percent of total" / share-of-wallet
    measure): each circuit's per-event-type usage as ppm of the
    circuit's total.  Readings quantize to BIGINT micro-units at the
    scan, so the group sums, the window total, and the ppm ratio
    (truncated DIV) are all integer-exact.  Plan: one groupBy shuffle
    on (user_id, event_type), then the window re-uses the user_id
    prefix — AQE coalesces to a single exchange; at 100 TB the window
    state per key is one counter.
    """
    e = load_table(spark, sf_dir, "events")
    m = e.groupBy("user_id", "event_type").agg(
        F.sum(F.expr("CAST(floor(value * 1e6 + 0.5) AS BIGINT)")).alias("v_micro")
    )
    w = Window.partitionBy("user_id")
    return m.select(
        "user_id",
        "event_type",
        "v_micro",
        F.expr(
            "CAST(v_micro * 1000000 AS BIGINT)"
        ).alias("_num"),
        F.sum("v_micro").over(w).alias("_den"),
    ).select(
        "user_id",
        "event_type",
        "v_micro",
        F.expr("CAST(_num DIV _den AS BIGINT)").alias("share_ppm"),
    )


@op(
    "win_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(ntile(4) OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal, c_custkey) AS INTEGER) AS balance_quartile
    FROM customer
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-height quartile assignment per market segment (the BI
    "customer value tier" bucketing).  ntile's bucket-size rule — the
    first ``n_rows % 4`` buckets get one extra row — is the standard
    SQL definition in both engines, so parity needs only a unique
    ORDER BY (acctbal then custkey).  Plan: one hash exchange on
    c_mktsegment, then a single sort; window state is a counter, so a
    100 TB partition streams through without buffering."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("balance_quartile"),
    )


@op(
    "win_percent_rank",
    oracle="""
    WITH k AS (
        SELECT c_custkey, c_mktsegment,
               CAST(floor(c_acctbal) AS BIGINT) AS bal_floor
        FROM customer
    )
    SELECT c_custkey, c_mktsegment, bal_floor,
           CASE WHEN count(*) OVER (PARTITION BY c_mktsegment) > 1
                THEN ((CAST(rank() OVER (PARTITION BY c_mktsegment
                                         ORDER BY bal_floor) AS BIGINT) - 1)
                      * 1000000)
                     // (count(*) OVER (PARTITION BY c_mktsegment) - 1)
                ELSE 0 END AS pct_rank_ppm,
           (count(*) OVER (PARTITION BY c_mktsegment ORDER BY bal_floor
                           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            * 1000000)
               // count(*) OVER (PARTITION BY c_mktsegment) AS cume_dist_ppm
    FROM k
    """,
)
def win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist re-derived in exact integer ppm — the
    builtin forms return doubles whose division order is engine
    -specific, so this op computes the defining rationals itself:
    pct_rank = (rank-1)/(n-1), cume_dist = peers_le/n, both as
    truncated-integer ppm.  Ranking on floor(acctbal) keeps genuine
    ties so rank() vs row_number() semantics (and the RANGE-frame peer
    count) are actually exercised.  Plan: one exchange on
    c_mktsegment feeds all four windows (same partition spec), sort
    reused across them."""
    c = load_table(spark, sf_dir, "customer")
    k = c.select(
        "c_custkey",
        "c_mktsegment",
        F.expr("CAST(floor(c_acctbal) AS BIGINT)").alias("bal_floor"),
    )
    part = Window.partitionBy("c_mktsegment")
    wo = part.orderBy("bal_floor")
    peers = wo.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    n = F.count(F.lit(1)).over(part)
    return k.select(
        "c_custkey",
        "c_mktsegment",
        "bal_floor",
        ((F.rank().over(wo).cast("bigint") - 1) * 1000000).alias("_num_pr"),
        (F.count(F.lit(1)).over(peers) * 1000000).alias("_num_cd"),
        n.alias("_n"),
    ).select(
        "c_custkey",
        "c_mktsegment",
        "bal_floor",
        F.expr(
            "CASE WHEN _n > 1 THEN CAST(_num_pr DIV (_n - 1) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("pct_rank_ppm"),
        F.expr("CAST(_num_cd DIV _n AS BIGINT)").alias("cume_dist_ppm"),
    )


@op(
    "win_drawdown",
    oracle="""
    WITH q AS (
        SELECT user_id, ts, event_id,
               CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_micro
        FROM events
    ), d AS (
        SELECT user_id,
               CAST(max(cum_micro)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) - cum_micro AS drawdown
        FROM q
    )
    SELECT user_id,
           CAST(max(drawdown) AS BIGINT) AS max_drawdown_micro,
           CAST(count(*) AS BIGINT) AS n_points
    FROM d GROUP BY user_id
    """,
)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per circuit: largest drop of the cumulative
    reading total below its own running peak — the risk metric every
    billing/credit pipeline computes (how deep does a balance dip),
    expressed as two stacked running windows (cumsum, then running
    max) and a final group agg.  Everything is quantized BIGINT
    micro-units, and all three steps share the single (user_id)
    exchange + one sort — a textbook case of window partitioning
    reuse (asserted <= 1 exchange in test_plans).  Note drawdown here
    is always >= 0 by construction (running max >= current), so max()
    over it needs no null/sign care."""
    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    q = e.select(
        "user_id",
        F.sum(F.expr("CAST(floor(value * 1e6 + 0.5) AS BIGINT)"))
        .over(wo)
        .alias("cum_micro"),
        "ts",
        "event_id",
    )
    d = q.select(
        "user_id",
        (F.max("cum_micro").over(wo) - F.col("cum_micro")).alias("drawdown"),
    )
    return d.groupBy("user_id").agg(
        F.max("drawdown").alias("max_drawdown_micro"),
        F.count(F.lit(1)).alias("n_points"),
    )


@op(
    "win_cumulative_share",
    oracle="""
    WITH m AS (
        SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders GROUP BY o_custkey
    ), r AS (
        SELECT o_custkey, rev_cents,
               CAST(row_number() OVER (ORDER BY rev_cents DESC, o_custkey)
                    AS BIGINT) AS rnk,
               CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_cents,
               CAST(sum(rev_cents) OVER () AS BIGINT) AS total_cents
        FROM m
    )
    SELECT o_custkey, rev_cents, rnk,
           (cum_cents * 1000000) // total_cents AS cum_share_ppm,
           CASE WHEN cum_cents * 5 <= total_cents * 4 THEN 1 ELSE 0
                END AS in_top80
    FROM r
    """,
)
def win_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / revenue-concentration curve: customers ranked by total
    revenue with their CUMULATIVE share of all revenue (the "top X%
    of customers carry Y% of revenue" analysis), plus a flag for the
    cohort inside the 80% mass.  Revenue quantizes to integer cents
    at the scan; rank, running sum, grand total, the ppm share and
    the 80% test (cross-multiplied, no division) are all integer —
    zero float parity surface.

    Two regimes gated on the measured customer count (the
    dedup_cluster hybrid pattern, VERDICT r03 item 5):

    * ≤ `RANK_SINGLE_TASK_MAX`: unpartitioned window over the
      per-customer AGGREGATE — bounded by dimension cardinality, the
      single-partition-vocabulary argument of text_zipf_census.
    * above it: **two-pass distributed rank** — range-repartition on
      the sort key (global order preserved across partitions), local
      rank + running sum per range partition, then per-partition
      (count, sum) offsets — one tiny row per partition — prefix-
      summed and broadcast back.  `rnk = local_rnk + rows_before`,
      `cum = local_cum + cents_before`: exact, no single task ever
      holds more than one range slice.

    Both regimes emit identical values
    (tests/test_plans.py::test_cumulative_share_two_pass_regime)."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).alias(
            "rev_cents"
        )
    )
    share_cols = [
        "o_custkey",
        "rev_cents",
        "rnk",
        F.expr("CAST((cum_cents * 1000000) DIV total_cents AS BIGINT)").alias(
            "cum_share_ppm"
        ),
        F.expr(
            "CASE WHEN cum_cents * 5 <= total_cents * 4 THEN 1 ELSE 0 END"
        ).alias("in_top80"),
    ]
    if m.count() <= RANK_SINGLE_TASK_MAX:
        wo = Window.orderBy(F.col("rev_cents").desc(), "o_custkey")
        wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wall = Window.partitionBy()
        r = m.select(
            "o_custkey",
            "rev_cents",
            F.row_number().over(wo).cast("bigint").alias("rnk"),
            F.sum("rev_cents").over(wrun).alias("cum_cents"),
            F.sum("rev_cents").over(wall).alias("total_cents"),
        )
        return r.select(*share_cols)

    # Two-pass distributed rank.  pid is the RANGE partition id, read
    # before the window's own hash exchange regroups rows by it; rank
    # correctness needs only that range partition i holds keys sorted
    # entirely before partition i+1's, which repartitionByRange on the
    # full (unique) sort key guarantees wherever the sampled boundaries
    # land.
    nparts = spark.sparkContext.defaultParallelism
    part = m.repartitionByRange(
        nparts, F.col("rev_cents").desc(), F.col("o_custkey")
    ).withColumn("pid", F.spark_partition_id())
    wloc = Window.partitionBy("pid").orderBy(
        F.col("rev_cents").desc(), "o_custkey"
    )
    local = part.select(
        "o_custkey",
        "rev_cents",
        "pid",
        F.row_number().over(wloc).cast("bigint").alias("lrnk"),
        F.sum("rev_cents")
        .over(wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("lcum"),
    )
    # Per-partition offsets: |partitions| rows — the unpartitioned
    # prefix window here is over that tiny aggregate, never raw rows.
    woff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        local.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("rev_cents").alias("psum"))
        .select(
            "pid",
            F.coalesce(F.sum("pn").over(woff), F.lit(0)).alias("rows_before"),
            F.coalesce(F.sum("psum").over(woff), F.lit(0)).alias(
                "cents_before"
            ),
            F.sum("psum").over(Window.partitionBy()).alias("total_cents"),
        )
    )
    r = local.join(F.broadcast(offs), "pid").select(
        "o_custkey",
        "rev_cents",
        (F.col("lrnk") + F.col("rows_before")).alias("rnk"),
        (F.col("lcum") + F.col("cents_before")).alias("cum_cents"),
        "total_cents",
    )
    return r.select(*share_cols)


@op(
    "win_zscore",
    oracle="""
    WITH m AS (
        SELECT event_id, user_id, value,
               CAST(sum(CAST(value AS DECIMAL(25,8))) OVER w AS DOUBLE)
                   / CAST(count(*) OVER w AS DOUBLE) AS mu,
               CAST(count(*) OVER w AS BIGINT) AS n,
               CAST(sum(CAST(value AS DECIMAL(25,8))
                        * CAST(value AS DECIMAL(25,8))) OVER w AS DOUBLE)
                   AS sxx
        FROM events
        WINDOW w AS (PARTITION BY user_id)
    )
    SELECT event_id, user_id,
           CASE WHEN sxx / n - mu * mu > 0
                THEN CAST(floor((value - mu) / sqrt(sxx / n - mu * mu)
                                * 1.0e4 + 5.0e-1) AS DOUBLE) / 1.0e4
                ELSE 0.0e0 END AS zscore_q4
    FROM m
    """,
)
def win_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity z-score normalization — the feature-scaling
    primitive every ML preprocessing pipeline runs (and the
    normalize-per-group precedent of SNIPPETS [1], here as pure
    windows instead of a grouped-map UDF).  Mean and E[x²] come from
    exact DECIMAL window sums (order-independent), the population
    variance is one shared double expression, and each row's z
    floor-quantizes to 1e-4 — bit-identical on both engines.
    Degenerate (zero-variance) groups emit 0.  Plan: one
    unordered-frame window exchange on user_id; no sort needed
    (frames are whole-partition)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    m = e.select(
        "event_id",
        "user_id",
        "value",
        (
            F.sum(F.col("value").cast(DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias("mu"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum((F.col("value").cast(DEC) * F.col("value").cast(DEC)))
        .over(w)
        .cast("double")
        .alias("sxx"),
    )
    return m.select(
        "event_id",
        "user_id",
        F.expr(
            # CAST-to-DOUBLE before the divide: Spark's floor(double)
            # returns BIGINT and the `10000.0` literal parses as
            # DECIMAL, so the former spelling emitted a DECIMAL column
            # the driver canonicalizer splits from the oracle's DOUBLE
            # (caught r6 by the mirror's `dec:` token, ADVICE r5).
            "CASE WHEN sxx / n - mu * mu > 0"
            " THEN CAST(floor((value - mu) / sqrt(sxx / n - mu * mu)"
            " * 1.0e4 + 5.0e-1) AS DOUBLE) / 1.0e4"
            " ELSE 0.0e0 END"
        ).alias("zscore_q4"),
    )


@op(
    "win_moving_slope",
    oracle="""
    WITH q AS (
        SELECT user_id, ts, event_id,
               CAST(floor(value * 1e4 + 0.5) AS BIGINT) AS vq,
               CAST(row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)
                    AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase'
    ), s AS (
        SELECT user_id, ts, event_id, x,
               CAST(count(*) OVER w AS BIGINT) AS n,
               CAST(sum(x) OVER w AS BIGINT) AS sx,
               CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
               CAST(sum(vq) OVER w AS BIGINT) AS sy,
               CAST(sum(x * vq) OVER w AS BIGINT) AS sxy
        FROM q
        WINDOW w AS (PARTITION BY user_id ORDER BY x
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, ts, event_id,
           CASE WHEN n * sxy - sx * sy >= 0
                THEN (n * sxy - sx * sy) * 1000000
                     // (n * sxx - sx * sx)
                ELSE -((-(n * sxy - sx * sy)) * 1000000
                       // (n * sxx - sx * sx))
           END AS slope_ppm_q4
    FROM s WHERE n = 5
    """,
)
def win_moving_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS trend slope — the windowed generalization of
    `agg_linreg`: per circuit, the least-squares slope of the last 5
    readings against their arrival rank, the local trend signal
    behind ramp alarms (a sustained positive slope across circuits is
    a fleet-wide ramp; one circuit alone is a local anomaly).

    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) evaluated entirely from
    integer window sums over the quantized reading (x = per-user row
    rank, y = 1e-4-quantized value), emitted as a sign-split
    truncated-DIV ppm rational (the numerator CAN go negative — the
    parity.py rule — while the denominator is a positive variance for
    n=5 distinct ranks).  Partial windows (n < 5) are dropped: their
    slope estimates are rank-deficient noise.

    Shape: one (user_id) exchange serves the rank window and all
    five moving sums (same Window operator, shared sort) — the
    multi-aggregate-one-frame economics `join_pit_features` pins,
    here with a bounded sliding frame, so state per row is O(1) and
    the plan is scan → exchange → sort → window → filter."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    q = e.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 1e4 + 0.5).cast("bigint").alias("vq"),
    ).withColumn(
        "x",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .cast("bigint"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("x")
        .rowsBetween(-4, Window.currentRow)
    )
    s = q.select(
        "user_id",
        "ts",
        "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
        F.sum("vq").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("vq")).over(w).cast("bigint").alias("sxy"),
    )
    # Sign-split truncated DIV mirrors the oracle exactly (parity.py
    # signed-numerator rule: Spark DIV truncates, DuckDB // floors).
    slope = F.expr(
        "CASE WHEN n * sxy - sx * sy >= 0 "
        "THEN (n * sxy - sx * sy) * 1000000 DIV (n * sxx - sx * sx) "
        "ELSE -((-(n * sxy - sx * sy)) * 1000000 DIV (n * sxx - sx * sx)) "
        "END"
    )
    return s.filter(F.col("n") == 5).select(
        "user_id", "ts", "event_id", slope.alias("slope_ppm_q4")
    )


@op(
    "win_bollinger_band",
    oracle="""
    WITH q AS (
        SELECT user_id, event_id, ts,
               CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS vq
        FROM events
    ),
    roll AS (
        SELECT user_id, event_id, vq,
               CAST(sum(vq) OVER w AS BIGINT) AS s,
               CAST(sum(vq * vq) OVER w AS BIGINT) AS ss,
               CAST(count(*) OVER w AS BIGINT) AS n
        FROM q
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, n AS n_window,
           floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0 * 10000.0
                 + 0.5) / 10000.0 AS mid,
           floor(sqrt(greatest(
                     (CAST(ss AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                        / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 0.0))
                 / 10000.0 * 10000.0 + 0.5) / 10000.0 AS sigma,
           CASE WHEN n >= 10
                     AND CAST(vq AS DOUBLE)
                         > CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                           + 2.0 * sqrt(greatest(
                                 (CAST(ss AS DOUBLE)
                                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                    / CAST(n AS DOUBLE))
                                 / CAST(n AS DOUBLE), 0.0))
                THEN 1 ELSE 0 END AS breach_upper,
           CASE WHEN n >= 10
                     AND CAST(vq AS DOUBLE)
                         < CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                           - 2.0 * sqrt(greatest(
                                 (CAST(ss AS DOUBLE)
                                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                    / CAST(n AS DOUBLE))
                                 / CAST(n AS DOUBLE), 0.0))
                THEN 1 ELSE 0 END AS breach_lower
    FROM roll
    """,
)
def win_bollinger_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling mean ± 2σ band per circuit (the Bollinger / statistical
    process control chart) with upper/lower breach flags — the rolling
    twin of ts_anomaly_zscore's global test.  The 10-row frame
    accumulates EXACT integer sums (Σv, Σv²) of the 1e-4-quantized
    value; mean, population σ and both band tests are then shared IEEE
    expressions per row over those exact integers, so the flags
    compare identical bits on both engines (breaches only assert once
    the frame is full — warm-up rows report the stats but never flag).
    greatest(·, 0) guards the catastrophic-cancellation case where the
    variance numerator underflows to a tiny negative.  One window
    exchange on user_id with the (ts, event_id) unique order; the
    frame is O(1) rows so state is constant per key — the standard
    100 TB keyed-window shape."""
    e = load_table(spark, sf_dir, "events")
    q = e.select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(floor(value * 10000.0 + 0.5) AS BIGINT)").alias("vq"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    roll = q.select(
        "user_id",
        "event_id",
        "vq",
        F.sum("vq").over(w).cast("bigint").alias("s"),
        F.sum(F.col("vq") * F.col("vq")).over(w).cast("bigint").alias("ss"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
    )
    sd = F.col("s").cast("double")
    nd = F.col("n").cast("double")
    ssd = F.col("ss").cast("double")
    mean = sd / nd
    sigma = F.sqrt(F.greatest((ssd - sd * sd / nd) / nd, F.lit(0.0)))
    full = F.col("n") >= 10
    return roll.select(
        "user_id",
        "event_id",
        F.col("n").alias("n_window"),
        (F.floor(mean / 10000.0 * 10000.0 + 0.5) / 10000.0).alias("mid"),
        (F.floor(sigma / 10000.0 * 10000.0 + 0.5) / 10000.0).alias("sigma"),
        F.when(full & (F.col("vq").cast("double") > mean + 2.0 * sigma), F.lit(1))
        .otherwise(F.lit(0))
        .alias("breach_upper"),
        F.when(full & (F.col("vq").cast("double") < mean - 2.0 * sigma), F.lit(1))
        .otherwise(F.lit(0))
        .alias("breach_lower"),
    )


@op(
    "win_pareto_frontier",
    oracle="""
    WITH pts AS (
        SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                   AS price_cents,
               CAST(max(l_quantity) AS BIGINT) AS best_qty,
               CAST(count(*) AS BIGINT) AS n_at_price
        FROM lineitem GROUP BY 1
    ),
    sky AS (
        SELECT price_cents, best_qty, n_at_price,
               CAST(coalesce(max(best_qty) OVER (ORDER BY price_cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                    AS BIGINT) AS prev_best
        FROM pts
    )
    SELECT price_cents, best_qty, n_at_price
    FROM sky WHERE best_qty > prev_best
    """,
)
def win_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) over line items: the
    (minimize price, maximize quantity) points no other point
    dominates — the classic "best tradeoff set" query Spark has no
    native operator for, expressed as the textbook sort-scan: collapse
    to the per-price best quantity (one hash aggregate — dominance
    within equal price is just max), then one running-max window in
    ascending price order keeps exactly the rows that improve on every
    cheaper point.  All arithmetic on exact integer cents/quantities.
    The window runs over the DISTINCT-price domain, not raw rows; at
    100 TB prices are still a bounded value domain (≤ ~1e7 distinct
    cents), and the documented two-pass alternative range-partitions
    by price and merges per-range frontiers (each range's running max
    seeds the next — associative, same answer).  (r11: io.spread
    measured +21% here — the ~100k-group partial agg duplicates its
    hash table per task and the wider exchange loses; left alone.)"""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.groupBy(
        F.expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)").alias(
            "price_cents"
        )
    ).agg(
        F.max("l_quantity").cast("bigint").alias("best_qty"),
        F.count(F.lit(1)).cast("bigint").alias("n_at_price"),
    )
    w_prev = Window.orderBy("price_cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky = pts.withColumn(
        "prev_best",
        F.coalesce(F.max("best_qty").over(w_prev), F.lit(-1)).cast("bigint"),
    )
    return sky.filter(F.col("best_qty") > F.col("prev_best")).select(
        "price_cents", "best_qty", "n_at_price"
    )
