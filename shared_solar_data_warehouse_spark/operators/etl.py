"""Warehouse maintenance operators (SURVEY.md §2.8 extension) — the
merge/upsert and slowly-changing-dimension shapes every dimensional
pipeline runs between query workloads.  The reference's analog is the
nightly site-registry refresh: new meters appear (inserts), re-surveyed
meters change attributes (updates), and history must stay queryable
(SCD2 validity intervals).

Both ops are pure DataFrame compositions — MERGE INTO needs a
transactional table format (Delta/Iceberg, not in this container), but
its *semantics* are a full-outer join + conditional projection, which
is exactly what a 100 TB MERGE compiles to under the hood anyway.  At
scale the win is bucketing base and changes on the merge key so the
outer join is exchange-free; AQE handles the (typically tiny) changes
side via broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shared_solar_data_warehouse_spark.parity import davg, sql_davg
from shared_solar_data_warehouse_spark.registry import op
from shared_solar_data_warehouse_spark.sources.io import load_table, scratch_dir

#: Offset applied to event user_ids to form merge keys: the fixture's
#: user domain is a low prefix of the customer key domain, so shifting
#: it to straddle the top of the key range yields BOTH updates
#: (overlapping keys) and inserts (beyond-range keys) — every MERGE
#: branch is exercised.
_KEY_SHIFT = 1450


@op(
    "etl_upsert",
    oracle=f"""
    WITH changes AS (
        SELECT user_id + {_KEY_SHIFT} AS key,
               {sql_davg('value')} AS new_bal
        FROM events GROUP BY user_id
    )
    SELECT coalesce(key, c_custkey) AS c_custkey,
           coalesce(new_bal, round(CAST(c_acctbal AS DOUBLE), 4)) AS acctbal,
           CASE WHEN key IS NULL THEN 'keep'
                WHEN c_custkey IS NULL THEN 'insert'
                ELSE 'update' END AS action
    FROM customer FULL OUTER JOIN changes ON c_custkey = key
    """,
)
def etl_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a table format: apply a change set
    (per-user mean event value, keys shifted to straddle the dimension
    key range) onto the customer dimension — matched keys take the new
    balance (update), unmatched change keys append (insert), untouched
    base rows pass through (keep).  One full-outer join + conditional
    projection; the changes side is an aggregate output (|users| rows)
    so AQE broadcasts it, and at 100 TB base+changes bucketed on the
    key make the merge exchange-free — the same physical plan Delta's
    MERGE INTO generates."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    changes = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(davg("value").alias("new_bal"))
        .select(
            (F.col("user_id") + F.lit(_KEY_SHIFT)).alias("key"), "new_bal"
        )
    )
    merged = c.join(changes, c.c_custkey == changes.key, "full_outer")
    return merged.select(
        F.coalesce("key", "c_custkey").alias("c_custkey"),
        F.coalesce("new_bal", F.round(F.col("c_acctbal").cast("double"), 4)).alias(
            "acctbal"
        ),
        F.when(F.col("key").isNull(), F.lit("keep"))
        .when(F.col("c_custkey").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("action"),
    )


@op(
    "etl_scd2_intervals",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_type,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
               event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY date_trunc('microseconds', ts), event_id) AS prev_type
        FROM events
    ),
    starts AS (
        SELECT user_id, event_type, es, event_id
        FROM marked
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           es AS valid_from,
           lead(es) OVER w AS valid_to,
           CASE WHEN lead(es) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM starts
    WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
    """,
)
def etl_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build: compress each user's event-type stream
    into validity intervals [valid_from, valid_to) that change exactly
    when the attribute changes — the dimension-history shape every
    warehouse derives from a mutation log.  Two window passes over the
    SAME (user_id, time) ordering — lag to mark change points, lead
    over the filtered change rows to close intervals — so Spark plans
    one sort per pass but only ONE hash-partition exchange; timestamps
    are floored to epoch seconds (ns-vs-µs safe, SURVEY.md §5.4) and
    ordering ties break on event_id."""
    ev = load_table(spark, sf_dir, "events")
    w_mark = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("es"),
        "event_id",
        F.lag("event_type").over(w_mark).alias("prev_type"),
    )
    starts = marked.where(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    return starts.select(
        "user_id",
        "event_type",
        F.col("es").alias("valid_from"),
        F.lead("es").over(w).alias("valid_to"),
        F.when(F.lead("es").over(w).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_current"),
    )


#: Snapshot instant for the as-of query: 2024-01-15 12:00:00 UTC, the
#: midpoint of the events fixture's Jan-2024 span.
_SNAP_ES = 1705320000


@op(
    "etl_scd2_snapshot",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, event_type,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
               event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY date_trunc('microseconds', ts), event_id) AS prev_type
        FROM events
    ),
    starts AS (
        SELECT user_id, event_type, es, event_id
        FROM marked
        WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    hist AS (
        SELECT user_id, event_type,
               es AS valid_from,
               lead(es) OVER (PARTITION BY user_id ORDER BY es, event_id)
                   AS valid_to
        FROM starts
    )
    SELECT user_id, event_type AS state_at_snapshot, valid_from
    FROM hist
    WHERE valid_from <= {_SNAP_ES}
      AND (valid_to IS NULL OR valid_to > {_SNAP_ES})
    """,
)
def etl_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) query over the SCD2 history: the one
    row per user whose validity interval [valid_from, valid_to) covers
    the snapshot instant — how a warehouse answers "what was every
    user's state on Jan 15?".  Built on the same two-window-pass
    interval derivation as `etl_scd2_intervals`; the snapshot predicate
    is a plain filter, so at 100 TB it pushes below the second window
    ONLY via the valid_from half — the real scale play is persisting
    the history partitioned by valid_from month so snapshots prune to
    a handful of partitions."""
    ev = load_table(spark, sf_dir, "events")
    w_mark = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("es"),
        "event_id",
        F.lag("event_type").over(w_mark).alias("prev_type"),
    )
    starts = marked.where(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    hist = starts.select(
        "user_id",
        "event_type",
        F.col("es").alias("valid_from"),
        F.lead("es").over(w).alias("valid_to"),
    )
    return hist.filter(
        (F.col("valid_from") <= _SNAP_ES)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > _SNAP_ES))
    ).select("user_id", F.col("event_type").alias("state_at_snapshot"), "valid_from")


@op(
    "etl_dq_report",
    oracle="""
    WITH j AS (
        SELECT l.l_quantity, l.l_extendedprice, l.l_discount, l.l_shipdate,
               o.o_orderkey, o.o_orderdate
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), a AS (
        SELECT count(*) AS n_checked,
               CAST(count_if(l_quantity IS NULL) AS BIGINT) AS qty_null,
               CAST(count_if(l_quantity IS NOT NULL
                        AND (l_quantity < 1 OR l_quantity > 50)) AS BIGINT)
                   AS qty_out_of_range,
               CAST(count_if(l_extendedprice <= 0) AS BIGINT) AS price_nonpositive,
               CAST(count_if(l_discount < 0 OR l_discount > 1) AS BIGINT)
                   AS discount_out_of_range,
               CAST(count_if(o_orderkey IS NULL) AS BIGINT) AS orphan_lineitem,
               CAST(count_if(l_shipdate < o_orderdate) AS BIGINT) AS ship_before_order
        FROM j
    )
    SELECT rule_name, n_violations, n_checked FROM (
        SELECT 'qty_null' AS rule_name, qty_null AS n_violations, n_checked FROM a
        UNION ALL SELECT 'qty_out_of_range', qty_out_of_range, n_checked FROM a
        UNION ALL SELECT 'price_nonpositive', price_nonpositive, n_checked FROM a
        UNION ALL SELECT 'discount_out_of_range', discount_out_of_range, n_checked FROM a
        UNION ALL SELECT 'orphan_lineitem', orphan_lineitem, n_checked FROM a
        UNION ALL SELECT 'ship_before_order', ship_before_order, n_checked FROM a
    )
    """,
)
def etl_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality rule report — the warehouse-ingest gate the
    reference's pipeline needs for gateway logs (duplicate/corrupt
    records, counter anomalies; SURVEY.md §0.1): every rule evaluated
    in ONE pass as conditional aggregates (count_if), then the 1-row
    result unpivoted with stack() into (rule_name, n_violations,
    n_checked).

    Plan: one lineitem<-left-orders shuffle join (referential-orphan
    rule needs it) feeding a single global aggregate whose partial
    states are seven counters — map-side combine reduces each partition
    to one row, so the final exchange moves ~n_partitions rows no
    matter the table size.  At 100 TB this is the cheapest possible
    full-table audit: one join + one all-reduce; rules that need no
    join would split into a join-free branch to skip the shuffle
    entirely.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey, "left")
    a = j.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.expr("count_if(l_quantity IS NULL)").alias("qty_null"),
        F.expr(
            "count_if(l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 50))"
        ).alias("qty_out_of_range"),
        F.expr("count_if(l_extendedprice <= 0)").alias("price_nonpositive"),
        F.expr("count_if(l_discount < 0 OR l_discount > 1)").alias(
            "discount_out_of_range"
        ),
        F.expr("count_if(o_orderkey IS NULL)").alias("orphan_lineitem"),
        F.expr("count_if(l_shipdate < o_orderdate)").alias("ship_before_order"),
    )
    return a.select(
        F.expr(
            """stack(6,
                 'qty_null', qty_null,
                 'qty_out_of_range', qty_out_of_range,
                 'price_nonpositive', price_nonpositive,
                 'discount_out_of_range', discount_out_of_range,
                 'orphan_lineitem', orphan_lineitem,
                 'ship_before_order', ship_before_order)
               AS (rule_name, n_violations)"""
        ),
        "n_checked",
    )


@op(
    "etl_cdc_diff",
    oracle="""
    WITH old AS (
        SELECT c_custkey, c_acctbal AS old_bal FROM customer
        WHERE c_custkey % 10 <> 0
    ), new AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0
                    ELSE c_acctbal END AS new_bal
        FROM customer WHERE c_custkey % 7 <> 0
    )
    SELECT coalesce(old.c_custkey, new.c_custkey) AS c_custkey,
           CASE WHEN old.c_custkey IS NULL THEN 'insert'
                WHEN new.c_custkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           old.old_bal, new.new_bal
    FROM old FULL OUTER JOIN new ON old.c_custkey = new.c_custkey
    WHERE old.c_custkey IS NULL OR new.c_custkey IS NULL
          OR old.old_bal <> new.new_bal
    """,
)
def etl_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture snapshot diff: classify every key across two
    table snapshots as insert / delete / update (unchanged rows drop
    out) — the incremental-load primitive feeding etl_upsert/SCD2.
    Two deterministic snapshot views are derived from the customer
    fixture (old drops custkey%10, new drops %7 and bumps %3 balances).

    Plan: ONE full-outer sort-merge join on the key — at 100 TB both
    snapshots are bucketed on the key and the join is co-located,
    shuffle-free; the value comparison is a narrow projection.  Floats
    compare raw (identical parquet doubles both sides, no arithmetic).
    """
    c = load_table(spark, sf_dir, "customer")
    old = c.filter(F.col("c_custkey") % 10 != 0).select(
        "c_custkey", F.col("c_acctbal").alias("old_bal")
    )
    new = c.filter(F.col("c_custkey") % 7 != 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("new_bal"),
    )
    j = old.join(new, "c_custkey", "full_outer")
    return j.select(
        "c_custkey",
        F.when(F.col("old_bal").isNull(), F.lit("insert"))
        .when(F.col("new_bal").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
        "old_bal",
        "new_bal",
    ).filter(
        F.col("old_bal").isNull()
        | F.col("new_bal").isNull()
        | (F.col("old_bal") != F.col("new_bal"))
    )


#: Incremental-rollup cut: rows before this day form the persisted
#: aggregate artifact; rows on/after it are the incoming delta.
_ROLLUP_CUT = "2024-01-25"


@op(
    "etl_incremental_rollup",
    oracle="""
    SELECT user_id, event_type,
           CAST(sum(CAST(floor(value * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_q4,
           count(*) AS n_rows
    FROM events
    GROUP BY user_id, event_type
    """,
)
def etl_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: merge a persisted rollup
    artifact (all history before the cut day) with a fresh delta
    partition (the cut day onward) WITHOUT re-scanning history — the
    nightly-rollup pattern behind every warehouse's materialized
    daily/hourly tables.

    Both sides reduce to the same mergeable state (sum of 1e-4
    quantized BIGINTs + count); the merge is a union + re-aggregate of
    partial states, so its cost scales with |groups|, not |history
    rows|.  The oracle computes the full-history aggregate directly —
    passing proves merge(partial(old), partial(new)) ==
    aggregate(all), the algebraic-aggregate contract that makes
    incremental maintenance sound.  At 100 TB: the artifact is a
    parquet table partitioned by group hash; each night reads only the
    delta partitions + the artifact, never the raw history."""
    e = load_table(spark, sf_dir, "events")
    vq = F.expr("CAST(floor(value * 1e4 + 0.5) AS BIGINT)")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id", "event_type").agg(
            F.sum(vq).alias("sum_q4"), F.count(F.lit(1)).alias("n_rows")
        )

    artifact = partial(e.filter(F.col("ts") < _ROLLUP_CUT))
    delta = partial(e.filter(F.col("ts") >= _ROLLUP_CUT))
    return (
        artifact.unionAll(delta)
        .groupBy("user_id", "event_type")
        .agg(
            F.sum("sum_q4").cast("bigint").alias("sum_q4"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
    )


@op(
    "etl_zorder_key",
    oracle="""
    WITH b AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_partkey % 256 AS BIGINT) AS px,
               CAST(l_suppkey % 256 AS BIGINT) AS sy
        FROM lineitem
    ), z AS (
        SELECT l_orderkey, l_linenumber, px, sy,
               CAST(
                 ((px & 1))         | ((sy & 1) << 1)
               | ((px & 2) << 1)    | ((sy & 2) << 2)
               | ((px & 4) << 2)    | ((sy & 4) << 3)
               | ((px & 8) << 3)    | ((sy & 8) << 4)
               | ((px & 16) << 4)   | ((sy & 16) << 5)
               | ((px & 32) << 5)   | ((sy & 32) << 6)
               | ((px & 64) << 6)   | ((sy & 64) << 7)
               | ((px & 128) << 7)  | ((sy & 128) << 8)
               AS BIGINT) AS zcode
        FROM b
    )
    SELECT CAST(zcode >> 10 AS BIGINT) AS zfile,
           count(*) AS n_rows,
           CAST(min(px) AS BIGINT) AS px_min, CAST(max(px) AS BIGINT) AS px_max,
           CAST(min(sy) AS BIGINT) AS sy_min, CAST(max(sy) AS BIGINT) AS sy_max
    FROM z GROUP BY 1
    """,
)
def etl_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key + the per-file min/max ranges it
    yields — the data-layout move behind multi-dimensional pruning
    (Delta OPTIMIZE ZORDER, Hudi clustering): interleave the bits of
    two bucketed keys so a range of the combined key stays tight in
    BOTH dimensions.  The op emits one row per simulated file
    (zcode >> 10 ≈ 64 z-tiles) with each dimension's min/max — the
    parquet footer stats a scan would prune on; both spans stay
    ~2^5 wide out of 256, vs 256 for a single-key sort.  Bit
    interleave is pure integer &/<<;| identical in both engines.
    Plan: scan → project (codegen'd bit ops) → one partial-agg
    groupBy; at 100 TB this is the layout job you run once per
    partition, then every two-predicate scan prunes ~97% of files."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.expr("CAST(l_partkey % 256 AS BIGINT)").alias("px"),
        F.expr("CAST(l_suppkey % 256 AS BIGINT)").alias("sy"),
    )
    interleave = " | ".join(
        f"((px & {1 << i}) << {i}) | ((sy & {1 << i}) << {i + 1})"
        for i in range(8)
    )
    z = b.withColumn("zcode", F.expr(f"CAST({interleave} AS BIGINT)"))
    return z.groupBy(
        F.expr("CAST(zcode >> 10 AS BIGINT)").alias("zfile")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("px").alias("px_min"),
        F.max("px").alias("px_max"),
        F.min("sy").alias("sy_min"),
        F.max("sy").alias("sy_max"),
    )


@op(
    "etl_table_checksum",
    oracle="""
    WITH h AS (
        SELECT CAST(o_orderkey % 32 AS BIGINT) AS bucket,
               CAST(('0x' || substr(md5(
                     CAST(o_orderkey AS VARCHAR) || '|' ||
                     CAST(o_custkey AS VARCHAR) || '|' ||
                     o_orderstatus || '|' ||
                     CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                          AS VARCHAR)), 1, 15)) AS BIGINT) AS rh
        FROM orders
    )
    SELECT bucket,
           count(*) AS n_rows,
           CAST(bit_xor(rh) AS BIGINT) AS checksum
    FROM h GROUP BY bucket
    """,
)
def etl_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content checksum per key bucket — the anti-entropy primitive
    for verifying a 100 TB replica/migration without moving data:
    each row hashes (md5 over a canonical '|'-joined rendering, 60
    bits kept), buckets combine with bit_xor — commutative,
    fixed-width, and overflow-free at ANY row count (a modular sum
    needs decimal headroom; XOR needs none), so the checksum is
    shuffle-order-independent by construction.  Two engines/sites
    comparing (bucket, n_rows, checksum) localize any divergence to
    a bucket before any row-level diff; n_rows guards the one XOR
    blind spot (paired duplicate rows cancel).  Money enters the
    hash as integer cents (double formatting never crosses
    engines).
    Plan: scan → project (codegen md5) → one partial-agg groupBy."""
    o = load_table(spark, sf_dir, "orders")
    h = o.select(
        F.expr("CAST(o_orderkey % 32 AS BIGINT)").alias("bucket"),
        F.expr(
            "CAST(conv(substr(md5(concat("
            "CAST(o_orderkey AS STRING), '|',"
            " CAST(o_custkey AS STRING), '|',"
            " o_orderstatus, '|',"
            " CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
            " AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        ).alias("rh"),
    )
    return h.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("CAST(bit_xor(rh) AS BIGINT)").alias("checksum"),
    )


@op(
    "etl_file_manifest",
    oracle="""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           count(*) AS n_rows,
           CAST(min(l_orderkey) AS BIGINT) AS orderkey_min,
           CAST(max(l_orderkey) AS BIGINT) AS orderkey_max,
           CAST(min(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS qty_min_cents,
           CAST(max(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS qty_max_cents
    FROM lineitem GROUP BY 1
    """,
)
def etl_file_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest/statistics collection over a physical table layout —
    what Iceberg/Delta keep per data file (row count + per-column
    min/max bounds) so a planner can prune files from metadata alone.
    The op materializes the year-partitioned layout (one file per
    ship_year via repartition on the partition column), re-reads it,
    and derives each row's physical file with `input_file_name()`;
    stats aggregate per file.  Output keys on the ship_year parsed
    back OUT of the file path (regexp over the hive-style
    `ship_year=YYYY` directory) — proving the path→stats linkage
    while keeping the nondeterministic scratch prefix out of the
    output.  The oracle computes the same bounds logically (one file
    == one year by construction).  At 100 TB this is the metadata
    job that runs at write time; scans then skip whole files when
    the predicate misses [min,max] — the dynamic twin of the static
    z-order spans in etl_zorder_key."""
    from shared_solar_data_warehouse_spark.sources.io import scratch_dir

    path = scratch_dir(sf_dir, "etl_file_manifest")
    # Only the stats columns travel to the scratch layout: the manifest
    # job reads back exactly (l_orderkey, l_quantity) + the partition
    # dir, so writing lineitem's other 13 columns was pure write+read
    # amplification (guide §2.3/§6 — project before heavy I/O; the r11
    # before-plan's re-read ReadSchema already proved the rest unused).
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", F.year("l_shipdate").alias("ship_year")
    )
    li.repartition("ship_year").write.partitionBy("ship_year").mode(
        "overwrite"
    ).parquet(path)
    back = spark.read.parquet(path).withColumn(
        "_file", F.input_file_name()
    )
    return back.groupBy(
        F.regexp_extract("_file", r"ship_year=(\d+)", 1)
        .cast("bigint")
        .alias("ship_year")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_orderkey").alias("orderkey_min"),
        F.max("l_orderkey").alias("orderkey_max"),
        F.min(F.expr("CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)")).alias(
            "qty_min_cents"
        ),
        F.max(F.expr("CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)")).alias(
            "qty_max_cents"
        ),
    )


@op(
    "etl_compaction_plan",
    oracle="""
    WITH m AS (
        SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               CAST(l_orderkey % 8 AS BIGINT) AS frag,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(1 AS BIGINT) AS n_files
        FROM lineitem GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(greatest(sum(n_rows) // 24, 1) AS BIGINT) AS target
        FROM m
    ), planned AS (
        SELECT ship_year, frag, n_rows, n_files,
               CAST(sum(n_rows) OVER (
                   PARTITION BY ship_year ORDER BY frag
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
        FROM m
    )
    SELECT p.ship_year, p.frag, p.n_rows, p.n_files,
           CAST((p.cum - p.n_rows) // t.target AS BIGINT) AS compact_group
    FROM planned p CROSS JOIN tot t
    """,
)
def etl_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner — the lakehouse maintenance job
    (Delta OPTIMIZE / Iceberg rewrite_data_files) as explicit algebra.
    The op materializes a deliberately FRAGMENTED layout (hive
    partitions (ship_year, frag) with one parquet file each, frag =
    orderkey mod 8 — the many-small-files shape streaming ingest
    leaves behind), re-reads the physical manifest via
    ``input_file_name()``, and greedily bin-packs files in layout
    order into compaction groups: ``group = rows_before DIV target``
    with target = total/24 — consecutive small files coalesce until
    the target size is reached, large files stay alone.  Output is
    the rewrite plan (file → compact_group) plus the per-file census;
    ``n_files`` doubles as the one-file-per-partition-dir proof (the
    oracle pins it to 1).

    At 100 TB: the manifest census is metadata-sized (one row per
    file), the prefix window partitions by table partition (bounded),
    and the plan's groups are exactly the rewrite tasks a maintenance
    scheduler would submit; only the rewrite itself (not planned
    here) touches data bytes.  The same shape plans by byte size when
    the manifest carries file sizes (Iceberg's) instead of row
    counts."""
    from shared_solar_data_warehouse_spark.sources.io import scratch_dir

    path = scratch_dir(sf_dir, "etl_compaction_plan")
    # The fragmented layout carries one payload column: the manifest
    # census below reads only row counts and file paths (the r11
    # before-plan's re-read ReadSchema is struct<>), so materializing
    # lineitem's full width was write amplification with zero readers
    # (guide §6 — the plan is computed from metadata-sized inputs).
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.year("l_shipdate").cast("bigint").alias("ship_year"),
        F.expr("CAST(l_orderkey % 8 AS BIGINT)").alias("frag"),
    )
    li.repartition("ship_year", "frag").write.partitionBy(
        "ship_year", "frag"
    ).mode("overwrite").parquet(path)
    # Lazy barrier: the census feeds BOTH the window side and the
    # `target` scalar — without it the whole scratch re-read + two-level
    # aggregate ran twice (duplicated subtree in the r11 before-plan).
    m = (
        spark.read.parquet(path)
        .withColumn("_file", F.input_file_name())
        .groupBy(
            F.regexp_extract(F.col("_file"), r"ship_year=(\d+)", 1)
            .cast("bigint")
            .alias("ship_year"),
            F.regexp_extract(F.col("_file"), r"frag=(\d+)", 1)
            .cast("bigint")
            .alias("frag"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("_file").alias("n_files"),
        )
        .localCheckpoint(eager=False)
    )
    target = m.agg(
        F.greatest(
            F.expr("CAST(sum(n_rows) DIV 24 AS BIGINT)"), F.lit(1).cast("bigint")
        ).alias("target")
    )
    w = Window.partitionBy("ship_year").orderBy("frag").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    planned = m.withColumn("cum", F.sum("n_rows").over(w))
    return planned.crossJoin(F.broadcast(target)).select(
        "ship_year",
        "frag",
        "n_rows",
        "n_files",
        F.expr("CAST((cum - n_rows) DIV target AS BIGINT)").alias(
            "compact_group"
        ),
    )


@op(
    "etl_gdpr_erasure",
    oracle="""
    WITH victims AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 37 = 0
    ), remaining AS (
        SELECT e.* FROM events e
        WHERE NOT EXISTS (SELECT 1 FROM victims v WHERE v.user_id = e.user_id)
    )
    SELECT (SELECT count(*) FROM events) AS n_before,
           (SELECT count(*) FROM events e
            JOIN victims v ON e.user_id = v.user_id) AS n_erased,
           count(*) AS n_after,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_after,
           CAST(bit_xor(CAST(('0x' || substr(md5(
                CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)) AS BIGINT)
               AS survivor_checksum
    FROM remaining
    """,
)
def etl_gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten erasure with an audit trail: drop every
    record of the subjects on a deletion list (broadcast anti join),
    and emit the audit row compliance wants — counts before/erased/
    after plus an order-independent checksum over the SURVIVING
    record ids (bit_xor of 60-bit md5 — the etl_table_checksum
    primitive) so a re-run or a replica can prove byte-equivalent
    erasure without exchanging data.  At 100 TB the anti join is a
    broadcast Bloom/IN over the (always comparatively tiny) deletion
    list, and the write side rewrites only the partitions that
    contained a victim — this op is the semantics; the table format
    supplies the selective rewrite."""
    e = load_table(spark, sf_dir, "events")
    victims = (
        e.filter(F.expr("user_id % 37 = 0")).select("user_id").distinct()
    )
    remaining = e.join(F.broadcast(victims), "user_id", "left_anti")
    n_before = e.count()
    audit = remaining.agg(
        F.count(F.lit(1)).alias("n_after"),
        F.countDistinct("user_id").alias("n_users_after"),
        F.expr(
            "CAST(bit_xor(CAST(conv(substr(md5(CAST(event_id AS STRING)),"
            " 1, 15), 16, 10) AS BIGINT)) AS BIGINT)"
        ).alias("survivor_checksum"),
    )
    return audit.select(
        F.lit(n_before).cast("bigint").alias("n_before"),
        (F.lit(n_before) - F.col("n_after")).cast("bigint").alias("n_erased"),
        "n_after",
        "n_users_after",
        "survivor_checksum",
    )


@op(
    "etl_partition_skew_audit",
    oracle="""
    WITH per_key AS (
        SELECT l_suppkey AS join_key, count(*) AS cnt
        FROM lineitem
        GROUP BY l_suppkey
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(cnt) AS BIGINT) AS total_rows
        FROM per_key
    )
    SELECT join_key, cnt,
           cnt * 1000000 // total_rows AS share_ppm,
           cnt * n_keys * 1000000 // total_rows AS skew_x_ppm,
           (cnt * n_keys + total_rows - 1) // total_rows
               AS recommended_salt
    FROM per_key, tot
    ORDER BY cnt DESC, join_key
    LIMIT 10
    """,
)
def etl_partition_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit — the pre-flight check before any large
    shuffle: per-key row counts on the prospective join/partition key,
    each heavy hitter's share, its skew factor versus a perfectly
    uniform distribution (cnt/avg, in ppm), and the per-key salt
    fan-out that would level it (ceil(cnt/avg) — the number
    `join_skew_salted` takes as its salting degree).  Top-10 heaviest
    keys, deterministically tie-broken.

    Shape: one partial+final count aggregate (the same shuffle the
    audited join would pay, but carrying only (key, count) pairs), a
    1-row total broadcast-NL rejoined, and TakeOrderedAndProject for
    the top-k — at 100 TB this costs one pass over the fact's key
    column and is exactly how AQE's skew statistics are gathered,
    surfaced as a queryable table instead of a planner internal.  All
    derived metrics are positive-domain integer DIV (floor == trunc,
    hash-parity proof)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_suppkey").alias("join_key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("total_rows"),
    )
    j = per_key.crossJoin(F.broadcast(tot))
    return (
        j.select(
            "join_key",
            "cnt",
            F.expr("cnt * 1000000 DIV total_rows").alias("share_ppm"),
            F.expr("cnt * n_keys * 1000000 DIV total_rows").alias("skew_x_ppm"),
            F.expr(
                "(cnt * n_keys + total_rows - 1) DIV total_rows"
            ).alias("recommended_salt"),
        )
        .orderBy(F.col("cnt").desc(), "join_key")
        .limit(10)
    )


@op(
    "etl_orphan_fk_audit",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS fk,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphan,
           CAST(coalesce((SELECT min(l_orderkey) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)), -1)
                AS BIGINT) AS min_orphan_key
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           CAST(coalesce((SELECT min(o_custkey) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)), -1)
                AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           CAST((SELECT count(*) FROM customer) AS BIGINT),
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT),
           CAST(coalesce((SELECT min(c_nationkey) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey)), -1)
                AS BIGINT)
    """,
)
def etl_orphan_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema's three FK
    edges: child row count, orphan count (child keys with no parent),
    and the smallest orphan key as the repro pointer (-1 = clean).
    At 100 TB this is the ingest gate that catches a partial parent
    load before a fact backfill fans out over it.

    Shape: each FK edge is a left-anti join (the orphan set) reduced
    to (count, min) — for the two dim-parent edges the anti join
    broadcasts the parent key set; for lineitem->orders the parent is
    fact-sized, so the anti join shuffles both sides on the key,
    which is the irreducible cost of exact orphan detection (the
    cheap screen at 100 TB is this op's Bloom variant: probe the
    join_bloom_prefilter filter and only anti-join survivors).  The
    three 1-row audits union into one report."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    def audit(child: DataFrame, key: str, parent: DataFrame, pkey: str, tag: str):
        orphans = child.join(
            parent.select(pkey), child[key] == parent[pkey], "left_anti"
        )
        return child.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_child")
        ).crossJoin(
            orphans.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orphan"),
                F.coalesce(F.min(key), F.lit(-1)).cast("bigint").alias(
                    "min_orphan_key"
                ),
            )
        ).select(F.lit(tag).alias("fk"), "n_child", "n_orphan", "min_orphan_key")

    return (
        audit(li, "l_orderkey", o, "o_orderkey", "lineitem.l_orderkey->orders")
        .unionAll(audit(o, "o_custkey", c, "c_custkey", "orders.o_custkey->customer"))
        .unionAll(audit(c, "c_nationkey", n, "n_nationkey", "customer.c_nationkey->nation"))
    )


@op(
    "etl_k_anonymity_audit",
    oracle="""
    WITH g AS (
        SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey,
               count(*) AS group_size
        FROM customer
        GROUP BY 1, 2
    )
    SELECT c_mktsegment, c_nationkey, group_size,
           CAST(5 - group_size AS BIGINT) AS k_deficit
    FROM g WHERE group_size < 5
    """,
)
def etl_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity gate (k=5) on the quasi-identifier pair
    (market segment, nation): every QI combination carried by fewer
    than k individuals is a re-identification risk — the release
    blocker privacy review runs BEFORE exporting any "anonymized"
    extract, and the quantitative sibling of etl_gdpr_erasure's
    deletion audit.  Output is the violation worklist: each unsafe
    QI cell with its size and how many synthetic/suppressed records
    would be needed to reach k.

    Scale: one partial-agg groupBy over QI-cell cardinality (bounded
    by the dimension product, not the fact); generalization ladders
    (nation → region) re-run the same aggregate on coarser keys."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy(
        "c_mktsegment", F.col("c_nationkey").cast("bigint").alias("c_nationkey")
    ).agg(F.count(F.lit(1)).alias("group_size"))
    return g.filter(F.col("group_size") < 5).select(
        "c_mktsegment",
        "c_nationkey",
        "group_size",
        F.expr("CAST(5 - group_size AS BIGINT)").alias("k_deficit"),
    )


@op(
    "etl_schema_drift_audit",
    oracle="""
    WITH b1 AS (
        SELECT CAST(i AS BIGINT) AS reading_id,
               CAST(i * 13 % 997 AS BIGINT) AS wh,
               concat('fw_1.', i % 3) AS firmware,
               CAST(NULL AS BIGINT) AS temp_c
        FROM (SELECT unnest(generate_series(0, 39)) AS i)
    ), b2 AS (
        SELECT CAST(100 + i AS BIGINT) AS reading_id,
               CAST(i * 13 % 997 AS BIGINT) AS wh,
               CAST(NULL AS VARCHAR) AS firmware,
               CAST(i % 45 AS BIGINT) AS temp_c
        FROM (SELECT unnest(generate_series(0, 59)) AS i)
    ), u AS (
        SELECT 'batch_1' AS batch, * FROM b1
        UNION ALL
        SELECT 'batch_2' AS batch, * FROM b2
    ), census AS (
        SELECT field,
               CAST(sum(CASE WHEN batch = 'batch_1' AND present THEN 1
                             ELSE 0 END) AS BIGINT) AS n_b1,
               CAST(sum(CASE WHEN batch = 'batch_2' AND present THEN 1
                             ELSE 0 END) AS BIGINT) AS n_b2
        FROM (
            SELECT batch, 'reading_id' AS field,
                   reading_id IS NOT NULL AS present FROM u
            UNION ALL
            SELECT batch, 'wh', wh IS NOT NULL FROM u
            UNION ALL
            SELECT batch, 'firmware', firmware IS NOT NULL FROM u
            UNION ALL
            SELECT batch, 'temp_c', temp_c IS NOT NULL FROM u
        ) GROUP BY field
    )
    SELECT field, n_b1, n_b2,
           CASE WHEN n_b1 > 0 AND n_b2 = 0 THEN 'dropped'
                WHEN n_b1 = 0 AND n_b2 > 0 THEN 'added'
                ELSE 'stable' END AS drift_status
    FROM census
    """,
)
def etl_schema_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift detector between two NDJSON ingest batches — the
    upstream-broke-the-contract alarm (a gateway firmware update adds
    temp_c and silently drops firmware): read BOTH batches under the
    UNION schema (declared, never inferred — absent fields surface as
    NULL columns), census per-field non-null presence per batch, and
    classify added / dropped / stable.  The fixture batches are
    deterministic integer formulas, so the oracle reconstructs both
    from generate_series and the classification is hash-verified.

    Scale: presence counts are one long-form unpivot + one aggregate
    over (field × batch) cardinality; at 100 TB this runs as a
    per-ingest-batch metadata job whose output feeds the
    quarantine-or-evolve decision (scan_parquet_schema_evolution is
    the evolve path)."""
    import json as _json

    path = scratch_dir(sf_dir, "etl_schema_drift_audit")
    b1 = os.path.join(path, "batch_1")
    b2 = os.path.join(path, "batch_2")
    os.makedirs(b1, exist_ok=True)
    os.makedirs(b2, exist_ok=True)
    with open(os.path.join(b1, "part.json"), "w") as fh:
        for i in range(40):
            fh.write(
                _json.dumps(
                    {
                        "reading_id": i,
                        "wh": i * 13 % 997,
                        "firmware": f"fw_1.{i % 3}",
                    }
                )
                + "\n"
            )
    with open(os.path.join(b2, "part.json"), "w") as fh:
        for i in range(60):
            fh.write(
                _json.dumps(
                    {"reading_id": 100 + i, "wh": i * 13 % 997,
                     "temp_c": i % 45}
                )
                + "\n"
            )
    union_schema = (
        "reading_id long, wh long, firmware string, temp_c long"
    )
    u = (
        spark.read.schema(union_schema)
        .json(b1)
        .withColumn("batch", F.lit("batch_1"))
        .unionByName(
            spark.read.schema(union_schema)
            .json(b2)
            .withColumn("batch", F.lit("batch_2"))
        )
    )
    long = None
    for field in ("reading_id", "wh", "firmware", "temp_c"):
        part = u.select(
            "batch",
            F.lit(field).alias("field"),
            F.col(field).isNotNull().alias("present"),
        )
        long = part if long is None else long.unionAll(part)
    census = long.groupBy("field").agg(
        F.sum(
            F.when((F.col("batch") == "batch_1") & F.col("present"), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_b1"),
        F.sum(
            F.when((F.col("batch") == "batch_2") & F.col("present"), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_b2"),
    )
    return census.select(
        "field",
        "n_b1",
        "n_b2",
        F.expr(
            "CASE WHEN n_b1 > 0 AND n_b2 = 0 THEN 'dropped'"
            " WHEN n_b1 = 0 AND n_b2 > 0 THEN 'added'"
            " ELSE 'stable' END"
        ).alias("drift_status"),
    )


@op(
    "etl_backfill_plan",
    oracle="""
    WITH obs AS (
        SELECT DISTINCT event_type,
               CAST(user_id % 8 AS BIGINT) AS bucket,
               CAST(ts AS DATE) AS d
        FROM events
    ), span AS (
        SELECT min(d) AS mn, max(d) AS mx FROM obs
    ), combos AS (
        SELECT DISTINCT event_type, bucket FROM obs
    ), spine AS (
        SELECT c.event_type, c.bucket, CAST(g.d AS DATE) AS d
        FROM combos c
        CROSS JOIN span s
        CROSS JOIN LATERAL (
            SELECT unnest(generate_series(s.mn, s.mx, INTERVAL 1 DAY)) AS d
        ) g
    ), missing AS (
        SELECT s.event_type, s.bucket, s.d
        FROM spine s
        LEFT JOIN obs o
          ON o.event_type = s.event_type AND o.bucket = s.bucket
             AND o.d = s.d
        WHERE o.d IS NULL
    ), islands AS (
        SELECT event_type, bucket, d,
               d - CAST(row_number() OVER (
                       PARTITION BY event_type, bucket ORDER BY d)
                   AS INTEGER) AS grp
        FROM missing
    )
    SELECT event_type, bucket,
           min(d) AS backfill_start,
           max(d) AS backfill_end,
           CAST(count(*) AS BIGINT) AS n_days
    FROM islands GROUP BY event_type, bucket, grp
    """,
)
def etl_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill planner — the job every scheduled-ingest pipeline runs
    before a catch-up: at the (event_type × user-bucket × day) grain,
    find the day CELLS with no data inside the corpus' global day
    span and compress consecutive missing days into contiguous
    [start, end] ranges (gaps-and-islands: day minus its per-cell
    row_number is constant within a run), so the backfill scheduler
    gets one work item per contiguous hole instead of one per day.

    Scale shape: the events scan collapses to DISTINCT (type, bucket,
    day) cells — bounded by types × buckets × days, NOT by rows — and
    everything after (span, spine, anti-join, islands) lives on that
    bounded cell domain.  The spine is generated per combo from one
    broadcast global-span row (sequence(), no physical calendar), the
    anti-join is a cell-domain hash join, and the island window
    partitions by (type, bucket) over ≤|days| rows each.  At 100 TB
    nothing but the first partial-agg distinct touches fact rows.
    """
    e = load_table(spark, sf_dir, "events")
    obs = (
        e.select(
            "event_type",
            F.pmod(F.col("user_id"), F.lit(8)).cast("bigint").alias("bucket"),
            F.to_date("ts").alias("d"),
        )
        .distinct()
    )
    span = obs.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    combos = obs.select("event_type", "bucket").distinct()
    spine = (
        combos.crossJoin(F.broadcast(span))
        .select(
            "event_type",
            "bucket",
            F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("d"),
        )
    )
    missing = spine.join(obs, ["event_type", "bucket", "d"], "left_anti")
    islands = missing.withColumn(
        "grp", F.expr("date_sub(d, CAST(row_number() OVER (" 
        "PARTITION BY event_type, bucket ORDER BY d) AS INT))")
    )
    return islands.groupBy("event_type", "bucket", "grp").agg(
        F.min("d").alias("backfill_start"),
        F.max("d").alias("backfill_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    ).drop("grp")


@op(
    "etl_late_arriving_dim",
    oracle="""
    WITH facts AS (
        SELECT user_id + {shift} AS key, ts, value FROM events
    ), orphans AS (
        SELECT f.key
        FROM (SELECT DISTINCT key FROM facts) f
        LEFT JOIN customer c ON c.c_custkey = f.key
        WHERE c.c_custkey IS NULL
    )
    SELECT f.key AS user_id,
           min(CAST(f.ts AS DATE)) AS first_seen_day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(f.value * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM facts f JOIN orphans o ON o.key = f.key
    GROUP BY f.key
    """.format(shift=_KEY_SHIFT),
)
def etl_late_arriving_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving-dimension worklist (the "inferred member" pattern
    of dimensional warehousing): fact rows referencing users the
    customer dim does not know yet.  Where etl_orphan_fk_audit GATES
    (counts + one repro key per edge), this op builds the actionable
    MERGE payload — one row per unknown user with everything the dim
    load needs to land a placeholder member: first-seen day (becomes
    the SCD2 effective date), activity volume, and exact cents at
    stake.  Fact keys take etl_upsert's _KEY_SHIFT so the worklist is
    non-empty at every fixture scale (the raw user domain is a strict
    subset of the customer keys; the shifted domain straddles the top
    of the dim's key range — same straddling trick, same constant).

    Scale shape: distinct fact keys → broadcast-able anti-join against
    the dim (dims are small by definition; the anti join is map-side),
    then one semi-join-shaped aggregate over only the orphan rows —
    the orphan set is a sliver, so the second pass's shuffle is tiny.
    At 100 TB the worklist feeds etl_upsert's MERGE as the inferred-
    member insert branch."""
    e = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") + F.lit(_KEY_SHIFT)).alias("user_id"), "ts", "value"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    orphan_keys = (
        e.select("user_id")
        .distinct()
        .join(F.broadcast(c), F.col("user_id") == F.col("c_custkey"), "left_anti")
    )
    orphan_rows = e.join(F.broadcast(orphan_keys), "user_id", "left_semi")
    return orphan_rows.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_seen_day"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)"))
        .cast("bigint")
        .alias("total_cents"),
    )
