"""Tier-2: physical-plan assertions (SURVEY.md §5.3.2/§4) — the
100 TB-readiness checks.  A query can be value-correct and still be the
wrong plan; these pin the plan properties that matter at scale:
pushdown, pruning, broadcast vs shuffle, top-k physical operator,
whole-stage codegen presence.
"""

from __future__ import annotations

from shared_solar_data_warehouse_spark.plans import explain_formatted

from tests.conftest import SF_ORACLE, SF_SMALL


def plan_of(registry, spark, name: str) -> str:
    return explain_formatted(registry[name].builder(spark, SF_ORACLE))


def test_filter_pushdown_reaches_parquet(spark, registry):
    plan = plan_of(registry, spark, "scan_parquet_pruned")
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_quantity)" in plan or "GreaterThan(l_quantity,45" in plan


def test_column_pruning_reads_subset(spark, registry):
    plan = plan_of(registry, spark, "scan_parquet_pruned")
    # ReadSchema must contain only the needed columns, not all 11.
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema
    assert "l_shipdate" not in read_schema
    assert "l_tax" not in read_schema


def test_broadcast_join_for_dims(spark, registry):
    plan = plan_of(registry, spark, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_flagship_broadcasts_small_dims(spark, registry):
    plan = plan_of(registry, spark, "flagship_revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan


def test_shuffle_hash_hint_honored(spark, registry):
    plan = plan_of(registry, spark, "join_shuffle_hash")
    assert "ShuffledHashJoin" in plan


def test_topk_uses_take_ordered(spark, registry):
    plan = plan_of(registry, spark, "topk_global")
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_operators(spark, registry):
    assert "LeftSemi" in plan_of(registry, spark, "join_left_semi")
    assert "LeftAnti" in plan_of(registry, spark, "join_left_anti")


def test_partial_aggregation_before_shuffle(spark, registry):
    plan = plan_of(registry, spark, "agg_groupby")
    # Two HashAggregate nodes (partial + final) around one Exchange.
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_whole_stage_codegen_active(spark, registry):
    # formatted explain marks fused operators with [codegen id : N].
    # Use an exchange-free scalar family: under AQE a plan with an
    # Exchange prints its pre-finalization form, which omits the
    # codegen ids even though the executed stages are fused.
    plan = plan_of(registry, spark, "fn_string")
    assert "codegen id :" in plan


def test_range_join_broadcasts_tiny_side(spark, registry):
    plan = plan_of(registry, spark, "join_range")
    assert "BroadcastNestedLoopJoin" in plan


def test_aqe_enabled(spark, registry):
    plan = plan_of(registry, spark, "flagship_revenue_by_nation")
    assert "AdaptiveSparkPlan" in plan


def test_sessionize_single_exchange_for_both_windows(spark, registry):
    """lag + running-sum windows share one (user_id) partitioning —
    a second Exchange would mean the sort/partition wasn't reused."""
    plan = plan_of(registry, spark, "ts_sessionize")
    body = plan.split("== Initial Plan ==")[0]
    n_exchanges = body.count("+- Exchange") + body.count(":- Exchange")
    assert n_exchanges <= 2, f"sessionize plan has {n_exchanges} exchanges"
    assert body.count("Window") >= 2


def test_salted_join_shuffles_on_composite_key(spark, registry):
    plan = plan_of(registry, spark, "join_skew_salted")
    # The join must NOT broadcast (that would defeat the demo) and must
    # key the exchange on both the natural key and the salt.
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "salt" in plan


def test_two_level_rollup_reuses_partitioning(spark, registry):
    """Daily rollup groups a prefix-compatible key (user_id, day) after
    the hourly (user_id, hour) aggregate; Spark still exchanges for the
    second agg, but the raw fact must be read ONCE (single scan)."""
    plan = plan_of(registry, spark, "ts_rollup_two_level")
    # one scan node -> exactly one file-index location detail
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_knn_broadcasts_queries_not_corpus(spark, registry):
    plan = plan_of(registry, spark, "sim_knn_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_partition_pruning_on_partitioned_layout(spark, registry):
    """The ship_year predicate must appear as PartitionFilters on the
    scan (directory-level pruning), with the quantity predicate pushed
    separately into the surviving files."""
    plan = plan_of(registry, spark, "scan_partition_pruned")
    assert "PartitionFilters:" in plan
    assert "ship_year" in plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,48" in plan


def test_bucketed_join_has_no_exchange(spark, registry):
    """Co-located bucketed join: neither side may shuffle; the only
    Exchange allowed is the final aggregation's."""
    plan = plan_of(registry, spark, "join_bucketed")
    join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else ""
    assert "SortMergeJoin" in plan
    # No Exchange below the join: the join inputs are Scans+Sorts only.
    tree = plan.split("== Initial Plan ==")[0]
    join_line = next(
        i for i, l in enumerate(tree.splitlines()) if "SortMergeJoin" in l
    )
    below = "\n".join(tree.splitlines()[join_line:])
    assert "Exchange hashpartitioning" not in below


def test_q4_exists_decorrelates_to_semi_join(spark, registry):
    """EXISTS must plan as a semi join (one probe, no row duplication),
    never as an inner join + dedup."""
    plan = plan_of(registry, spark, "sql_tpch_q4")
    assert "LeftSemi" in plan


def test_q14_broadcasts_part_dimension(spark, registry):
    """part (4k rows at sf0.1) is far under the broadcast threshold —
    the lineitem⋈part join must be broadcast-hash, not sort-merge."""
    plan = plan_of(registry, spark, "sql_tpch_q14")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_posexplode_is_generate_no_exchange(spark, registry):
    """Row-local lateral fan-out: a Generate node and no shuffle."""
    plan = plan_of(registry, spark, "project_posexplode")
    assert "Generate" in plan
    assert "Exchange" not in plan


def test_q17_scalar_subquery_decorrelates(spark, registry):
    """The correlated avg-per-part subquery must decorrelate into a
    grouped aggregate joined back to the outer query — a per-row
    subquery re-execution would show a Subquery node and be quadratic."""
    plan = plan_of(registry, spark, "sql_tpch_q17")
    assert "Subquery" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_pagerank_rounds_broadcast_node_sides(spark, registry):
    """Every per-round join in the unrolled PageRank must broadcast the
    node-cardinality side (deg/ranks); the only shuffles should be the
    aggregations, not SortMergeJoins over the edge list.  Since r11 the
    deg-joined edge table and rounds 1..K-1 are materialized
    localCheckpoints (guide §2.4 — each round's aggregate runs exactly
    once), so the visible plan is the FINAL round only: its ranks side
    must still broadcast against the materialized edge RDD."""
    plan = plan_of(registry, spark, "graph_pagerank")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 1  # final round's ranks join
    assert "ExistingRDD" in plan  # materialized edge table + prior round


def test_pagerank_copartitioned_regime_matches_broadcast(
    spark, registry, monkeypatch
):
    """r6: past BROADCAST_MAX_NODES the rounds pin ONE edge exchange
    (repartition on src + localCheckpoint) and shuffle only the ranks.
    Force the gate shut and assert (a) value parity with the broadcast
    regime and (b) the pinned layout is visible in the plan (the
    checkpointed scan replaces the per-round edge subtree)."""
    from shared_solar_data_warehouse_spark.operators import graph

    base = registry["graph_pagerank"].builder(spark, SF_SMALL).collect()
    monkeypatch.setattr(graph, "BROADCAST_MAX_NODES", 0)
    cop = registry["graph_pagerank"].builder(spark, SF_SMALL).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, cop))
    plan = explain_formatted(registry["graph_pagerank"].builder(spark, SF_SMALL))
    assert "BroadcastHashJoin" not in plan
    # all three rounds read the one materialized edge layout
    assert "Scan ExistingRDD" in plan


def test_q2_scalar_subquery_decorrelates(spark, registry):
    """q2's per-part min-acctbal subquery must become an aggregate
    joined back on p_partkey, computed once — not re-run per outer row."""
    plan = plan_of(registry, spark, "sql_tpch_q2")
    assert "Subquery" not in plan
    assert plan.count("HashAggregate") >= 2


def test_asof_nearest_single_partition_exchange(spark, registry):
    """Both directional candidates must come from window passes over
    the SAME user_id hash partitioning — one exchange, re-sorted per
    frame, never a range join or candidate-pair blowup."""
    plan = plan_of(registry, spark, "join_asof_nearest")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    ex = plan.count("Exchange")
    assert ex <= 3, f"expected <=3 exchanges (union + window hash), saw {ex}"


def test_upsert_changes_side_broadcasts(spark, registry):
    """The merge's changes side is an aggregate of the (tiny) event log;
    the full-outer join itself must not move the base via more than the
    unavoidable exchanges."""
    plan = plan_of(registry, spark, "etl_upsert")
    assert "FullOuter" in plan or "full_outer" in plan.lower()


def test_connected_components_broadcasts_labels(spark, registry):
    """Each propagation round joins the big edge relation to the
    node-sized label table — must broadcast, never sort-merge.  Rounds
    before the last end in a lazy localCheckpoint barrier (kills the
    2^K label-chain recompute), which truncates the visible plan, so
    only the final round's join shape is assertable here."""
    plan = plan_of(registry, spark, "graph_connected_components")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 1


def test_streak_islands_stay_partition_local(spark, registry):
    """Gaps-and-islands is window + two aggregates over user-keyed
    hash partitionings — no join of any kind should appear."""
    plan = plan_of(registry, spark, "ts_streak")
    assert "Join" not in plan
    assert plan.count("Exchange") <= 4


def test_tariff_billing_broadcasts_dim(spark, registry):
    plan = plan_of(registry, spark, "ts_tariff_billing")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_jaccard_degree_joins_broadcast(spark, registry):
    plan = plan_of(registry, spark, "graph_jaccard_neighbors")
    # degree table (suppliers << edges) must broadcast into the pair join
    assert "BroadcastHashJoin" in plan


def test_stratified_sample_is_narrow(spark, registry):
    # pure projection+filter: no shuffle anywhere in the plan
    plan = plan_of(registry, spark, "sample_stratified")
    assert "Exchange" not in plan
    assert "codegen id" in plan


def test_range_bucketed_join_is_hash_not_nl(spark, registry):
    # the bucketing rewrite must make this an equi hash/merge join,
    # never a nested-loop interval join
    plan = plan_of(registry, spark, "join_range_bucketed")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_centroids_partial_agg_before_exchange(spark, registry):
    # posexplode blowup must collapse map-side: partial HashAggregate
    # below the exchange, final above
    plan = plan_of(registry, spark, "sim_label_centroids")
    assert "Generate" in plan
    assert plan.count("HashAggregate") >= 2


def test_triangle_count_distributed_branch_when_nodes_exceed_gate(
    spark, registry, monkeypatch
):
    """VERDICT r01 item 6: the driver bitmap is n^2/8 bytes, so the
    dense regime must gate on NODE count, not just edges.  Force the
    gate shut and assert the distributed wedge-free path produces the
    identical census."""
    from shared_solar_data_warehouse_spark.operators import graph

    dense = registry["graph_triangle_count"].builder(spark, SF_ORACLE).collect()
    monkeypatch.setattr(graph, "DENSE_MAX_NODES", 0)
    dist = registry["graph_triangle_count"].builder(spark, SF_ORACLE).collect()
    assert [tuple(r) for r in dense] == [tuple(r) for r in dist]
    plan = explain_formatted(
        registry["graph_triangle_count"].builder(spark, SF_ORACLE)
    )
    assert "array_intersect" in plan  # distributed per-edge intersection


def test_cumulative_share_two_pass_regime(spark, registry, monkeypatch):
    """VERDICT r03 item 5: force the customer-count gate shut and
    assert the two-pass range-partitioned rank (local rank + broadcast
    per-partition offsets) emits values identical to the single-window
    regime, and that its plan carries no single-partition shuffle fed
    by a raw scan."""
    from shared_solar_data_warehouse_spark.operators import windows
    from shared_solar_data_warehouse_spark.plans.inspect import (
        raw_single_partition_exchanges,
        simple_plan,
    )

    single = registry["win_cumulative_share"].builder(spark, SF_ORACLE)
    single_rows = sorted(tuple(r) for r in single.collect())
    monkeypatch.setattr(windows, "RANK_SINGLE_TASK_MAX", -1)
    dist = registry["win_cumulative_share"].builder(spark, SF_ORACLE)
    assert sorted(tuple(r) for r in dist.collect()) == single_rows
    assert not raw_single_partition_exchanges(simple_plan(dist))


def test_decontaminate_broadcasts_eval_side(spark, registry):
    """The eval split (~1%) must broadcast into the shingle join — the
    100 TB asymmetry: corpus side stays un-shuffled by the join."""
    plan = plan_of(registry, spark, "text_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_simhash_verify_fused_into_bucket_expression(spark, registry):
    """The hamming verify runs inside the per-bucket pair HOF, so the
    plan must contain NO join at all (the previous shape re-joined the
    packed signatures twice) and only the bucket groupBy + final
    distinct exchanges survive."""
    plan = plan_of(registry, spark, "dedup_simhash")
    assert "Join" not in plan


def test_ivf_assignment_is_row_local(spark, registry):
    """Cell assignment is a row-local argmax over the single broadcast
    centroid-array row — no per-centroid row blowup, hence no
    HashAggregate before the probe join and only broadcast joins
    anywhere (the probe join against the one-row centroid array and
    the cell join both broadcast; nothing sort-merges)."""
    plan = plan_of(registry, spark, "sim_ann_ivf")
    assert "SortMergeJoin" not in plan
    assert "array_max" in plan  # the fused argmax expression survived


def test_reservoir_sample_uses_take_ordered(spark, registry):
    # The whole point of the hash-order-statistics sample: partial
    # per-partition top-k heaps, never a global sort.
    plan = plan_of(registry, spark, "sample_reservoir")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_bloom_prefilter_probe_is_map_side(spark, registry):
    # The Bloom words broadcast to the probe; the probe side must see a
    # BroadcastNestedLoopJoin (1-row filter table) + Filter, and the
    # only shuffle feeds the final aggregate — lineitem itself is never
    # exchanged before the membership test.
    plan = plan_of(registry, spark, "join_bloom_prefilter")
    assert "BroadcastHashJoin" in plan  # exact verification semi join
    assert "LeftSemi" in plan


def test_bfs_rounds_are_materialized(spark, registry):
    # Each BFS round localCheckpoints (lineage truncation); the final
    # plan must therefore be a Union over materialized layers, not a
    # re-derivation of the whole frontier cascade.
    plan = plan_of(registry, spark, "graph_bfs_layers")
    assert "Union" in plan
    assert "ExistingRDD" in plan


def test_bitmap_distinct_combines_map_side_no_expand(spark, registry):
    # The bitmap partials must combine BEFORE the shuffle
    # (partial_bitmap_construct_agg on the map side), and the plan must
    # not contain the Expand fan-out of the exact count-distinct
    # rewrite this op exists to avoid.
    plan = plan_of(registry, spark, "agg_bitmap_distinct")
    assert "Expand" not in plan
    assert "partial_bitmap_construct_agg" in plan


def test_ramp_rate_single_exchange_for_window_and_agg(spark, registry):
    # Window on (user, day) and the following aggregate share a
    # partitioning: exactly one shuffle of the event rows.
    plan = plan_of(registry, spark, "ts_ramp_rate")
    assert plan.count("Exchange hashpartitioning") <= 2


def test_sort_within_partitions_no_global_sort(spark, registry):
    # The contract: partition-local sort only — a hash exchange for the
    # clustering, NO rangepartitioning exchange (that's the layout-job
    # plan; a global Sort would add an ordering nobody reads).
    plan = plan_of(registry, spark, "sort_within_partitions")
    assert "rangepartitioning" not in plan
    assert _n_exchanges(plan) == 1


def _n_exchanges(plan: str) -> int:
    import re

    # formatted explain: tree node "Exchange (k)" + detail "(k) Exchange";
    # count the detail headers (one per physical exchange, broadcasts
    # counted separately as "(k) BroadcastExchange").
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def test_sweep_line_single_scan_three_exchanges(spark, registry):
    # ts_max_concurrency: the explode-based endpoint fan-out keeps ONE
    # events subtree (no UNION ALL recompute), so the whole sweep is
    # session agg -> (day,t) merge -> (day) window+agg: <=3 exchanges,
    # one Scan parquet of events, no join at all.
    plan = plan_of(registry, spark, "ts_max_concurrency")
    assert _n_exchanges(plan) <= 3
    import re
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_load_duration_one_exchange(spark, registry):
    # row_number window and the following groupBy share the user_id
    # partitioning: one exchange total for the event rows.
    plan = plan_of(registry, spark, "ts_load_duration")
    assert _n_exchanges(plan) == 1


def test_random_projection_broadcasts_sign_table(spark, registry):
    # The 512-row derived sign matrix must broadcast; the only shuffle
    # carries (vec_id, proj_id) partials after map-side combine.
    plan = plan_of(registry, spark, "sim_random_projection")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_sum" in plan


def test_unigram_perplexity_broadcasts_vocab(spark, registry):
    # Corpus vocab + total are broadcast side-inputs; the per-doc agg
    # is the only shuffle of the tf table after the memoized artifact.
    plan = plan_of(registry, spark, "text_unigram_perplexity")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_zorder_key_is_single_partial_agg(spark, registry):
    # Bit interleave is codegen'd projection; one partial-agg groupBy.
    plan = plan_of(registry, spark, "etl_zorder_key")
    assert _n_exchanges(plan) == 1
    assert "partial_count" in plan  # map-side combine below the exchange


def test_drawdown_windows_share_one_exchange(spark, registry):
    # cumsum window, running-max window, and the final user agg all
    # partition on user_id: exactly one exchange.
    plan = plan_of(registry, spark, "win_drawdown")
    assert _n_exchanges(plan) == 1


def test_interval_overlap_is_equi_join_on_day(spark, registry):
    # The overlap predicate must ride as a residual on a hash/merge
    # join keyed on day — a BroadcastNestedLoopJoin over the session
    # pairs would be the quadratic plan this op exists to avoid.
    plan = plan_of(registry, spark, "join_interval_overlap")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_session_window_single_exchange(spark, registry):
    # Built-in session_window: one exchange on user_id, session merge
    # is partition-local.
    plan = plan_of(registry, spark, "ts_session_window")
    assert _n_exchanges(plan) <= 1


def test_fuzzy_blocked_join_is_hash_on_block_key(spark, registry):
    # Levenshtein runs as a residual AFTER an equi join on the block
    # key — never over the cross product.
    plan = plan_of(registry, spark, "dedup_fuzzy_blocked")
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan


def test_overlap_sweep_has_no_join(spark, registry):
    # The whole point of the sweep: same statistics as the pair join,
    # zero join nodes, single scan, <=3 exchanges.
    plan = plan_of(registry, spark, "ts_overlap_sweep")
    assert "Join" not in plan
    assert _n_exchanges(plan) <= 3


def test_dynamic_partition_pruning_fires(spark, registry):
    # The fact scan's PartitionFilters must carry a dynamicpruning
    # subquery fed by the filtered dim — runtime directory skipping,
    # not a post-join filter.
    plan = plan_of(registry, spark, "scan_partition_pruned_dynamic")
    assert "dynamicpruningexpression" in plan
    assert "PartitionFilters" in plan


def test_cusum_single_exchange(spark, registry):
    # prefix sum, running min, and the final agg all partition on
    # user_id — the linearized recursion costs exactly one exchange.
    plan = plan_of(registry, spark, "ts_cusum")
    assert _n_exchanges(plan) == 1


def test_role_playing_dim_reuses_broadcast(spark, registry):
    # The two nation roles must share ONE broadcast build: the executed
    # (post-AQE) plan carries a ReusedExchange for the second role.
    # (Reuse is applied at physical prep, so the pre-execution
    # formatted explain can't show it — inspect the executed plan.)
    df = registry["join_role_playing_dim"].builder(spark, SF_ORACLE)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("ReusedExchange") >= 1


def test_chunk_windows_zero_shuffle(spark, registry):
    # Chunking is a pure map over the corpus: explode + slice, no
    # Exchange anywhere in the plan (the zero-shuffle claim).
    plan = plan_of(registry, spark, "text_chunk_windows")
    assert "Exchange" not in plan
    assert "explode(sequence" in plan


def test_pit_features_single_window_single_exchange(spark, registry):
    # All three point-in-time features evaluate in ONE Window operator
    # over ONE user_id exchange — the n-features-for-one-shuffle claim.
    plan = plan_of(registry, spark, "join_pit_features")
    assert plan.count("+- Exchange") == 1
    assert "hashpartitioning(user_id" in plan
    assert plan.count("+- Window") == 1
    assert "Join" not in plan


def test_dataset_mixture_total_is_broadcast_not_smj(spark, registry):
    # The 1-row corpus total rejoins via broadcast; a SortMergeJoin
    # here would shuffle the 20-row domain table for nothing.
    plan = plan_of(registry, spark, "text_dataset_mixture")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_skew_audit_topk_physical_operator(spark, registry):
    # Top-10 heavy hitters must compile to per-partition k-heaps, not
    # a global sort.
    plan = plan_of(registry, spark, "etl_partition_skew_audit")
    assert "TakeOrderedAndProject" in plan


def test_pack_sequences_window_is_partitioned(spark, registry):
    # Packing prefix-sums within source partitions — exactly one hash
    # exchange (source window + (source, seq_id) agg share it via the
    # key-prefix rule), and no single-partition global window.
    plan = plan_of(registry, spark, "text_pack_sequences")
    assert "SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_moving_slope_single_exchange_shared_window(spark, registry):
    # Rank window + five moving sums share ONE user_id exchange; no
    # join, no single-partition window.
    plan = plan_of(registry, spark, "win_moving_slope")
    assert plan.count("+- Exchange") == 1
    assert "SinglePartition" not in plan
    assert "Join" not in plan


def test_yield_deviation_fleet_join_is_broadcast(spark, registry):
    # The calendar-bounded fleet table must broadcast back onto the
    # daily aggregate — a SortMergeJoin would reshuffle the fact-sized
    # side on day for nothing.
    plan = plan_of(registry, spark, "ts_yield_deviation")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_kmeans_broadcasts_centroids_no_smj(spark, registry):
    # The final assignment localCheckpoint truncates explain to the
    # tail (members ⋈ centroids), so pin the per-round shape on an
    # UNROLLED single round built the same way: the 1-row centroid
    # array must broadcast (BroadcastNestedLoopJoin), never SMJ.
    from pyspark.sql import functions as F

    from shared_solar_data_warehouse_spark.operators.similarity import (
        sim_kmeans_lloyd,
    )

    tail = plan_of(registry, spark, "sim_kmeans_lloyd")
    assert "SortMergeJoin" not in tail

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    vq = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 10000 + F.lit(0.5)).cast(
                "bigint"
            ),
        ).alias("v"),
    )
    cents_row = vq.limit(8).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("vec_id").alias("k"), F.col("v").alias("c")))
        ).alias("cents")
    )
    one_round = vq.crossJoin(F.broadcast(cents_row)).select(
        "vec_id",
        F.expr(
            "array_min(transform(cents, cn -> struct(aggregate("
            "zip_with(v, cn.c, (a, b) -> (a - b) * (a - b)), 0L,"
            " (s, x) -> s + x) AS d, cn.k AS k))).k"
        ).alias("k"),
    )
    plan = explain_formatted(one_round)
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_mann_whitney_window_input_is_preaggregated(spark, registry):
    # The running-rank window must see the quantized value DOMAIN,
    # never raw rows — the agg_ks_test scale shape: exactly two
    # exchanges (the vq groupBy, then the bounded-domain window's
    # gather), and ranks need no join.  The registry-wide hygiene
    # sweep separately proves the single-partition exchange's child
    # is the aggregate, not a raw scan.
    plan = plan_of(registry, spark, "agg_mann_whitney")
    assert "Join" not in plan
    assert _n_exchanges(plan) == 2


def test_trimmed_mean_windows_and_agg_share_one_exchange(spark, registry):
    # rank window, partition totals, and the final event_type groupBy
    # all key on event_type — exactly one hash exchange, no global
    # sort, no join.
    plan = plan_of(registry, spark, "agg_trimmed_mean")
    assert _n_exchanges(plan) == 1
    assert "SinglePartition" not in plan
    assert "Join" not in plan


def test_interarrival_lag_and_agg_share_user_exchange(spark, registry):
    plan = plan_of(registry, spark, "ts_interarrival_stats")
    assert _n_exchanges(plan) == 1
    assert "SinglePartition" not in plan
    assert "Join" not in plan


def test_bpe_pair_freq_zero_join_one_exchange(spark, registry):
    # The adjacent-pair fan-out is a pure map (transform/sequence
    # inside one projection); the only shuffle is the pair count's
    # partial->final exchange.
    plan = plan_of(registry, spark, "text_bpe_pair_freq")
    assert "Join" not in plan
    assert "Window" not in plan
    assert _n_exchanges(plan) == 1


def test_scalar_subquery_decorrelates_to_joins(spark, registry):
    # Catalyst must rewrite the correlated EXISTS into a semi join and
    # the SELECT-list scalar aggregates into joins — no per-row
    # re-execution artifact (no CartesianProduct; hygiene sweep also
    # pins this registry-wide).
    plan = plan_of(registry, spark, "sql_scalar_subquery")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_binomial_ci_single_partial_agg(spark, registry):
    plan = plan_of(registry, spark, "agg_binomial_ci")
    assert _n_exchanges(plan) == 1
    assert "Join" not in plan
    assert "Window" not in plan


def test_clock_phase_two_hash_aggs_no_window(spark, registry):
    # (user, phase) census then per-user packed argmax — two hash
    # aggregates, no window, no join, nothing single-partition.
    plan = plan_of(registry, spark, "ts_clock_phase_audit")
    assert _n_exchanges(plan) <= 2
    assert "Window" not in plan
    assert "Join" not in plan
    assert "SinglePartition" not in plan


def test_rare_token_flag_join_is_broadcast(spark, registry):
    # The rare-token set is vocab-bounded and must broadcast onto the
    # tf artifact — an SMJ would reshuffle the corpus-sized side.
    plan = plan_of(registry, spark, "text_rare_token_ratio")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_band_join_is_equi_on_user_bucket(spark, registry):
    # The band predicate must ride a hash-join on (user, bucket) with
    # the exact |diff| <= delta as residual — no CartesianProduct, no
    # BroadcastNestedLoop carrying the inequality.
    plan = plan_of(registry, spark, "join_band")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan or "Generate" in plan  # 3-bucket fan-out


def test_blob_dedup_single_digest_shuffle(spark, registry):
    plan = plan_of(registry, spark, "mm_blob_dedup")
    assert _n_exchanges(plan) == 1
    assert "Join" not in plan


def test_local_clustering_regimes_agree(spark, registry, monkeypatch):
    # Same split as triangle_count: dense driver popcount at fixture
    # scale, distributed neighborhood-intersection beyond the node
    # gate — force the gate shut and assert the per-node profiles are
    # identical, and that the distributed plan runs the wedge-free
    # array_intersect shape (no CartesianProduct).
    from shared_solar_data_warehouse_spark.operators import graph

    dense = sorted(
        tuple(r)
        for r in registry["graph_local_clustering"]
        .builder(spark, SF_ORACLE)
        .collect()
    )
    monkeypatch.setattr(graph, "DENSE_MAX_NODES", 0)
    dist_df = registry["graph_local_clustering"].builder(spark, SF_ORACLE)
    assert sorted(tuple(r) for r in dist_df.collect()) == dense
    plan = explain_formatted(dist_df)
    assert "array_intersect" in plan
    assert "CartesianProduct" not in plan


def test_rfm_score_maps_broadcast_back(spark, registry):
    # The three value->quintile maps are bounded-domain dimensions:
    # they must ride broadcast joins onto customers, never a
    # SortMergeJoin, and never a customer-cardinality window (windows
    # only run over the per-metric value domains).
    plan = plan_of(registry, spark, "agg_rfm_segmentation")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_silhouette_centroids_broadcast(spark, registry):
    # Centroids are labels x dim — broadcast onto the long-form dims;
    # the vector table must never self-join.
    plan = plan_of(registry, spark, "sim_silhouette")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_association_rules_item_dims_broadcast(spark, registry):
    plan = plan_of(registry, spark, "agg_association_rules")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pareto_frontier_window_input_is_preaggregated(spark, registry):
    # The running-max window must consume the per-price HashAggregate
    # output (distinct-price domain), never raw lineitem rows.
    plan = plan_of(registry, spark, "win_pareto_frontier")
    # formatted explain prints children BELOW parents: the aggregate
    # must be the Window's descendant (appear after it in the tree).
    assert "HashAggregate" in plan
    assert plan.index("Window") < plan.index("HashAggregate")


def test_sliding_correlation_single_day_aggregate_then_frame(spark, registry):
    # One shuffle into day cells; the 7-row frame runs over that
    # bounded aggregate.
    plan = plan_of(registry, spark, "ts_sliding_correlation")
    assert "HashAggregate" in plan
    assert plan.index("Window") < plan.index("HashAggregate")
    assert "CartesianProduct" not in plan


def test_penny_allocation_sums_exactly_to_pool(spark, registry):
    # The money invariant the op exists for: per order, allocated
    # rebate cents == the 7.5% pool, exactly.
    from pyspark.sql import functions as F

    df = registry["fn_penny_allocation"].builder(spark, SF_ORACLE)
    bad = (
        df.groupBy("l_orderkey")
        .agg(
            F.sum("rebate_cents").alias("alloc"),
            F.expr("CAST(sum(line_cents) * 75 DIV 1000 AS BIGINT)").alias("pool"),
        )
        .filter(F.col("alloc") != F.col("pool"))
        .count()
    )
    assert bad == 0


def test_modularity_in_valid_range_and_edge_count(spark, registry):
    # Q in [-0.5, 1) by definition; edge count matches the distinct
    # customer-supplier pair count.
    from pyspark.sql import functions as F

    from shared_solar_data_warehouse_spark.sources.io import load_table

    row = registry["graph_modularity"].builder(spark, SF_ORACLE).collect()[0]
    assert -0.5 <= row.modularity < 1.0
    o = load_table(spark, SF_ORACLE, "orders")
    li = load_table(spark, SF_ORACLE, "lineitem")
    n_pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .count()
    )
    assert row.n_edges == n_pairs


def test_stream_topk_matches_batch_topk(spark, registry):
    from pyspark.sql import functions as F

    from shared_solar_data_warehouse_spark.sources.io import load_table

    got = [
        (r.rank, r.event_id)
        for r in sorted(
            registry["stream_topk_snapshot"].builder(spark, SF_ORACLE).collect(),
            key=lambda r: r.rank,
        )
    ]
    want = [
        (i + 1, r.event_id)
        for i, r in enumerate(
            load_table(spark, SF_ORACLE, "events")
            .orderBy(F.col("value").desc(), F.col("event_id").desc())
            .limit(10)
            .collect()
        )
    ]
    assert got == want


def test_tfidf_broadcasts_vocab_idf_not_corpus(spark, registry):
    """r6: the deterministic-ln idf stages on the VOCAB-sized df table
    and broadcast-joins back to the corpus-scale tf artifact — the
    corpus side must never shuffle for the join, and the ladder CASE
    must appear in the plan exactly once per stage column (evaluated
    per vocab row), not per corpus row via a post-join projection."""
    plan = plan_of(registry, spark, "text_tfidf")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_npv_discount_dimension_broadcasts(spark, registry):
    """r6: the sql_powi discount table is DISTINCT day-offsets (day-
    bounded domain) joined back broadcast; the cashflow side must not
    shuffle for it."""
    plan = plan_of(registry, spark, "ts_npv_cashflows")
    assert "BroadcastHashJoin" in plan


def test_mm_decode_is_shuffle_free_arrow_map(spark, registry):
    """r6: the real BMP/WAV decode ops are pure per-partition Arrow
    map stages — any Exchange would mean the codec loop moved data."""
    for name in ("mm_decode_features", "mm_frame_sample", "mm_resize"):
        plan = explain_formatted(registry[name].builder(spark, SF_ORACLE))
        body = plan.split("== Initial Plan ==")[0]
        assert "Exchange" not in body, f"{name} shuffles: {body[:400]}"
        assert "MapInPandas" in body or "mapInPandas" in body.lower(), name


def test_q21_exists_pair_decorrelates_to_semi_and_anti(spark, registry):
    """q21's EXISTS + NOT EXISTS against the same fact must plan as one
    semi and one anti join on l_orderkey — never a re-executed per-row
    subquery or a cartesian check."""
    plan = plan_of(registry, spark, "sql_tpch_q21")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q20_nested_in_chain_decorrelates(spark, registry):
    """q20's nested IN chain (supplier <- lineitem <- part) must become
    semi joins; the two scalar aggregate subqueries are uncorrelated
    (computed once) so a Subquery node is fine, a CartesianProduct or
    row-dependent re-execution is not."""
    plan = plan_of(registry, spark, "sql_tpch_q20")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q8_star_joins_broadcast_all_dims(spark, registry):
    """q8's 8-table market-share star must broadcast every dim side —
    at 100 TB only lineitem/orders are fact-scale and nothing about
    this query should shuffle them for a join."""
    plan = plan_of(registry, spark, "sql_tpch_q8")
    assert plan.count("BroadcastHashJoin") >= 6
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
