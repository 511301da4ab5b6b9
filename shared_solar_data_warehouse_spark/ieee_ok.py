"""IEEE-double output register — the graded-surface float discipline.

VERDICT r4 items 1/2/5: the two round-4 driver hash failures
(``ts_changepoint``, ``agg_log2_histogram``) were both DOUBLE output
columns reconstructed through ``pow``/late division — values the local
mirror compared equal but the driver's hash canonicalization split.
The repo-level rule is now: **no graded output column may be an IEEE
double unless it is registered here with a category documenting why
both engines (Spark/JVM and DuckDB) produce the identical bit
pattern.**  ``tests/test_oracle_types.py`` enforces the register in
both directions (every double-emitting op has an entry; no stale
entries for ops that no longer emit doubles).

Categories (weakest discipline last):

* ``source-passthrough`` — the column is a fixture double carried
  through unchanged, or a min/max/first/last/nth pick of one: the
  output bits ARE input bits on both engines.
* ``exact-int-ratio`` — derived from exact BIGINT-quantized integers
  by a short chain of correctly-rounded IEEE ops (cast, +, -, *, /):
  IEEE 754 requires these to be correctly rounded, so JVM and DuckDB
  agree bit-for-bit by spec.
* ``quantized-grid`` — the value is snapped to a decimal grid
  (``floor(x*10^n + 0.5)/10^n`` or ``round(x, n)``) before emission;
  deterministic given deterministic input, and the grid collapses
  sub-ulp noise from upstream arithmetic.
* ``ieee-elementary`` — unquantized but composed only of
  correctly-rounded elementary ops over deterministic, order-stable
  inputs (e.g. a window running sum whose fold order is pinned by the
  window ORDER BY on both engines).
* ``libm-quantized`` — a transcendental (``ln``/``log``/``exp``/
  ``pow``) feeds the value but the output is grid-quantized; residual
  risk is a near-tie at a rounding boundary if the two libms differ
  by 1 ulp.  These are the ops to watch in driver samples; new ops
  should prefer integer outputs (see ts_changepoint's r5 rewrite).

An op may NOT add a raw transcendental double output: either quantize
to the grid (``libm-quantized``) or — better — emit exact integers.

Round-6/7 note: ``parity.sql_ln_*`` / ``sql_exp_*`` / ``sql_powi``
provide DETERMINISTIC transcendentals built from correctly-rounded
IEEE ops only (bit-equal across Spark/DuckDB/Python —
tests/test_ieee_ln.py).  Round 6 converted four ops onto them
(text_tfidf, text_keywords, agg_welch_ttest, ts_npv_cashflows — exact
integer outputs); round 7 retired the LAST seven ``libm-quantized``
entries (agg_cat_entropy, agg_mutual_info, text_bigram_perplexity,
text_char_entropy, text_cooccurrence_pmi, text_unigram_perplexity,
ts_survival_km — staged ln/exp ladders + floor-based 1e-6 grid snaps,
now ``quantized-grid``).  **The category is empty**: no graded output
anywhere in the registry depends on a libm call, in either engine.
The category definition stays below so the oracle-types test keeps
rejecting any future op that tries to reintroduce one.
"""

from __future__ import annotations

#: op name -> (category, comma-joined double output columns)
IEEE_OK: dict[str, tuple[str, str]] = {
    'agg_arg_extrema': ('source-passthrough', 'first_price'),
    'agg_cat_entropy': ('quantized-grid', 'type_entropy_bits'),
    'agg_chi_square': ('quantized-grid', 'chi_square_q4'),
    'agg_corr_exact': ('quantized-grid', 'corr_qty_price'),
    'agg_cube': ('quantized-grid', 'total'),
    'agg_decimal_exact': ('ieee-elementary', 'sum_price_exact,sum_qty_exact'),
    'agg_filtered': ('quantized-grid', 'filled_total'),
    'agg_first_last': ('source-passthrough', 'first_order_price,last_order_price'),
    'agg_global': ('quantized-grid', 'sum_qty,avg_price,min_qty,max_qty'),
    'agg_groupby': ('quantized-grid', 'sum_qty,sum_base_price,sum_disc_price,sum_charge,avg_qty,avg_disc'),
    'agg_grouping_sets': ('quantized-grid', 'total_bal'),
    'agg_having': ('quantized-grid', 'total_qty'),
    'agg_histogram': ('quantized-grid', 'bin_lo,bin_value_sum'),
    'agg_linreg': ('quantized-grid', 'slope,intercept'),
    'agg_mutual_info': ('quantized-grid', 'mi_bits,h_type_partial_bits'),
    'agg_percentile': ('quantized-grid', 'p25,p50,p75,med'),
    'agg_rollup': ('quantized-grid', 'sum_qty'),
    'agg_skew_kurt': ('quantized-grid', 'qty_skewness,qty_excess_kurtosis'),
    'agg_stats': ('quantized-grid', 'sd_qty,var_qty,sdp_disc,varp_disc,corr_qty_price,covar_qty_price'),
    'agg_weighted_avg': ('ieee-elementary', 'wavg_price'),
    'agg_winsorized_mean': ('ieee-elementary', 'winsor_mean'),
    'dedup_by_key': ('source-passthrough', 'o_totalprice'),
    'dedup_containment': ('ieee-elementary', 'containment'),
    'dedup_near_embedding': ('quantized-grid', 'cosine'),
    'dedup_near_minhash': ('ieee-elementary', 'jaccard'),
    'dedup_near_shingle': ('ieee-elementary', 'jaccard'),
    'etl_cdc_diff': ('source-passthrough', 'old_bal,new_bal'),
    'etl_upsert': ('quantized-grid', 'acctbal'),
    'filter_pred': ('source-passthrough', 'p_retailprice'),
    'flagship_revenue_by_nation': ('quantized-grid', 'revenue'),
    'fn_array_hof': ('quantized-grid', 'self_dot,l1_norm'),
    'fn_null': ('source-passthrough', 'bal_nanvl'),
    'fn_struct': ('quantized-grid', 'bal_lo,bal_hi,bal_spread'),
    'fn_struct_shape': ('source-passthrough', 'balance'),
    'graph_assortativity': ('quantized-grid', 'assortativity_q4'),
    'graph_modularity': ('ieee-elementary', 'modularity'),
    'graph_pagerank': ('quantized-grid', 'pagerank'),
    'join_bucketed': ('ieee-elementary', 'avg_price'),
    'join_inner_eq': ('quantized-grid', 'price_delta'),
    'join_left_anti': ('source-passthrough', 'o_totalprice'),
    'join_left_outer': ('source-passthrough', 'l_quantity,l_extendedprice'),
    'join_left_semi': ('source-passthrough', 'o_totalprice'),
    'join_pit_features': ('source-passthrough', 'last_purchase_value'),
    'join_right_outer': ('source-passthrough', 'l_quantity,l_extendedprice'),
    'join_self': ('quantized-grid', 'price_step'),
    'join_shuffle_hash': ('source-passthrough', 'o_totalprice'),
    'join_skew_salted': ('quantized-grid', 'total_price'),
    'limit_n': ('quantized-grid', 'acctbal'),
    'offset_n': ('source-passthrough', 'o_totalprice'),
    'project_cast': ('source-passthrough', 'key_dbl'),
    'project_select': ('quantized-grid', 'net_price'),
    'project_unpivot': ('source-passthrough', 'val'),
    'row_sample': ('source-passthrough', 'o_totalprice'),
    'sample_reservoir': ('source-passthrough', 'o_totalprice'),
    'sample_weighted': ('source-passthrough', 'o_totalprice,priority'),
    'scan_json': ('source-passthrough', 'value'),
    'scan_orc': ('source-passthrough', 'c_acctbal'),
    'scan_parquet_pruned': ('source-passthrough', 'l_quantity,l_extendedprice'),
    'scan_parquet_schema_evolution': ('source-passthrough', 'c_acctbal'),
    'scan_partition_pruned': ('quantized-grid', 'price'),
    'scan_partition_pruned_dynamic': ('quantized-grid', 'revenue'),
    'set_union_by_name': ('source-passthrough', 'balance'),
    'sim_ann_ivf': ('quantized-grid', 'cosine'),
    'sim_ann_lsh': ('quantized-grid', 'cosine'),
    'sim_knn_bruteforce': ('quantized-grid', 'cosine'),
    'sim_pairwise_cosine': ('quantized-grid', 'cosine'),
    'sim_silhouette': ('ieee-elementary', 'mean_silhouette'),
    'sink_csv': ('quantized-grid', 'total_price'),
    'sort_multi': ('source-passthrough', 'c_acctbal'),
    'sort_within_partitions': ('source-passthrough', 'o_totalprice'),
    'sql_lateral_topk': ('source-passthrough', 'c_acctbal'),
    'sql_tpch_q1': ('quantized-grid', 'sum_qty,sum_base_price,sum_disc_price,sum_charge'),
    'sql_tpch_q10': ('quantized-grid', 'revenue,c_acctbal'),
    'sql_tpch_q11': ('source-passthrough', 'value'),
    'sql_tpch_q14': ('quantized-grid', 'promo_revenue_pct'),
    'sql_tpch_q15': ('quantized-grid', 'total_revenue'),
    'sql_tpch_q17': ('quantized-grid', 'avg_yearly'),
    'sql_tpch_q18': ('quantized-grid', 'o_totalprice,sum_qty'),
    'sql_tpch_q19': ('quantized-grid', 'revenue'),
    'sql_tpch_q2': ('source-passthrough', 's_acctbal'),
    'sql_tpch_q22': ('quantized-grid', 'totacctbal'),
    'sql_tpch_q3': ('quantized-grid', 'revenue'),
    'sql_tpch_q5': ('quantized-grid', 'revenue'),
    'sql_tpch_q6': ('quantized-grid', 'revenue'),
    'sql_tpch_q7': ('quantized-grid', 'revenue'),
    'sql_tpch_q8': ('quantized-grid', 'mkt_share'),
    'sql_tpch_q9': ('quantized-grid', 'sum_profit'),
    'text_bigram_perplexity': ('quantized-grid', 'xent2_bits'),
    'text_char_entropy': ('quantized-grid', 'entropy_bits'),
    'text_cooccurrence_pmi': ('quantized-grid', 'pmi'),
    'text_lang_stats': ('ieee-elementary', 'avg_chars'),
    'text_quality_filter': ('quantized-grid', 'dup_ratio'),
    'text_readability': ('ieee-elementary', 'flesch'),
    'text_repetition': ('ieee-elementary', 'dup_bigram_frac'),
    'text_unigram_perplexity': ('quantized-grid', 'xent_bits'),
    'topk_global': ('source-passthrough', 'o_totalprice'),
    'topk_per_group': ('source-passthrough', 'c_acctbal'),
    'ts_acf_profile': ('quantized-grid', 'acf_q4'),
    'ts_anomaly_zscore': ('quantized-grid', 'value,zscore'),
    'ts_bucket_agg': ('quantized-grid', 'total_value'),
    'ts_counter_reset': ('ieee-elementary', 'cum_consumed'),
    'ts_daily_acf': ('quantized-grid', 'acf1_q4'),
    'ts_credit_reconciliation': ('quantized-grid', 'min_balance'),
    'ts_delta': ('quantized-grid', 'value_delta'),
    'ts_ewma': ('ieee-elementary', 'ewma_level'),
    'ts_gap_fill': ('quantized-grid', 'hour_value,carried_value'),
    'ts_interp_linear': ('quantized-grid', 'value_interp'),
    'ts_load_profile': ('ieee-elementary', 'avg_value'),
    'ts_mom_growth': ('quantized-grid', 'revenue,mom_growth'),
    'ts_ohlc': ('quantized-grid', 'open,high,low,close,volume'),
    'ts_peak': ('source-passthrough', 'peak_value'),
    'ts_resample': ('source-passthrough', 'open_value,high_value,low_value,close_value'),
    'ts_rollup_two_level': ('quantized-grid', 'day_value'),
    'ts_running_balance': ('ieee-elementary', 'balance'),
    'ts_sessionize': ('quantized-grid', 'session_value'),
    'ts_sliding_correlation': ('quantized-grid', 'corr_7d'),
    'ts_survival_km': ('quantized-grid', 'km_survival'),
    'ts_tariff_billing': ('quantized-grid', 'billed_amount'),
    'ts_topk_users': ('quantized-grid', 'total_value'),
    'udf_apply_in_pandas': ('quantized-grid', 'znorm'),
    'udf_map_in_pandas': ('quantized-grid', 'usd'),
    'udf_pandas_grouped_agg': ('quantized-grid', 'mean_value,value_span'),
    'udf_pandas_scalar': ('quantized-grid', 'value_capped_usd'),
    'win_bollinger_band': ('quantized-grid', 'mid,sigma'),
    'win_first_last_nth': ('source-passthrough', 'first_price,last_price,third_price'),
    'win_lag_lead': ('quantized-grid', 'value,delta_prev,delta_next'),
    'win_moving_median': ('source-passthrough', 'l_quantity,qty_moving_median'),
    'win_ntile': ('source-passthrough', 'c_acctbal'),
    'win_range_frame': ('ieee-elementary', 'trailing_30d_total'),
    'win_rank_dense': ('quantized-grid', 'c_acctbal,bal_pct_rank,bal_cume_dist'),
    'win_row_number': ('source-passthrough', 'o_totalprice'),
    'win_zscore': ('quantized-grid', 'zscore_q4'),
    'win_running': ('ieee-elementary', 'running_total'),
    'win_sliding_rows': ('quantized-grid', 'smoothed'),
}

CATEGORIES = {
    "source-passthrough",
    "exact-int-ratio",
    "quantized-grid",
    "ieee-elementary",
    "libm-quantized",
}
