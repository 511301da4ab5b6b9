"""Tier-5 (SURVEY.md §5.3.5): golden-file regression.

Small frozen outputs of deterministic representative ops at sf0.001,
committed as CSV under tests/golden/.  A cheap, DuckDB-free safety net:
any refactor that changes RESULTS (not just plans) trips it instantly.

Regenerate deliberately with:
    python -m tests.test_golden   (writes tests/golden/*.csv)
"""

from __future__ import annotations

import csv
import os
from typing import Any

from tests.conftest import SF_SMALL

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

#: Deterministic, small-output ops worth freezing (one per major family).
GOLDEN_OPS = (
    "flagship_revenue_by_nation",
    "agg_groupby",
    "win_rank_dense",
    "join_asof",
    "ts_sessionize",
    "ts_funnel",
    "dedup_near_shingle",
    "dedup_simhash",
    "sim_knn_bruteforce",
    "text_tfidf",
    "sql_tpch_q1",
    # round-3 flagships (one per new capability axis):
    "report_grid_health",
    "ts_cusum",
    "etl_zorder_key",
    "text_unigram_perplexity",
    "sql_recursive_cte",
    # round-4 flagships:
    "text_chunk_windows",
    "text_pack_sequences",
    "join_pit_features",
    "ts_yield_deviation",
    "etl_orphan_fk_audit",
    "sample_weighted",
    "etl_compaction_plan",
    "agg_ks_test",
    "win_cumulative_share",
    "fn_math",
    # round-4 second-half flagships:
    "agg_mann_whitney",
    "graph_local_clustering",
    "join_band",
    "agg_mutual_info",
    "ts_event_transitions",
    "mm_blob_dedup",
    # round-6 hardening flagships (real multimodal decode, the
    # integer-exact GEMM tier, the DECIMAL-leak fixes, the powi NPV):
    "mm_decode_features",
    "mm_frame_sample",
    "sim_knn_block_matmul",
    "ts_npv_cashflows",
    "win_zscore",
    # rows-only-by-design op that is still DETERMINISTIC per engine
    # (Spark-native xxhash64/murmur seeds): no DuckDB twin exists, but
    # a frozen golden pins cross-round regressions — the strongest
    # check available for this class.  (row_sample was tried and
    # rejected: sample(seed) is only deterministic per partition
    # LAYOUT, which the golden cannot pin.)
    "fn_hash_spark",
    # round-4 late-wave flagships:
    "ts_survival_km",
    "agg_rfm_segmentation",
    "sim_pca_power_iteration",
    "win_pareto_frontier",
    "agg_welch_ttest",
    "text_cooccurrence_pmi",
    "ts_changepoint",
    "stream_cdc_apply",
    # round-5 flagships (stateful fold, model eval, MIPS retrieval,
    # merged-stream attribution):
    "ts_battery_soc",
    "agg_ndcg_eval",
    "sim_mips_topk",
    "ts_attribution_last_touch",
    "etl_backfill_plan",
    # round-7 libm retirements (the staged deterministic ln/exp
    # conversions — agg_mutual_info / text_cooccurrence_pmi /
    # text_unigram_perplexity / ts_survival_km were already frozen
    # above; these complete the 7-op set):
    "agg_cat_entropy",
    "text_char_entropy",
    "text_bigram_perplexity",
    # round-9: the 16 ops making their driver debut in the r9 window
    # (report_grid_health, the 17th, was already frozen above) — the
    # ops with the thinnest historical evidence get a DuckDB-free local
    # pin before the driver samples them:
    "ts_coincidence_factor",
    "etl_gdpr_erasure",
    "join_asof_nearest",
    "ts_max_concurrency",
    "ts_tariff_billing",
    "ts_forecast_backtest",
    "ts_overlap_sweep",
    "ts_anomaly_mad",
    "text_langid_eval",
    "text_lang_id",
    "ts_theil_sen_slope",
    "join_role_playing_dim",
    "report_corpus_quality",
    "text_decontaminate",
    "etl_file_manifest",
    "sim_ann_recall_eval",
)


def _canon_cell(v: Any) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _canon_rows(df) -> list[list[str]]:
    cols = sorted(df.columns)
    rows = [[_canon_cell(r[c]) for c in cols] for r in df.collect()]
    return [cols] + sorted(rows)


def _golden_path(name: str) -> str:
    return os.path.join(GOLDEN_DIR, f"{name}.csv")


def _write_golden(name: str, rows: list[list[str]]) -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with open(_golden_path(name), "w", newline="") as fh:
        csv.writer(fh).writerows(rows)


def _read_golden(name: str) -> list[list[str]]:
    with open(_golden_path(name), newline="") as fh:
        return [list(row) for row in csv.reader(fh)]


def test_golden_outputs(spark, registry):
    missing = [n for n in GOLDEN_OPS if not os.path.exists(_golden_path(n))]
    assert not missing, f"golden files missing (run python -m tests.test_golden): {missing}"
    for name in GOLDEN_OPS:
        got = _canon_rows(registry[name].builder(spark, SF_SMALL))
        want = _read_golden(name)
        assert got == want, f"{name}: output drifted from frozen golden"


def main() -> None:
    from shared_solar_data_warehouse_spark.registry import load_all_ops
    from shared_solar_data_warehouse_spark.session import get_session

    registry = load_all_ops()
    spark = get_session("golden-regen")
    for name in GOLDEN_OPS:
        _write_golden(name, _canon_rows(registry[name].builder(spark, SF_SMALL)))
        print(f"wrote {_golden_path(name)}")


if __name__ == "__main__":
    main()
