"""Tier-3: property-based tests (SURVEY.md §5.3.3) — algebraic
invariants that hold for ANY data, checked with hypothesis-generated
inputs plus the fixtures.  Spark round-trips are expensive, so example
counts are small and deliberate; the properties, not the volume, carry
the value.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _events(spark):
    from shared_solar_data_warehouse_spark.sources.io import load_table

    return load_table(spark, SF_SMALL, "events")


def test_filter_composition_commutes(spark):
    li = __import__(
        "shared_solar_data_warehouse_spark.sources.io", fromlist=["load_table"]
    ).load_table(spark, SF_SMALL, "lineitem")
    a = li.filter(F.col("l_quantity") > 20).filter(F.col("l_discount") < 0.05)
    b = li.filter(F.col("l_discount") < 0.05).filter(F.col("l_quantity") > 20)
    assert a.count() == b.count()


def test_union_all_count_additive(spark):
    e = _events(spark)
    clicks = e.filter(F.col("event_type") == "click")
    views = e.filter(F.col("event_type") == "view")
    assert clicks.count() + views.count() == clicks.unionByName(views).count()


def test_inner_join_bounded_by_fk(spark):
    from shared_solar_data_warehouse_spark.sources.io import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    orders = load_table(spark, SF_SMALL, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    # l_orderkey ⊆ o_orderkey (FIXTURES.md) and o_orderkey unique:
    assert joined.count() == li.count()


def test_window_unbounded_sum_equals_group_sum(spark):
    from pyspark.sql import Window

    e = _events(spark)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    via_window = (
        e.select("user_id", F.sum(F.col("value").cast("decimal(25,8)")).over(w).alias("s"))
        .groupBy("user_id")
        .agg(F.max("s").alias("s"))
    )
    via_group = e.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(25,8)")).alias("s")
    )
    assert via_window.subtract(via_group).count() == 0


def test_sessionize_gap_invariants(spark, registry):
    """No intra-session gap exceeds the threshold; session starts are
    separated from the previous session's end by more than it."""
    sessions = registry["ts_sessionize"].builder(spark, SF_SMALL)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_seq")
    gaps = sessions.select(
        "user_id",
        "session_seq",
        (F.col("session_start_s") - F.lag("session_end_s").over(w)).alias(
            "inter_gap"
        ),
    ).filter(F.col("inter_gap").isNotNull())
    assert gaps.filter(F.col("inter_gap") <= 1800).count() == 0


def test_jaccard_bounds_and_symmetry(spark, registry):
    pairs = registry["dedup_near_shingle"].builder(spark, SF_SMALL)
    rows = pairs.collect()
    for r in rows:
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["doc_a"] < r["doc_b"]  # canonical orientation = symmetry


def test_knn_self_is_nearest(spark, registry):
    knn = registry["sim_knn_bruteforce"].builder(spark, SF_SMALL)
    rank1 = knn.filter(F.col("rank") == 1).collect()
    for r in rank1:
        assert r["neighbor_id"] == r["query_id"]
        assert abs(r["cosine"] - 1.0) < 1e-3  # unit vectors


@settings(max_examples=20, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=0.01, max_value=1000, allow_nan=False), min_size=1, max_size=50
    )
)
def test_decimal_sum_is_order_independent(vals):
    """The parity core: decimal-cast accumulation gives one answer for
    every summation order (the property raw double sums lack)."""
    from decimal import Decimal

    def dec_sum(xs):
        return sum(Decimal(x).quantize(Decimal("0.00000001")) for x in xs)

    assert dec_sum(vals) == dec_sum(list(reversed(vals)))
    assert dec_sum(vals) == dec_sum(sorted(vals))


@settings(max_examples=10, deadline=None)
@given(gap=st.integers(min_value=1, max_value=10_000))
def test_gap_threshold_monotonic(spark, registry, gap):
    """Raising the outage threshold can only reduce flagged gaps."""
    from shared_solar_data_warehouse_spark.sources.io import load_table
    from pyspark.sql import Window

    e = load_table(spark, SF_SMALL, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    es = F.unix_timestamp("ts")
    gaps = e.select((es - F.lag(es).over(w)).alias("g")).filter(
        F.col("g").isNotNull()
    )
    assert gaps.filter(F.col("g") > gap).count() >= gaps.filter(
        F.col("g") > gap * 2
    ).count()


def test_asof_join_is_backward_and_most_recent(spark, registry):
    """For each purchase, the joined click must be the same user's
    latest click at-or-before the purchase time (backward as-of)."""
    from shared_solar_data_warehouse_spark.sources.io import load_table

    rows = registry["join_asof"].builder(spark, SF_SMALL).collect()
    assert rows
    ev = {
        r["event_id"]: (r["user_id"], r["ts"], r["event_type"])
        for r in load_table(spark, SF_SMALL, "events").collect()
    }
    clicks_by_user = {}
    for eid, (uid, ts, et) in ev.items():
        if et == "click":
            clicks_by_user.setdefault(uid, []).append((ts, eid))
    matched = [r for r in rows if r["prior_click_id"] is not None]
    assert matched, "as-of join matched nothing at sf0.001"
    for r in matched[:300]:
        uid, p_ts, _ = ev[r["purchase_id"]]
        c_uid, c_ts, _ = ev[r["prior_click_id"]]
        assert c_uid == uid and c_ts <= p_ts
        # most-recent: no other click strictly between c_ts and p_ts
        assert not any(
            c_ts < t <= p_ts for t, _ in clicks_by_user.get(uid, ())
        )


def test_funnel_stage_times_are_ordered(spark, registry):
    """A funnel row only counts a later stage if it happened at or
    after the earlier stage's first occurrence."""
    rows = registry["ts_funnel"].builder(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        stages = [r[c] for c in ("t_signup", "t_click", "t_purchase")]
        present = [s for s in stages if s is not None]
        assert present == sorted(present)
        if r["reached_purchase"]:
            assert r["reached_click"], "funnel stages must be ordered"


def test_canonical_keeper_covers_all_docs_once(spark, registry):
    rows = registry["dedup_keep_canonical"].builder(spark, SF_SMALL).collect()
    docs = [r["doc_id"] for r in rows]
    assert len(docs) == len(set(docs))
    kept_by_cluster = {}
    for r in rows:
        kept_by_cluster.setdefault(r["cluster_id"], 0)
        kept_by_cluster[r["cluster_id"]] += bool(r["is_kept"])
    assert all(v == 1 for v in kept_by_cluster.values()), (
        "each cluster keeps exactly one canonical doc"
    )


def test_sketch_merge_bound_holds(spark, registry):
    rows = registry["agg_sketch_mergeable"].builder(spark, SF_SMALL).collect()
    assert rows and all(r["merged_within_5pct"] for r in rows)


def test_unpivot_row_count_multiplies(spark):
    """unpivot emits exactly rows x measure-columns rows, never dropping
    ids (nulls retained by default)."""
    from shared_solar_data_warehouse_spark.registry import REGISTRY

    from shared_solar_data_warehouse_spark.sources.io import load_table

    n_parts = load_table(spark, SF_SMALL, "part").count()
    long = REGISTRY["project_unpivot"].builder(spark, SF_SMALL)
    assert long.count() == 2 * n_parts
    assert set(r[0] for r in long.select("metric").distinct().collect()) == {
        "p_size",
        "p_retailprice",
    }


def test_pii_scrub_idempotent(spark):
    """Scrubbing already-scrubbed text changes nothing (placeholders
    contain no scrubbable patterns) — the defining property of a
    redaction pass."""
    from shared_solar_data_warehouse_spark.operators.text import (
        _PII_DENY,
        _PII_EMAIL,
        _PII_NUM,
    )
    from shared_solar_data_warehouse_spark.registry import REGISTRY

    once = REGISTRY["text_pii_scrub"].builder(spark, SF_SMALL)
    twice = once.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("scrubbed", _PII_EMAIL, "<EMAIL>"),
                _PII_NUM,
                "<NUM>",
            ),
            _PII_DENY,
            "<TERM>",
        ).alias("rescrubbed"),
        "scrubbed",
    )
    assert twice.filter(F.col("rescrubbed") != F.col("scrubbed")).count() == 0


def test_arg_extrema_match_window_formulation(spark):
    """max_by(x, k) must equal the row_number()-over-(order by k desc)
    formulation — two plans, one semantics."""
    from shared_solar_data_warehouse_spark.registry import REGISTRY
    from shared_solar_data_warehouse_spark.sources.io import load_table
    from pyspark.sql import Window

    agg = (
        REGISTRY["agg_arg_extrema"].builder(spark, SF_SMALL)
        .select("o_orderstatus", "latest_priority")
    )
    o = load_table(spark, SF_SMALL, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_orderkey").desc())
    via_window = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("latest_priority"))
    )
    assert agg.exceptAll(via_window).count() == 0
    assert via_window.exceptAll(agg).count() == 0


def test_asof_forward_is_earliest_future(spark, registry):
    """For each click, the joined purchase must be the same user's
    EARLIEST purchase at-or-after the click time (forward as-of)."""
    from shared_solar_data_warehouse_spark.sources.io import load_table

    rows = registry["join_asof_forward"].builder(spark, SF_SMALL).collect()
    assert rows
    ev = {
        r["event_id"]: (r["user_id"], r["ts"], r["event_type"])
        for r in load_table(spark, SF_SMALL, "events").collect()
    }
    purchases_by_user = {}
    for eid, (uid, ts, et) in ev.items():
        if et == "purchase":
            purchases_by_user.setdefault(uid, []).append((ts, eid))
    matched = [r for r in rows if r["next_purchase_id"] is not None]
    assert matched, "forward as-of matched nothing at sf0.001"
    for r in matched[:300]:
        uid, c_ts, _ = ev[r["click_id"]]
        p_uid, p_ts, _ = ev[r["next_purchase_id"]]
        assert p_uid == uid and p_ts >= c_ts
        # earliest: no other purchase strictly between c_ts and p_ts
        assert not any(
            c_ts <= t < p_ts for t, _ in purchases_by_user.get(uid, ())
        )


def test_interp_linear_bounded_by_real_neighbors(spark, registry):
    """Every interpolated (gap) point must lie within the closed
    interval spanned by the surrounding REAL hourly values — linear
    interpolation never overshoots."""
    rows = registry["ts_interp_linear"].builder(spark, SF_SMALL).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    checked = 0
    for series in by_user.values():
        series.sort(key=lambda r: r["hour"])
        real_idx = [i for i, r in enumerate(series) if not r["was_gap"]]
        for i, r in enumerate(series):
            if not r["was_gap"]:
                continue
            prev = max((j for j in real_idx if j < i), default=None)
            nxt = min((j for j in real_idx if j > i), default=None)
            bounds = [
                series[j]["value_interp"] for j in (prev, nxt) if j is not None
            ]
            assert bounds
            lo, hi = min(bounds), max(bounds)
            assert lo - 1e-4 <= r["value_interp"] <= hi + 1e-4
            checked += 1
    assert checked > 0


def test_pagerank_mass_conserved_and_positive(spark, registry):
    """PageRank is a probability distribution: every rank positive and
    the total within quantization error of 1.0 (undirected graph has no
    dangling mass to leak)."""
    rows = registry["graph_pagerank"].builder(spark, SF_SMALL).collect()
    assert rows
    total = sum(r["pagerank"] for r in rows)
    assert all(r["pagerank"] > 0 for r in rows)
    assert abs(total - 1.0) < 1e-4


def test_ewma_level_within_value_range(spark, registry):
    """A convex-combination smoother can never leave the observed value
    range of its own series."""
    from shared_solar_data_warehouse_spark.sources.io import load_table

    levels = {
        r["user_id"]: r["ewma_level"]
        for r in registry["ts_ewma"].builder(spark, SF_SMALL).collect()
    }
    assert levels
    span = (
        load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    )
    for r in span:
        lvl = levels[r["user_id"]]
        assert r["lo"] - 1e-4 <= lvl <= r["hi"] + 1e-4


def test_containment_bounds_and_ordering(spark, registry):
    """Containment is a ratio into the smaller set: threshold <= c <= 1,
    pairs canonically ordered."""
    rows = registry["dedup_containment"].builder(spark, SF_SMALL).collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0.9 <= r["containment"] <= 1.0 + 1e-12


def test_downtime_agrees_with_delta_gaps(spark, registry):
    """Cross-operator consistency: total outage count in ts_downtime
    equals the number of >30-min gaps ts_delta reports."""
    deltas = registry["ts_delta"].builder(spark, SF_SMALL).collect()
    n_gaps = sum(
        1 for r in deltas if r["gap_seconds"] is not None and r["gap_seconds"] > 1800
    )
    downtime = registry["ts_downtime"].builder(spark, SF_SMALL).collect()
    assert sum(r["n_outages"] for r in downtime) == n_gaps
    for r in downtime:
        assert r["downtime_excess_s"] >= 0
        assert (r["n_outages"] == 0) == (r["downtime_excess_s"] == 0)


def test_asof_tolerance_nulls_stale_matches(spark, registry):
    """The tolerance variant must agree with join_asof everywhere the
    backward match is <= 1 h old, and return NULLs (id AND staleness)
    exactly where the match is older or absent; reported staleness is
    the floor-second age of the join_asof match."""
    base = {
        r["purchase_id"]: r["prior_click_id"]
        for r in registry["join_asof"].builder(spark, SF_SMALL).collect()
    }
    from shared_solar_data_warehouse_spark.sources.io import load_table

    ts_of = {
        r["event_id"]: r["ts"]
        for r in load_table(spark, SF_SMALL, "events").collect()
    }
    rows = registry["join_asof_tolerance"].builder(spark, SF_SMALL).collect()
    assert rows and len(rows) == len(base)
    n_within = 0
    for r in rows:
        click = base[r["purchase_id"]]
        stale = (
            None
            if click is None
            else int(ts_of[r["purchase_id"]].timestamp())
            - int(ts_of[click].timestamp())
        )
        if stale is not None and stale <= 3600:
            n_within += 1
            assert r["prior_click_id_within"] == click
            assert r["staleness_s"] == stale
        else:
            assert r["prior_click_id_within"] is None
            assert r["staleness_s"] is None
    assert n_within, "tolerance window matched nothing at sf0.001"


def test_overlap_sweep_equals_pair_join(spark, registry):
    """The linear sweep-line formulation must produce exactly the same
    per-day overlap statistics as the quadratic pair join — the
    algebraic identity (∫C(active,2)dt == Σ pairwise intersections)
    that justifies the rewrite at scale."""
    sweep = {
        r["day"]: (r["n_overlap_pairs"], r["total_overlap_s"])
        for r in registry["ts_overlap_sweep"].builder(spark, SF_SMALL).collect()
    }
    join = {
        r["day"]: (r["n_overlap_pairs"], r["total_overlap_s"])
        for r in registry["join_interval_overlap"]
        .builder(spark, SF_SMALL)
        .collect()
    }
    assert sweep == join


def test_quantile_sketch_brackets_exact_percentile(spark, registry):
    """The histogram sketch's bucket must CONTAIN the exact quantile:
    bucket*8 <= exact p50 < (bucket+1)*8 (one-bucket error bound by
    construction)."""
    import math

    sk = {
        r["event_type"]: r
        for r in registry["agg_quantile_sketch"].builder(spark, SF_SMALL).collect()
    }
    ev = _events(spark)
    for et, row in sk.items():
        vals = sorted(
            x["value"] for x in ev.filter(F.col("event_type") == et).collect()
        )
        exact_p50 = vals[math.ceil(0.5 * len(vals)) - 1]
        lo = row["p50_bucket"] * 8.0
        hi = lo + 8.0
        assert lo <= exact_p50 < hi or row["p50_bucket"] == 63, (et, exact_p50, lo)


def test_forecast_mae_dominates_bias(spark, registry):
    """|mean signed error| <= mean |error| (triangle inequality) for
    every circuit — a corruption in either accumulation breaks this."""
    rows = registry["ts_forecast_backtest"].builder(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert abs(r["bias_micro"]) <= r["mae_micro"] + 1  # +1 for DIV truncation


def test_bigram_entropy_not_above_unigram_corpus_level(spark, registry):
    """MLE log-likelihood is monotone in model granularity on the
    training corpus: total bigram cross-entropy <= total unigram
    cross-entropy over the same token stream (small slack for the
    per-type 1e-12 quantization)."""
    uni = registry["text_unigram_perplexity"].builder(spark, SF_SMALL).collect()
    bi = registry["text_bigram_perplexity"].builder(spark, SF_SMALL).collect()
    tot_uni = sum(r["xent_bits"] * r["n_tokens"] for r in uni)
    # bigram stream has one fewer token per doc; compare mean rates
    tot_bi = sum(r["xent2_bits"] * r["n_bigrams"] for r in bi)
    n_uni = sum(r["n_tokens"] for r in uni)
    n_bi = sum(r["n_bigrams"] for r in bi)
    assert tot_bi / n_bi <= tot_uni / n_uni + 1e-6


def test_zorder_tiles_bound_both_dimensions(spark, registry):
    """Every z-tile (zcode >> 10) spans at most 2^5 = 32 values in EACH
    bucketed dimension — the multi-dim locality the layout exists for."""
    rows = registry["etl_zorder_key"].builder(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["px_max"] - r["px_min"] <= 31
        assert r["sy_max"] - r["sy_min"] <= 31


def test_concentration_index_bounds(spark, registry):
    """HHI is bounded below by 1/n (perfect equality) and above by 1
    (monopoly), in ppm; CR4 <= 1e6 and >= 4/n for n >= 4."""
    r = registry["agg_hhi"].builder(spark, SF_SMALL).collect()[0]
    n = r["n_entities"]
    assert 1_000_000 // n - 5 <= r["hhi_ppm"] <= 1_000_000
    assert r["cr4_ppm"] <= 1_000_000
    if n >= 4:
        assert r["cr4_ppm"] >= (4 * 1_000_000) // n - 5


def test_ks_statistic_in_unit_interval(spark, registry):
    r = registry["agg_ks_test"].builder(spark, SF_SMALL).collect()[0]
    assert 0 <= r["ks_d_ppm"] <= 1_000_000
    assert r["n_weekday"] > 0 and r["n_weekend"] > 0


def test_benford_deviations_sum_to_zero(spark, registry):
    """Observed shares and expectations each total ~1e6 ppm, so the
    signed deviations cancel (slack for 9 truncated divisions)."""
    rows = registry["agg_benford"].builder(spark, SF_SMALL).collect()
    assert len(rows) == 9
    assert abs(sum(r["deviation_ppm"] for r in rows)) <= 18


def test_gini_matches_hhi_direction(spark, registry):
    """Both inequality measures must sit in [0, 1e6] ppm; the fixture's
    near-uniform circuits imply LOW values for both."""
    g = registry["agg_gini"].builder(spark, SF_SMALL).collect()[0]
    assert 0 <= g["gini_ppm"] <= 1_000_000


def test_mann_whitney_u_identity(spark, registry):
    """U2_a + U2_b == 2 * n_a * n_b — the rank-sum conservation law
    (holds for ANY two samples, ties or not); and both U values are
    within [0, 2*n_a*n_b]."""
    row = registry["agg_mann_whitney"].builder(spark, SF_SMALL).collect()[0]
    total = 2 * row.n_a * row.n_b
    assert row.u2_a + row.u2_b == total
    assert 0 <= row.u2_a <= total
    # midrank sum over the pooled sample is N(N+1) (doubled):
    n = row.n_a + row.n_b
    assert row.rank2_a <= n * (n + 1)


def test_trimmed_mean_bounds_and_counts(spark, registry):
    """n_kept == n - 2*(n DIV 10) per group, and the trimmed mean is
    a true center: between the raw mean's possible displacement —
    concretely, within [min_kept, max_kept] which the rank trim
    guarantees, so compare against the raw mean only for sanity."""
    for r in registry["agg_trimmed_mean"].builder(spark, SF_SMALL).collect():
        assert r.k_trimmed == r.n_rows // 10
        assert r.n_kept == r.n_rows - 2 * r.k_trimmed
        assert r.n_kept > 0


def test_tukey_quartiles_ordered(spark, registry):
    for r in registry["agg_tukey_outliers"].builder(spark, SF_SMALL).collect():
        assert r.q1_micro <= r.q3_micro
        assert r.iqr_micro == r.q3_micro - r.q1_micro
        assert 0 <= r.n_outliers <= r.n_rows


def test_binomial_ci_brackets_estimate(spark, registry):
    for r in registry["agg_binomial_ci"].builder(spark, SF_SMALL).collect():
        assert 0 <= r.lo_ppm <= r.p_ppm <= r.hi_ppm <= 1_000_000
        assert r.half_width_ppm >= 0


def test_transition_matrix_rows_conserve(spark, registry):
    """Per from_type, transition counts sum to from_total and the ppm
    row nearly sums to 1e6 (truncation loses < n_cells ppm)."""
    rows = registry["ts_event_transitions"].builder(spark, SF_SMALL).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for frm, grp in by_from.items():
        assert sum(r.n_transitions for r in grp) == grp[0].from_total
        ppm = sum(r.p_ppm for r in grp)
        assert 1_000_000 - len(grp) <= ppm <= 1_000_000


def test_local_clustering_in_unit_range(spark, registry):
    for r in (
        registry["graph_local_clustering"].builder(spark, SF_SMALL).collect()
    ):
        assert 0 <= r.clustering_ppm <= 1_000_000
        assert r.degree >= 2
        # triangles at a node can't exceed deg choose 2:
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2


def test_minhash_calibration_error_bounded(spark, registry):
    """The 24-lane estimator's mean absolute error over candidates
    must sit within ~2σ of the binomial bound (σ ≈ 0.10 at J=0.35):
    a broken lane fold would blow this out immediately."""
    rows = (
        registry["dedup_minhash_calibration"]
        .builder(spark, SF_SMALL)
        .collect()
    )
    assert rows
    for r in rows:
        assert 0 <= r.est_jaccard_ppm <= 1_000_000
        assert 0 <= r.exact_jaccard_ppm <= 1_000_000
        assert r.err_ppm == r.est_jaccard_ppm - r.exact_jaccard_ppm
    mae = sum(abs(r.err_ppm) for r in rows) / len(rows)
    assert mae <= 200_000, f"calibration MAE {mae} ppm — estimator broken?"


def test_ann_recall_eval_consistent_with_recall_floor(spark, registry):
    """recall@5 per query in [0, 1e6]; the corpus-wide mean respects
    the banding design's capture probability (same floor the direct
    LSH test asserts)."""
    rows = registry["sim_ann_recall_eval"].builder(spark, SF_SMALL).collect()
    assert {r.query_id for r in rows} == set(range(20))
    for r in rows:
        assert 0 <= r.recall_ppm <= 1_000_000
        assert r.recall_ppm == r.n_hits * 1_000_000 // 5


def test_alert_debounce_episode_accounting(spark, registry):
    """Episodes partition the breach set: sum(1 + n_suppressed) over
    episodes == total breach rows; episode numbers are dense per
    user starting at 1."""
    from shared_solar_data_warehouse_spark.sources.io import load_table

    rows = registry["ts_alert_debounce"].builder(spark, SF_SMALL).collect()
    n_breaches = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("value") > 250)
        .count()
    )
    assert sum(1 + r.n_suppressed for r in rows) == n_breaches
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.alert_seq)
    for seqs in by_user.values():
        assert sorted(seqs) == list(range(1, len(seqs) + 1))


def test_survival_km_estimator_invariants(spark, registry):
    """KM curve is nonincreasing in [0,1]; risk sets strictly shrink;
    deaths+censored over all durations partition the user set."""
    from shared_solar_data_warehouse_spark.sources.io import load_table

    rows = sorted(
        registry["ts_survival_km"].builder(spark, SF_SMALL).collect(),
        key=lambda r: r.dur_days,
    )
    n_users = (
        load_table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_deaths + r.n_censored for r in rows) == n_users
    assert rows[0].at_risk == n_users
    prev_s, prev_risk = 1.0, None
    for r in rows:
        assert 0.0 <= r.km_survival <= 1.0
        assert r.km_survival <= prev_s + 1e-12
        if prev_risk is not None:
            assert r.at_risk < prev_risk
        prev_s, prev_risk = r.km_survival, r.at_risk


def test_silhouette_bounds_and_coverage(spark, registry):
    from shared_solar_data_warehouse_spark.sources.io import load_table

    rows = registry["sim_silhouette"].builder(spark, SF_SMALL).collect()
    n_vecs = load_table(spark, SF_SMALL, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n_vecs
    for r in rows:
        assert -1.0 <= r.mean_silhouette <= 1.0
        assert 0 <= r.n_misplaced <= r.n_vectors


def test_pca_power_iteration_matches_numpy_replica(spark, registry):
    """The integer-quantized pipeline tracks a float numpy replica of
    the SAME four power steps to within the quantization budget
    (cross-implementation check — the fixture cloud's spectrum is
    near-flat, so 4 steps are NOT near the exact eigenvector and the
    op's contract is the step count, not convergence), and each step
    strictly improves the Rayleigh quotient from the ones start."""
    import numpy as np

    from shared_solar_data_warehouse_spark.sources.io import load_table

    rows = registry["sim_pca_power_iteration"].builder(spark, SF_SMALL).collect()
    v = np.array(
        [r.component_q6 for r in sorted(rows, key=lambda r: r.pos)], dtype=float
    )
    emb = np.array(
        [
            r.embedding
            for r in load_table(spark, SF_SMALL, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=float,
    )
    xc = emb - emb.mean(axis=0)
    ref = np.ones(xc.shape[1])
    for _ in range(4):
        p = xc @ ref
        ref = xc.T @ (p / np.abs(p).max())
        ref = ref / np.abs(ref).max()
    cos = abs(np.dot(v, ref) / (np.linalg.norm(v) * np.linalg.norm(ref)))
    assert cos >= 0.999, f"integer pipeline diverged from float replica: {cos}"

    def rq(u):
        return float(u @ (xc.T @ (xc @ u)) / (u @ u))

    assert rq(v) > rq(np.ones(xc.shape[1])) * 1.5  # power steps made progress
    top = max(rows, key=lambda r: (abs(r.component_q6), -r.pos))
    assert top.component_q6 > 0  # sign anchor


def test_pareto_frontier_mutual_nondomination(spark, registry):
    rows = registry["win_pareto_frontier"].builder(spark, SF_SMALL).collect()
    pts = sorted((r.price_cents, r.best_qty) for r in rows)
    for (p1, q1), (p2, q2) in zip(pts, pts[1:]):
        assert p1 < p2 and q1 < q2  # strictly improving in both axes


def test_rfm_census_partitions_customers(spark, registry):
    from shared_solar_data_warehouse_spark.sources.io import load_table

    rows = registry["agg_rfm_segmentation"].builder(spark, SF_SMALL).collect()
    n_cust = (
        load_table(spark, SF_SMALL, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        assert r.segment in {
            "champion", "loyal", "big_spender", "at_risk", "hibernating", "regular",
        }


def test_bollinger_warmup_never_flags(spark, registry):
    rows = registry["win_bollinger_band"].builder(spark, SF_SMALL).collect()
    assert any(r.breach_upper or r.breach_lower for r in rows)
    for r in rows:
        if r.n_window < 10:
            assert r.breach_upper == 0 and r.breach_lower == 0
        assert r.sigma >= 0.0


def test_association_rules_symmetry_and_bounds(spark, registry):
    rows = registry["agg_association_rules"].builder(spark, SF_SMALL).collect()
    both = {(r.antecedent, r.consequent): r for r in rows}
    for (a, c), r in both.items():
        assert both[(c, a)].n_both == r.n_both  # co-occurrence symmetric
        assert 0 <= r.confidence_ppm <= 1_000_000
        assert r.support_ppm <= r.confidence_ppm  # n_users >= n_antecedent


def test_cdc_apply_equals_batch_fold(spark, registry):
    """The streaming CDC fold lands exactly the batch last-op-per-key
    state (tombstones absent, op counts intact)."""
    from pyspark.sql import Window
    from shared_solar_data_warehouse_spark.sources.io import load_table

    got = {
        r.user_id: (r.last_event_id, r.n_ops)
        for r in registry["stream_cdc_apply"].builder(spark, SF_SMALL).collect()
    }
    ev = load_table(spark, SF_SMALL, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_ops", F.count(F.lit(1)).over(Window.partitionBy("user_id")))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .collect()
    )
    want = {r.user_id: (r.event_id, r.n_ops) for r in last}
    assert got == want


def test_changepoint_one_row_per_type_with_valid_split(spark, registry):
    from shared_solar_data_warehouse_spark.sources.io import load_table

    rows = registry["ts_changepoint"].builder(spark, SF_SMALL).collect()
    e = load_table(spark, SF_SMALL, "events")
    n_types = e.select("event_type").distinct().count()
    assert len(rows) == n_types
    n_days = e.select(F.to_date("ts")).distinct().count()
    for r in rows:
        assert 1 <= r.n_days_before < n_days + 1
        assert r.mean_before_cents >= 0 and r.mean_after_cents >= 0


def test_vocab_growth_accounts_for_full_vocabulary(spark, registry):
    from shared_solar_data_warehouse_spark.sources.io import load_table

    rows = sorted(
        registry["text_vocab_growth"].builder(spark, SF_SMALL).collect(),
        key=lambda r: r.bucket,
    )
    d = load_table(spark, SF_SMALL, "documents")
    vocab = (
        d.filter(F.length("text") > 0)
        .select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .count()
    )
    assert sum(r.n_new_tokens for r in rows) == vocab
    assert rows[-1].cum_vocab == vocab
    assert all(b.cum_vocab <= a.cum_vocab for a, b in zip(rows[1:], rows))


def test_cc_distributed_parity_at_scale_with_long_chain(spark):
    """r5 (VERDICT r4 item 6): end-to-end parity of the distributed
    min-label CC path against the driver union-find on a synthetic dup
    graph BIGGER and nastier than anything the sf fixtures produce:

    * a 1000-node CHAIN (diameter 999) — serially-edited documents,
      each a near-dup of the next.  Propagation-only min-label needs
      999 rounds; the 20-round cap would silently mislabel it.  The
      pointer-doubling shortcut (lab <- lab[lab]) added in r5 converges
      in ~log2(999) ~ 10 rounds, which this test proves.
    * 200 disjoint 10-cliques (the common near-dup blob shape),
    * 5_000 random small components spread over a 1e9 id space
      (label != position, exercises the join keys, not array indexing).

    ~50k edges built WITH spark.range (no driver-side list), run through
    BOTH module-level regime functions, labels compared exactly.
    """
    from shared_solar_data_warehouse_spark.operators.dedup import (
        cc_distributed_min_label,
        cc_driver_union_find,
    )

    base = 1_000_000_000
    chain = spark.range(999).select(
        (F.col("id") + base).alias("doc_a"),
        (F.col("id") + base + 1).alias("doc_b"),
    )
    # 200 cliques of 10: all pairs within each block of 10 ids.
    clique_nodes = spark.range(2000).select(
        (F.col("id") / 10).cast("long").alias("blk"),
        (F.col("id") * 7 + 3 * base).alias("node"),  # scattered ids
    )
    cliques = (
        clique_nodes.alias("a")
        .join(clique_nodes.alias("b"), "blk")
        .filter(F.col("a.node") < F.col("b.node"))
        .select(F.col("a.node").alias("doc_a"), F.col("b.node").alias("doc_b"))
    )
    # 5k random star components: hub id h, 8 spokes each.
    stars = spark.range(40_000).select(
        ((F.col("id") / 8).cast("long") * 1013 + 5 * base).alias("doc_a"),
        (F.col("id") * 991 + 7 * base).alias("doc_b"),
    )
    pairs = chain.unionByName(cliques).unionByName(stars).repartition(32)

    dist = {
        (r.doc_id, r.lab) for r in cc_distributed_min_label(pairs).collect()
    }
    # union-find emits only NON-ROOT nodes (roots default to self via
    # the caller's coalesce), so normalize to the same total map:
    driver_map = {
        r.doc_id: r.lab for r in cc_driver_union_find(spark, pairs).collect()
    }
    mismatches = [
        (doc, lab, driver_map.get(doc, doc))
        for (doc, lab) in dist
        if lab != driver_map.get(doc, doc)
    ]
    assert not mismatches, mismatches[:10]
    # The chain must be ONE component labeled by its min id.
    chain_labels = {lab for (doc, lab) in dist if base <= doc < base + 1000}
    assert chain_labels == {base}


def test_battery_soc_bounds_and_step_conservation(spark, registry):
    """SoC stays in [0, cap]; step counts cover every charge/discharge
    event; a user with only purchases and no clamp hits ends at
    min(sum, cap)."""
    from shared_solar_data_warehouse_spark.operators.timeseries import (
        BATTERY_CAP_CENTS,
    )
    from shared_solar_data_warehouse_spark.sources.io import load_table

    rows = registry["ts_battery_soc"].builder(spark, SF_SMALL).collect()
    assert rows
    e = load_table(spark, SF_SMALL, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    n_by_user = {
        r["user_id"]: r["n"]
        for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rows:
        assert 0 <= r.final_soc_cents <= BATTERY_CAP_CENTS
        assert r.n_steps == n_by_user[r.user_id]
        assert r.n_clamp_lo + r.n_clamp_hi <= r.n_steps


def test_backfill_ranges_disjoint_and_truly_missing(spark, registry):
    """Backfill ranges per (type, bucket) never overlap each other and
    never cover an observed day."""
    from shared_solar_data_warehouse_spark.sources.io import load_table

    plan = registry["etl_backfill_plan"].builder(spark, SF_SMALL).collect()
    assert plan
    e = load_table(spark, SF_SMALL, "events")
    observed = {
        (r["event_type"], r["bucket"], r["d"])
        for r in e.select(
            "event_type",
            F.pmod(F.col("user_id"), F.lit(8)).cast("bigint").alias("bucket"),
            F.to_date("ts").alias("d"),
        )
        .distinct()
        .collect()
    }
    import datetime as dt

    by_cell: dict = {}
    for r in plan:
        assert r.backfill_start <= r.backfill_end
        span = (r.backfill_end - r.backfill_start).days + 1
        assert span == r.n_days
        for i in range(span):
            day = r.backfill_start + dt.timedelta(days=i)
            key = (r.event_type, r.bucket, day)
            assert key not in observed, f"range covers observed cell {key}"
            assert key not in by_cell, f"overlapping ranges at {key}"
            by_cell[key] = True


def test_ndcg_bounded_by_ideal(spark, registry):
    """DCG <= IDCG by construction (same multiset of relevances,
    ideal ordering maximizes the discounted sum), so ndcg_ppm <= 1e6;
    and a perfectly-ordered day scores exactly 1e6."""
    rows = registry["agg_ndcg_eval"].builder(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.dcg_q9 <= r.idcg_q9
        assert 0 <= r.ndcg_ppm <= 1_000_000


def test_mips_rank_respects_magnitude_weighting(spark, registry):
    """MIPS differs from cosine kNN: the top neighbor maximizes
    magnitude-weighted score, and every returned score is within the
    top-5 of its query's full score set (spot-checked per query)."""
    rows = registry["sim_mips_topk"].builder(spark, SF_SMALL).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.mips_rank, r.score_q6))
    for q, lst in by_q.items():
        lst.sort()
        assert [k for k, _ in lst] == [1, 2, 3, 4, 5]
        scores = [s for _, s in lst]
        assert scores == sorted(scores, reverse=True)


def test_hashed_features_bucket_space_and_collisions(spark, registry):
    """Feature ids live in [0, DIM); bucket census sums to the corpus
    bigram total; collision counts are >= 1 member each."""
    from shared_solar_data_warehouse_spark.operators.text import (
        HASH_FEATURE_DIM,
    )
    from shared_solar_data_warehouse_spark.sources.io import load_table

    rows = registry["text_hashed_ngram_features"].builder(
        spark, SF_SMALL
    ).collect()
    assert rows
    d = load_table(spark, SF_SMALL, "documents")
    total_bigrams = (
        d.select(F.size(F.split("text", " ")).alias("n"))
        .filter(F.col("n") >= 2)
        .agg(F.sum(F.col("n") - 1))
        .collect()[0][0]
    )
    assert sum(r.total_count for r in rows) == total_bigrams
    for r in rows:
        assert 0 <= r.feature_id < HASH_FEATURE_DIM
        assert r.n_distinct_bigrams >= 1
        assert r.total_count >= r.n_distinct_bigrams


def test_cramers_v_in_unit_interval(spark, registry):
    rows = registry["agg_cramers_v"].builder(spark, SF_SMALL).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0 <= r.cramers_v_ppm <= 1_000_000
    assert r.r_levels >= 2 and r.c_levels >= 2


def test_attribution_conserves_purchase_revenue(spark, registry):
    """Every purchase is attributed exactly once: channel sums equal the
    global purchase totals, and channels are only touch types or
    'direct'."""
    from shared_solar_data_warehouse_spark.sources.io import load_table

    rows = registry["ts_attribution_last_touch"].builder(spark, SF_SMALL).collect()
    assert rows
    assert {r.channel for r in rows} <= {"click", "view", "direct"}
    e = load_table(spark, SF_SMALL, "events").filter(
        F.col("event_type") == "purchase"
    )
    tot = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)")).alias("c"),
    ).collect()[0]
    assert sum(r.n_purchases for r in rows) == tot["n"]
    assert sum(r.attributed_cents for r in rows) == tot["c"]


def test_calibration_bins_partition_the_corpus(spark, registry):
    from shared_solar_data_warehouse_spark.sources.io import load_table

    rows = registry["agg_calibration_bins"].builder(spark, SF_SMALL).collect()
    assert {r.bin for r in rows} <= set(range(10))
    n_events = load_table(spark, SF_SMALL, "events").count()
    assert sum(r.n for r in rows) == n_events
    for r in rows:
        assert 0 <= r.observed_ppm <= 1_000_000
        # bin b's mean prediction must sit inside the bin's range
        assert r.bin * 100_000 <= r.mean_pred_ppm < (r.bin + 1) * 100_000
        assert r.gap_ppm == r.mean_pred_ppm - r.observed_ppm


def test_late_arriving_dim_keys_unknown_to_customer(spark, registry):
    from shared_solar_data_warehouse_spark.sources.io import load_table

    rows = registry["etl_late_arriving_dim"].builder(spark, SF_SMALL).collect()
    assert rows, "key shift must manufacture a non-empty worklist"
    known = {
        r["c_custkey"]
        for r in load_table(spark, SF_SMALL, "customer")
        .select("c_custkey")
        .collect()
    }
    for r in rows:
        assert r.user_id not in known
        assert r.n_events >= 1 and r.total_cents >= 0


def test_span_ngram_census_matches_bruteforce(spark, registry):
    """`dedup_span_ngram`'s distributed shingle-census plan must agree
    with a literal python recount of duplicated 8-token windows — and a
    position is duplicated iff its window text occurs in ≥2 DISTINCT
    docs (repeats inside one doc alone do not count)."""
    from collections import defaultdict

    from shared_solar_data_warehouse_spark.operators.dedup import SPAN_NGRAM_K
    from shared_solar_data_warehouse_spark.sources.io import load_table

    docs = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    owners = defaultdict(set)
    spans = []  # (source, doc_id, shingle)
    for r in docs:
        toks = r.text.split(" ")
        for i in range(len(toks) - SPAN_NGRAM_K + 1):
            sh = " ".join(toks[i : i + SPAN_NGRAM_K])
            owners[sh].add(r.doc_id)
            spans.append((r.source, r.doc_id, sh))
    exp = defaultdict(lambda: [0, 0, set()])  # total, dup, dup_docs
    for src, doc, sh in spans:
        e = exp[src]
        e[0] += 1
        if len(owners[sh]) >= 2:
            e[1] += 1
            e[2].add(doc)
    got = {
        r.source: r
        for r in registry["dedup_span_ngram"].builder(spark, SF_SMALL).collect()
    }
    assert set(got) == set(exp)
    for src, (total, dup, dup_docs) in exp.items():
        r = got[src]
        assert (r.total_spans, r.dup_spans, r.n_docs_with_dup) == (
            total,
            dup,
            len(dup_docs),
        ), src
        assert r.dup_span_ppm == dup * 1_000_000 // total
