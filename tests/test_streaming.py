"""Tier-4: streaming/batch parity (SURVEY.md §5.3.4).  The mirror
already hash-checks the streaming ops against batch SQL; these tests
additionally pin the UNIFIED-MODEL claim — a streaming op and its
DataFrame batch twin produce identical results — and the exactly-once
properties of the repair/sink paths.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_session_window_matches_batch_sessionize(spark, registry):
    stream = registry["stream_session"].builder(spark, SF_SMALL)
    batch = (
        registry["ts_sessionize"]
        .builder(spark, SF_SMALL)
        .select(
            "user_id",
            "session_start_s",
            F.col("session_end_s").alias("session_last_s"),
            "n_events",
            "session_value",
        )
    )
    assert _canon(stream) == _canon(batch)


def test_tumbling_matches_batch_bucket_agg(spark, registry):
    stream = registry["stream_tumbling"].builder(spark, SF_SMALL)
    from shared_solar_data_warehouse_spark.parity import dsum
    from shared_solar_data_warehouse_spark.sources.io import load_table

    e = load_table(spark, SF_SMALL, "events")
    batch = e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
    )
    assert _canon(stream) == _canon(batch)


def test_stream_dedup_restores_exactly_once(spark, registry):
    from shared_solar_data_warehouse_spark.sources.io import load_table

    deduped = registry["stream_dedup"].builder(spark, SF_SMALL)
    n_events = load_table(spark, SF_SMALL, "events").count()
    assert deduped.count() == n_events
    assert deduped.select("event_id").distinct().count() == n_events


def test_foreachbatch_sink_idempotent(spark, registry):
    """Running the sink op twice must not double-count (per-epoch
    overwrite semantics)."""
    first = _canon(registry["stream_sink_foreachbatch"].builder(spark, SF_SMALL))
    second = _canon(registry["stream_sink_foreachbatch"].builder(spark, SF_SMALL))
    assert first == second


def test_stream_ewma_matches_batch_twin(spark, registry):
    """The stateful streaming EWMA and the batch applyInPandas EWMA
    fold the same expression over the same ordering — results must be
    identical, including the float bits under the shared rounding."""
    stream = registry["stream_ewma"].builder(spark, SF_SMALL)
    batch = registry["ts_ewma"].builder(spark, SF_SMALL)
    assert _canon(stream) == _canon(batch)
