"""Driver-coverage rotation and fingerprint-invalidation logic
(ADVICE r02 medium: a green op edited later must rotate back into the
driver's bounded per-round sample instead of staying tail-sorted
forever).

Pure-python — no SparkSession; the registry import only registers
builders, it never executes them.
"""

from __future__ import annotations

import json

import pytest

from shared_solar_data_warehouse_spark import registry as reg


@pytest.fixture()
def fake_repo(tmp_path, monkeypatch):
    """Point the registry's repo-root discovery at a scratch dir with
    synthetic CORRECTNESS / OP_FINGERPRINTS files."""
    monkeypatch.setattr(reg, "_repo_root", lambda: str(tmp_path))
    return tmp_path


def _write(path, obj):
    path.write_text(json.dumps(obj))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 5, "oracle_rows": 5, "err": None}
RED = {"rows_match": True, "schema_match": True, "hash_match": False,
       "spark_rows": 5, "oracle_rows": 5, "err": None}
ROWS_ONLY = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": 5, "oracle_rows": None, "err": "no_oracle"}


def test_fingerprint_keys_on_oracle_text():
    """Two ops sharing builder source (the spark.sql closures) must
    still fingerprint differently when their oracle differs."""
    reg.load_all_ops()
    q1 = reg.REGISTRY["sql_tpch_q1"]
    q3 = reg.REGISTRY["sql_tpch_q3"]
    assert reg.op_fingerprint(q1) != reg.op_fingerprint(q3)
    # and stable across calls
    assert reg.op_fingerprint(q1) == reg.op_fingerprint(q1)


def test_green_requires_all_three_matches(fake_repo):
    _write(fake_repo / "CORRECTNESS_r01.json",
           {"agg_global": GREEN, "agg_groupby": RED, "row_sample": ROWS_ONLY})
    green = reg.driver_green()
    assert "agg_global" in green
    assert "row_sample" in green  # rows-only ops count via no_oracle
    assert "agg_groupby" not in green


def test_changed_op_loses_coverage(fake_repo):
    """A green op whose recorded fingerprint no longer matches the
    current source is NOT covered — it must rotate back to the head."""
    reg.load_all_ops()
    # Pick two ops guaranteed OUTSIDE _FRONTLOAD (its membership is a
    # per-round editorial choice — the r7 window absorbed agg_global/
    # agg_groupby, which this test previously hardcoded).
    valid_op, stale_op = sorted(set(reg.REGISTRY) - set(reg._FRONTLOAD))[:2]
    cur = reg.op_fingerprint(reg.REGISTRY[valid_op])
    _write(fake_repo / "CORRECTNESS_r01.json",
           {valid_op: GREEN, stale_op: GREEN})
    _write(fake_repo / "OP_FINGERPRINTS.json",
           {valid_op: cur, stale_op: "0000deadbeef0000"})
    covered = reg.driver_covered()
    assert valid_op in covered          # fingerprint matches -> valid
    assert stale_op not in covered      # stale fingerprint -> invalid
    order = reg.driver_order()
    # the invalidated op sorts into the uncovered band, before the
    # covered one (both are outside _FRONTLOAD)
    assert order.index(stale_op) < order.index(valid_op)


def test_missing_fingerprint_file_fails_open(fake_repo):
    """Losing the sidecar file must not wipe rotation state: green ops
    without a record stay covered until the snapshot tool repopulates."""
    _write(fake_repo / "CORRECTNESS_r01.json", {"agg_global": GREEN})
    assert "agg_global" in reg.driver_covered()


def test_frontload_heads_the_order(fake_repo):
    """_FRONTLOAD ops sort first even when a (stale) green record marks
    them covered — this round's fixes must be re-confirmed."""
    reg.load_all_ops()
    some_front = reg._FRONTLOAD[0]
    cur = reg.op_fingerprint(reg.REGISTRY[some_front])
    _write(fake_repo / "CORRECTNESS_r01.json", {some_front: GREEN})
    _write(fake_repo / "OP_FINGERPRINTS.json", {some_front: cur})
    order = reg.driver_order()
    assert order[: len(reg._FRONTLOAD)] == [
        n for n in reg._FRONTLOAD if n in reg.REGISTRY
    ]


def test_driver_order_safe_standalone(fake_repo, monkeypatch):
    """ADVICE r02: driver_order()/driver_covered() must self-populate
    the registry (call load_all_ops) when invoked before queries().
    Clearing the real REGISTRY can't simulate a fresh process (module
    imports are cached, the @op decorators would not re-run), so spy on
    the load_all_ops call instead."""
    calls = []
    orig = reg.load_all_ops

    def spy():
        calls.append(1)
        return orig()

    monkeypatch.setattr(reg, "load_all_ops", spy)
    order = reg.driver_order()
    assert len(order) > 200
    assert calls, "driver_order() must call load_all_ops() itself"
    calls.clear()
    reg.driver_covered()
    assert calls, "driver_covered() must call load_all_ops() itself"


def test_no_stale_green_escapes_the_sample_window():
    """r6 (VERDICT r5 item 8): every driver-green op whose CURRENT
    fingerprint no longer matches OP_FINGERPRINTS.json — i.e. edited
    since the driver last verified it — must sit inside the explicit
    _FRONTLOAD window so the NEXT driver sample re-verifies it.  An
    edit that forgets to front-load its rider fails here instead of
    shipping an unverified change for a round."""
    reg.load_all_ops()
    recorded = reg._recorded_fingerprints()
    stale = {
        name
        for name in reg.driver_green()
        if name in reg.REGISTRY
        and recorded.get(name) is not None
        and recorded[name] != reg.op_fingerprint(reg.REGISTRY[name])
    }
    escaped = stale - set(reg._FRONTLOAD)
    assert not escaped, (
        f"edited driver-green ops missing from _FRONTLOAD: {sorted(escaped)}"
    )


def test_frontload_fits_the_driver_window():
    """The driver checks the first 50 rows of queries(); a _FRONTLOAD
    longer than the window silently drops its tail from re-verification."""
    reg.load_all_ops()
    assert len(reg._FRONTLOAD) <= 50
    unknown = [n for n in reg._FRONTLOAD if n not in reg.REGISTRY]
    assert not unknown, f"_FRONTLOAD names not in registry: {unknown}"
