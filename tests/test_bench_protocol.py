"""Guard the driver-facing bench stdout protocol: the driver keeps only
a ~2000-char tail of bench.py's stdout and parses the FINAL JSON line
from it (BASELINE.md "Stdout protocol").  A formatting regression here
silently costs the round's BENCH record, so run the real script end to
end on a 3-op subset at the smallest fixture and assert the contract.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_stdout_final_line_parses_and_fits_tail_buffer():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_ONLY="project_select,filter_pred,limit_n",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    final = lines[-1]
    rec = json.loads(final)
    assert rec["metric"] == "total_sec_full_registry"
    assert rec["unit"] == "sec"
    assert isinstance(rec["value"], (int, float))
    assert rec["sf"] == 0.001
    assert set(rec["queries"]) == {"project_select", "filter_pred", "limit_n"}
    # r6: the steady-state min-of-3 record precedes the final line, and
    # BOTH must fit the driver's ~2000-char tail together
    steady = json.loads(lines[-2])
    assert steady["metric"] == "steady_state_min3_slowest20"
    assert set(steady["queries"]) <= set(rec["queries"])
    assert all(
        steady["queries"][n] <= rec["queries"][n] for n in steady["queries"]
    )
    assert len(final) + len(lines[-2]) + 2 <= 2000, (
        f"trailing lines {len(final)}+{len(lines[-2])} chars > tail buffer"
    )
    # the subset knob must never clobber the committed full record
    committed = json.load(open(os.path.join(REPO, "BENCH.json")))
    assert len(committed["queries"]) > 3


def test_bench_out_env_redirects_record(monkeypatch, tmp_path):
    """SPARK_GRAFT_BENCH_OUT must redirect the full per-query record —
    A/B windows run against alternate checkouts must not clobber the
    committed BENCH.json (the r10 session lost its best window's map
    exactly that way)."""
    import importlib

    monkeypatch.syspath_prepend(REPO)
    bench = importlib.import_module("bench")

    import shared_solar_data_warehouse_spark.registry as reg
    import shared_solar_data_warehouse_spark.session as sess

    monkeypatch.setattr(reg, "REGISTRY", {})
    monkeypatch.setattr(reg, "load_all_ops", lambda: None)
    monkeypatch.setattr(sess, "get_session", lambda *a, **kw: None)
    out = tmp_path / "bench_window.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_OUT", str(out))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ONLY", raising=False)

    committed_before = open(os.path.join(REPO, "BENCH.json")).read()
    assert bench.main() == 0
    rec = json.loads(out.read_text())
    assert rec["metric"] == "total_sec_full_registry"
    assert rec["queries"] == {}
    # the committed record is untouched
    assert open(os.path.join(REPO, "BENCH.json")).read() == committed_before


def _patched_bench(monkeypatch):
    import importlib

    monkeypatch.syspath_prepend(REPO)
    bench = importlib.import_module("bench")
    import shared_solar_data_warehouse_spark.registry as reg
    import shared_solar_data_warehouse_spark.session as sess

    monkeypatch.setattr(reg, "REGISTRY", {})
    monkeypatch.setattr(reg, "load_all_ops", lambda: None)
    monkeypatch.setattr(sess, "get_session", lambda *a, **kw: None)
    return bench


def test_bench_out_honored_on_subset_runs(monkeypatch, tmp_path):
    """An EXPLICIT redirect can't clobber the committed record, so the
    subset guard must not suppress it (code-review r10): a subset A/B
    iteration that asks for a record at a path must get one."""
    bench = _patched_bench(monkeypatch)
    out = tmp_path / "subset.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_OUT", str(out))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ONLY", "project_select")
    committed_before = open(os.path.join(REPO, "BENCH.json")).read()
    assert bench.main() == 0
    assert json.loads(out.read_text())["metric"] == "total_sec_full_registry"
    assert open(os.path.join(REPO, "BENCH.json")).read() == committed_before


def test_bench_out_write_failure_warns_and_exits_nonzero(
    monkeypatch, tmp_path, capsys
):
    """A failed write to an explicit redirect path must WARN on stderr
    (the driver parses stdout's bounded tail) AND return a distinct
    nonzero exit code so a scripted A/B harness can detect the loss of
    the window's record from the exit status (ADVICE r10)."""
    bench = _patched_bench(monkeypatch)
    monkeypatch.setenv(
        "SPARK_GRAFT_BENCH_OUT", str(tmp_path / "no-such-dir" / "w.json")
    )
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ONLY", raising=False)
    assert bench.main() == 3
    err = capsys.readouterr().err
    assert "WARNING: could not write bench record" in err


def test_bench_out_subset_refuses_committed_path(monkeypatch, capsys):
    """An explicit redirect that RESOLVES to the committed BENCH.json is
    exactly the clobber the subset guard exists to prevent (ADVICE r10):
    a subset run must refuse it, leave the committed record untouched,
    and say so on stderr."""
    bench = _patched_bench(monkeypatch)
    committed = os.path.join(REPO, "BENCH.json")
    # a non-normalized spelling of the same path — realpath must catch it
    monkeypatch.setenv(
        "SPARK_GRAFT_BENCH_OUT", os.path.join(REPO, ".", "BENCH.json")
    )
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ONLY", "project_select")
    committed_before = open(committed).read()
    assert bench.main() == 0
    assert open(committed).read() == committed_before
    err = capsys.readouterr().err
    assert "refusing to write subset record" in err


def test_bench_refuses_committed_overwrite_on_cpus_mismatch(
    monkeypatch, tmp_path, capsys
):
    """A full run at a core count differing from the committed record's
    must NOT overwrite the committed BENCH.json (VERDICT r11 item 2: the
    driver's 8-core scaling run clobbered the round-close 32-core record
    because bench.py wrote the committed path by default)."""
    bench = _patched_bench(monkeypatch)
    committed = tmp_path / "BENCH.json"
    committed.write_text(json.dumps({"cpus": "32", "queries": {}}))
    monkeypatch.setattr(bench, "_committed_path", lambda: str(committed))
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    monkeypatch.delenv("SPARK_GRAFT_BENCH_OUT", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ONLY", raising=False)
    before = committed.read_text()
    assert bench.main() == 0
    assert committed.read_text() == before
    assert "refusing to overwrite" in capsys.readouterr().err
    # an explicit redirect elsewhere still records the scaling run
    out = tmp_path / "c8.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_OUT", str(out))
    assert bench.main() == 0
    assert json.loads(out.read_text())["cpus"] == "8"
    assert committed.read_text() == before


def test_bench_same_cpus_still_writes_committed(monkeypatch, tmp_path):
    """The guard must not block the legitimate round-close path: same
    core count as the committed record overwrites it as before."""
    bench = _patched_bench(monkeypatch)
    committed = tmp_path / "BENCH.json"
    committed.write_text(json.dumps({"cpus": "32", "queries": {"x": 1.0}}))
    monkeypatch.setattr(bench, "_committed_path", lambda: str(committed))
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "32")
    monkeypatch.delenv("SPARK_GRAFT_BENCH_OUT", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ONLY", raising=False)
    assert bench.main() == 0
    rec = json.loads(committed.read_text())
    assert rec["cpus"] == "32"
    assert rec["queries"] == {}
    # memo_cold is on the record (VERDICT r11 item 7) — empty here since
    # no memo artifact was built under the stubbed registry
    assert "memo_cold" in rec


def test_bench_out_destination_echoed_to_stderr(monkeypatch, tmp_path, capsys):
    """The record destination is echoed to stderr so a redirect leaked
    from an earlier shell can't silently divert a round-close run."""
    bench = _patched_bench(monkeypatch)
    out = tmp_path / "w.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_OUT", str(out))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ONLY", raising=False)
    assert bench.main() == 0
    captured = capsys.readouterr()
    assert f"record -> {out}" in captured.err
    assert "record ->" not in captured.out
