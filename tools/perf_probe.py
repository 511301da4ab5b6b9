"""Optimization-round inner loop: time one or more registry ops and
capture their physical plans.

For each named op: builds the DataFrame, captures
``explain('formatted')`` to ``plans/r11/<op>_<tag>.txt`` (when --tag is
given), then times N full materializations with the BENCH.json
methodology (``len(df.toPandas())``, builder re-invoked per run) and
reports per-run seconds plus the min — the steady-state estimator
bench.py's min-of-N uses.  ``--noop`` additionally times the
noop-sink materialization (guide §1.4) so driver-collect cost can be
separated from compute.

Usage:
    python tools/perf_probe.py <op> [<op>...] [--sf SF_DIR] [--n 3]
                               [--tag before|after] [--noop]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    n = 3
    tag = None
    use_noop = False
    names: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--sf":
            sf = argv[i + 1]
            i += 2
        elif a == "--n":
            n = int(argv[i + 1])
            i += 2
        elif a == "--tag":
            tag = argv[i + 1]
            i += 2
        elif a == "--noop":
            use_noop = True
            i += 1
        else:
            names.append(a)
            i += 1

    from shared_solar_data_warehouse_spark.plans import explain_formatted
    from shared_solar_data_warehouse_spark.registry import REGISTRY, load_all_ops
    from shared_solar_data_warehouse_spark.session import get_session

    load_all_ops()
    spark = get_session("sswh-perf-probe")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(
        here, "plans", os.environ.get("SPARK_GRAFT_PLANS_TAG", "r12")
    )
    os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        if name not in REGISTRY:
            print(f"{name}: NOT REGISTERED")
            continue
        builder = REGISTRY[name].builder
        spark.sparkContext.setJobDescription(f"probe:{name}")
        if tag:
            df = builder(spark, sf)
            path = os.path.join(plans_dir, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(explain_formatted(df))
            print(f"{name}: plan -> {path}")
        if n == 0:
            continue
        runs = []
        for _ in range(n):
            t0 = time.time()
            df = builder(spark, sf)
            try:
                _ = len(df.toPandas())
            except Exception:  # noqa: BLE001
                _ = len(df.collect())
            runs.append(round(time.time() - t0, 3))
        line = f"{name}: runs={runs} min={min(runs)}"
        if use_noop:
            nruns = []
            for _ in range(n):
                t0 = time.time()
                df = builder(spark, sf)
                df.write.format("noop").mode("overwrite").save()
                nruns.append(round(time.time() - t0, 3))
            line += f" noop_runs={nruns} noop_min={min(nruns)}"
        print(line)
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
