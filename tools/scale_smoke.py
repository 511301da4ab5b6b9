"""Scale smoke probe (~sf1): run the registry at 10x the largest fixture.

The driver fixtures stop at sf0.1; several scale failure modes
(driver-side collects that grow with the corpus, bitmap/matrix
allocations, per-group state blowups, shuffle-partition sizing) only
bite as data grows.  This tool manufactures a ~sf1 dataset by
replicating the sf0.1 FACT tables 10x with per-copy key shifts (all
key columns in a copy shift by the same delta, so every intra-copy
equijoin still lines up; dims region/nation/supplier/part stay single
— exactly how dims behave at real scale) and runs every registry op
against it, reporting wall-clock and failures.

This is a perf/robustness probe, NOT a correctness fixture — oracle
comparison stays on the driver-generated testdata (TESTDATA.md).

Usage:
    python tools/scale_smoke.py [--copies 10] [--only op1,op2] [--top N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF = "/root/testdata/sf0.1"

#: fact table -> columns shifted by copy_index * KEY_STRIDE (keys that
#: must stay coherent within a copy share the stride).
FACTS = {
    "customer": ("c_custkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
DIMS = ("region", "nation", "supplier", "part")

KEY_STRIDE = 1_000_000_000


def build_dataset(spark, copies: int) -> str:
    out_dir = f"/tmp/sswh_scale_smoke/x{copies}"
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import functions as F

    for name in DIMS:
        spark.read.parquet(os.path.join(SRC_SF, f"{name}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{name}.parquet"))
    for name, keys in FACTS.items():
        df = spark.read.parquet(os.path.join(SRC_SF, f"{name}.parquet"))
        rep = df.withColumn(
            "__copy", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
        )
        for k in keys:
            rep = rep.withColumn(
                k, F.col(k) + F.col("__copy").cast("long") * KEY_STRIDE
            )
        rep.drop("__copy").write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    open(marker, "w").close()
    return out_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--only", default=None)
    ap.add_argument("--top", type=int, default=0, help="run only the N slowest (by BENCH.json)")
    ap.add_argument(
        "--defer",
        default=None,
        help="comma list of ops moved to the END of the sweep, run after a "
        "session-wide clearCache() — separates executor-memory pressure "
        "from host noise on the quadratic ground-truth tiers (VERDICT r6 "
        "item 4: dedup_cluster measured 516 s in-sweep vs 338 s standalone "
        "at ~sf3)",
    )
    args = ap.parse_args()

    from shared_solar_data_warehouse_spark.registry import REGISTRY, load_all_ops
    from shared_solar_data_warehouse_spark.session import get_session

    load_all_ops()
    spark = get_session("sswh-scale-smoke")
    sf_dir = build_dataset(spark, args.copies)
    print(f"dataset: {sf_dir}", flush=True)

    names = sorted(REGISTRY)
    if args.only:
        names = args.only.split(",")
    elif args.top:
        try:
            with open(os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), "BENCH.json")) as fh:
                cost = json.load(fh)["queries"]
            names = sorted(names, key=lambda n: -cost.get(n, 0.0))[: args.top]
        except (OSError, ValueError, KeyError):
            # Missing, malformed, or queries-less BENCH.json all mean the
            # same thing here: no cost hints — fall back to plain order.
            names = names[: args.top]

    # --defer tokens: strip whitespace ('a, b' must still match), validate
    # against REGISTRY up front (a typo should fail here, not as a KeyError
    # mid-sweep), and intersect with the --only/--top selection so deferring
    # never widens the run list (ADVICE r7).
    deferred = [t.strip() for t in args.defer.split(",") if t.strip()] if args.defer else []
    unknown = [t for t in deferred if t not in REGISTRY]
    if unknown:
        ap.error(f"--defer names not in REGISTRY: {unknown}")
    name_set = set(names)
    deferred = [t for t in deferred if t in name_set]
    if deferred:
        names = [n for n in names if n not in deferred]

    timings, failures = {}, {}
    for name in list(names) + ["__defer_barrier__"] * bool(deferred) + deferred:
        if name == "__defer_barrier__":
            spark.catalog.clearCache()
            print("-- clearCache(); deferred tier starts --", flush=True)
            continue
        started = time.time()
        try:
            df = REGISTRY[name].builder(spark, sf_dir)
            n = df.count()
            secs = round(time.time() - started, 2)
            timings[name] = secs
            print(f"ok   {name:32s} {secs:7.2f}s rows={n}", flush=True)
        except Exception as exc:  # noqa: BLE001
            failures[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"FAIL {name:32s} {failures[name]}", flush=True)
    total = round(sum(timings.values()), 1)
    print(
        json.dumps(
            {
                "metric": "scale_smoke_total_sec",
                "value": total,
                "copies": args.copies,
                "n_ok": len(timings),
                "n_fail": len(failures),
                "failures": failures,
                "slowest": dict(
                    sorted(timings.items(), key=lambda kv: -kv[1])[:15]
                ),
            }
        )
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
