"""Broadcast-off invariance probe: the full oracle mirror with every
auto-broadcast join demoted to a shuffle join.

One axis of the per-round execution-config invariance sweep (SURVEY
§5.5b; the other two are ``SPARK_GRAFT_CPUS=7`` and ``=1`` runs of the
mirror CLI).  ``spark.sql.autoBroadcastJoinThreshold`` is fixed at
session build time and is not a ``pin_session`` runtime conf, so this
axis needs its own JVM with the threshold pinned to ``-1`` before the
first query plans — hence a script rather than an env var.  Until
round 9 this script was reconstructed by hand each round; it is
committed so the sweep is a one-liner:

    python tools/mirror_nobroadcast.py [--sf-dir /root/testdata/sf0.01]

The session builder and the summary taxonomy are the shared ones
(``session.get_session`` with an ``extra_confs`` override and
``mirror.summarize``), so the probe cannot drift from the local[32]
record it exists to replicate.  PASS = the same 371/4/0 summary — no
registry answer may depend on join-strategy choice (the regime where
dimension tables stop fitting executor memory on a real cluster).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--verbose", "-v", action="store_true")
    ap.add_argument(
        "--expect-pass",
        type=int,
        default=371,
        help="expected PASS count; exit nonzero if the summary drifts "
        "(a 370/5 registry drift is a failure even with zero FAILING rows)",
    )
    ap.add_argument(
        "--expect-rows-only", type=int, default=4, help="expected ROWS_ONLY count"
    )
    args = ap.parse_args()

    from shared_solar_data_warehouse_spark.mirror import run_mirror, summarize
    from shared_solar_data_warehouse_spark.session import get_session

    spark = get_session(
        "sswh-nobroadcast-probe",
        extra_confs={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    # getOrCreate() can hand back a pre-existing session whose threshold
    # is NOT -1 — that would silently probe the wrong regime.  A bare
    # assert would be compiled out under `python -O`, so fail hard.
    if spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1":
        raise SystemExit(
            "session already existed with broadcasts enabled — run this "
            "script in its own process"
        )

    results = run_mirror(args.sf_dir, spark=spark, verbose=args.verbose)
    npass, nrows, bad = summarize(results)
    if bad:
        return 1
    # PASS means the SAME summary as the local[32] record, not merely
    # zero failures — a count drift (e.g. 370/5) must not read as green
    # in a scripted sweep (ADVICE r9).
    if (npass, nrows) != (args.expect_pass, args.expect_rows_only):
        print(
            f"count drift: got {npass}/{nrows}, expected "
            f"{args.expect_pass}/{args.expect_rows_only}"
        )
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
