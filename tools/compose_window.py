"""Propose the next round's driver sample window.

The grading driver hash-verifies the first 50 rows of ``queries()``
(dict order = ``registry.driver_order()``, whose front rank is the
``_FRONTLOAD`` tuple).  A stale ``_FRONTLOAD`` makes the driver
re-sample already-green ops and the round produces zero new evidence
— VERDICT r6 called that "the one genuine landmine in the repo".

This tool prints the window a fresh round SHOULD carry:

1. **stale re-verifies** — ops with a past driver-green row whose
   current source fingerprint no longer matches the recorded one
   (every op edited since its green round MUST cycle first, or its
   record stays invalid), and
2. **never-sampled picks** — ops with no driver record at all,
   cheapest first by BENCH.json so more fit the driver's per-round
   time budget,

capped at 50 total.  Paste the emitted tuple into
``registry._FRONTLOAD`` at round start, then re-run this tool to
confirm ``driver_order()[:50]`` matches.

The stale-re-verify set is MANDATORY (a differing window that misses
one is a bug); the never-sampled picks are a cheapest-first DEFAULT —
a verdict that names priority families (as r6 item 1 named the core
ts_*/win_*/agg_* domains for round 7) overrides cost order, so a
"current window differs" report on that half is informational, not an
error.

Once the registry is fully driver-verified (round 9 closes the book),
``--fill-oldest`` pads the window past the mandatory set with depth
re-verification picks — valid-green ops ordered by the age of their
latest green round (cost tie-break), skipping the 4 oracle-less
rows-only ops whose driver check is weaker by design.  At ~50/round
the whole 375-op registry re-verifies every ~7.5 rounds without ever
editing op code.

Usage:
    python tools/compose_window.py [--window 50] [--fill-oldest]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _latest_green_rounds(repo_root: str) -> dict[str, int]:
    """op -> the LAST round whose CORRECTNESS_r*.json recorded it green
    (registry._is_green_row is the shared criterion).  Drives the
    ``--fill-oldest`` rotation: once every op is driver-verified, depth
    re-verification should spend slots on the rows whose evidence is
    oldest, keeping every record's age bounded."""
    import glob
    import json
    import re

    from shared_solar_data_warehouse_spark.registry import _is_green_row

    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if _is_green_row(row):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument(
        "--fill-oldest",
        action="store_true",
        help="pad the proposed window to --window rows with depth "
        "re-verification picks once the mandatory stale+never set no "
        "longer fills it: valid-green ops, oldest latest-green round "
        "first (bench-cost tie-break), skipping the oracle-less "
        "rows-only ops — a hash-checkable op always spends the slot "
        "better (the round-10+ maintenance rotation, PLANS.md r9)",
    )
    args = ap.parse_args()

    from shared_solar_data_warehouse_spark.registry import (
        REGISTRY,
        _FRONTLOAD,
        _bench_cost,
        driver_covered,
        driver_green,
        driver_order,
        load_all_ops,
    )

    load_all_ops()
    covered = driver_covered()
    green = set(driver_green())
    cost = _bench_cost()

    # Green-once but fingerprint-stale: must re-verify before anything else.
    # Restrict to names still in REGISTRY — past CORRECTNESS rows can name
    # removed/renamed ops (driver_covered() skips unknown names), and a
    # phantom entry would waste a window slot (ADVICE r7).
    stale = sorted(n for n in green if n not in covered and n in REGISTRY)
    phantoms = sorted(n for n in green if n not in REGISTRY)
    # Never driver-sampled at all.
    never = sorted(
        (n for n in REGISTRY if n not in green),
        key=lambda n: (cost.get(n, 0.5), n),
    )

    window = (stale + [n for n in never if n not in stale])[: args.window]

    if args.fill_oldest and len(window) < args.window:
        from shared_solar_data_warehouse_spark.registry import _repo_root

        latest = _latest_green_rounds(_repo_root())
        in_window = set(window)
        fillable = sorted(
            (
                n
                for n in covered
                if n not in in_window
                and getattr(REGISTRY.get(n), "oracle", None) is not None
            ),
            key=lambda n: (latest.get(n, 0), cost.get(n, 0.5), n),
        )
        fill = fillable[: args.window - len(window)]
        window = window + fill
        if fill:
            ages = sorted({latest.get(n, 0) for n in fill})
            print(
                f"fill-oldest: {len(fill)} depth re-verifies from green "
                f"rounds {ages} (oldest first, cost tie-break)"
            )

    if phantoms:
        print(
            f"note: {len(phantoms)} green names no longer in REGISTRY "
            f"(ignored): {phantoms}"
        )
    if len(stale) > args.window:
        # The stale set is MANDATORY; a window that cannot hold it means
        # some invalidated ops stay unverified this round (ADVICE r7).
        print(
            f"ERROR: {len(stale)} mandatory stale re-verifies exceed the "
            f"{args.window}-row window — {len(stale) - args.window} dropped: "
            f"{stale[args.window:]}",
            file=sys.stderr,
        )
        return 1

    print(f"registry: {len(REGISTRY)} ops")
    print(f"driver-green (valid): {len(covered)}")
    print(f"stale re-verifies (edited since green): {len(stale)}")
    print(f"never-sampled remaining: {len(never)}")
    print(f"\nproposed window ({len(window)}):")
    print("_FRONTLOAD: tuple[str, ...] = (")
    for n in window:
        print(f'    "{n}",')
    print(")")

    # Duplicates can't change set membership, so check unconditionally —
    # inside the differs-branch they'd go unflagged exactly when the
    # window otherwise matches (ADVICE r7).
    if len(_FRONTLOAD) != len(set(_FRONTLOAD)):
        print("WARNING: _FRONTLOAD has duplicate entries")

    current = driver_order()[: args.window]
    if set(current) == set(window):
        print("\ncurrent _FRONTLOAD window already matches the proposal.")
    else:
        gone = sorted(set(current) - set(window))
        new = sorted(set(window) - set(current))
        print(f"\ncurrent window differs — drop {len(gone)}: {gone[:10]}...")
        print(f"add {len(new)}: {new[:10]}...")
    return 0


if __name__ == "__main__":
    sys.exit(main())
