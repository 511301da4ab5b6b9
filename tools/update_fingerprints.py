"""Snapshot op fingerprints for driver-coverage invalidation.

Run at ROUND START — right after the driver writes CORRECTNESS_r{N}.json
and before this round's edits — so each recorded fingerprint is the
source the driver actually verified (ADVICE r02: registry.py
driver_covered() treats a green row as valid only while the op's
current fingerprint matches the record here).

Update rule per op that has ever been driver-green:
  * no record yet            -> record the current fingerprint
  * record matches current   -> keep
  * record differs           -> update ONLY if the op is green in the
    LATEST correctness round (the driver just re-verified the edited
    source); otherwise keep the stale record so the op stays
    "uncovered" and rotates back into the driver's sample window.

Ops never driver-green carry no record — they are uncovered by
definition.  Records for ops that left the registry are dropped.

CLI: python tools/update_fingerprints.py  (writes OP_FINGERPRINTS.json)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shared_solar_data_warehouse_spark.registry import (  # noqa: E402
    REGISTRY,
    _is_green_row,
    _recorded_fingerprints,
    _repo_root,
    driver_green,
    load_all_ops,
    op_fingerprint,
)


def _latest_round_green() -> set[str]:
    paths = glob.glob(os.path.join(_repo_root(), "CORRECTNESS_r*.json"))
    if not paths:
        return set()

    def round_no(p: str) -> int:
        m = re.search(r"_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    latest = max(paths, key=round_no)
    try:
        with open(latest) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        return set()
    return {name for name, row in data.items() if _is_green_row(row)}


def main() -> int:
    load_all_ops()
    recorded = _recorded_fingerprints()
    latest_green = _latest_round_green()
    out: dict[str, str] = {}
    n_new = n_kept = 0
    updated: list[str] = []
    stale: list[str] = []
    for name in sorted(driver_green()):
        if name not in REGISTRY:
            continue
        cur = op_fingerprint(REGISTRY[name])
        rec = recorded.get(name)
        if rec is None:
            out[name] = cur
            n_new += 1
        elif rec == cur:
            out[name] = cur
            n_kept += 1
        elif name in latest_green:
            out[name] = cur
            updated.append(name)
        else:
            out[name] = rec  # changed since green, not re-verified: stays invalid
            stale.append(name)
    path = os.path.join(_repo_root(), "OP_FINGERPRINTS.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"{len(out)} records -> {path} "
        f"(new={n_new} kept={n_kept} updated={len(updated)} stale={len(stale)})"
    )
    # Name the re-stamped ops: an "updated" entry is only correct for
    # source the driver actually verified.  Run at round start, the list
    # is exactly the previous round's re-verified edits; run MID-round,
    # an op edited after its latest-round green gets its NEW source
    # stamped as green — seeing its name here is the tripwire to
    # `git checkout -- OP_FINGERPRINTS.json` and re-run at the right time.
    if updated:
        print(f"  re-stamped (green in latest round, source changed): {updated}")
    if stale:
        print(f"  kept stale (edited since green, NOT re-verified): {stale}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
