"""PySpark-native analytics engine with the query/data-processing
capabilities of SEL-Columbia/shared_solar_data_warehouse.

Provenance note: the reference checkout at /root/reference is EMPTY
(verified 2026-08-13, see SURVEY.md §0) — no file:line citations into it
are possible. The operative contract is SURVEY.md §2 (operator inventory)
plus the driver harness in __spark_entry__.py; the reference's domain
(prepaid shared-solar micro-grid usage logs: per-circuit power/energy
readings, credit accounting, load profiles) is reconstructed from public
knowledge and drives the §2.8 time-series operator family.

Design: everything is DataFrame/SQL so Catalyst optimizes it; Python
UDFs only where built-ins genuinely can't express the semantics (and
then Arrow-batched pandas UDFs, never row-at-a-time).
"""

import os as _os
import sys as _sys

# NumPy >= 1.18 madvises MADV_HUGEPAGE on every allocation >= 4 MB.  On
# kernels with transparent_hugepage/defrag = madvise (this sandbox and
# the driver host), first-touching such an allocation triggers DIRECT
# memory compaction in process context whenever physical memory is
# fragmented — measured here as 0.37 s -> 16.8 s (45x, pure CPU) on the
# graph band's ~56 MB driver-side popcount gathers, and it recurs every
# call because freed mmap'd blocks return to the OS.  A long-lived
# Spark driver constantly fragments memory, so the stall is systematic
# under load (the r11 driver-window graph_triangle_count 5 s anomaly)
# while a quiet standalone probe looks fine.  Disable the madvise: the
# engine's numpy hot paths are gather-bound (TLB wins are negligible
# next to compaction stalls).  Respect an explicit opt-in via the env.
if _os.environ.get("NUMPY_MADVISE_HUGEPAGE") != "1":
    _os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
    if "numpy" in _sys.modules:  # imported before us: env had no effect
        for _mod in ("core", "_core"):
            try:
                getattr(
                    _sys.modules["numpy"], _mod
                ).multiarray._set_madvise_hugepage(False)
                break
            except Exception:  # noqa: BLE001 — private API, best effort
                continue

from shared_solar_data_warehouse_spark.registry import (  # noqa: F401, E402
    REGISTRY,
    load_all_ops,
    op,
    oracle_sql,
    queries,
)

__version__ = "0.1.0"
