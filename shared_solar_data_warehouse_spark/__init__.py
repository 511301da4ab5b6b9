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

from shared_solar_data_warehouse_spark.registry import (  # noqa: F401
    REGISTRY,
    load_all_ops,
    op,
    oracle_sql,
    queries,
)

__version__ = "0.1.0"
