"""Plan inspection (SURVEY.md §4, §7.0 layout) — utilities for reading
the physical plans Catalyst actually produces, used by the tier-2 plan
tests and the PLANS.md regeneration CLI."""

from shared_solar_data_warehouse_spark.plans.inspect import (
    explain_formatted,
    operator_counts,
)

__all__ = ["explain_formatted", "operator_counts"]
