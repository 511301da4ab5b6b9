"""Operator registry — the single source of truth for the graded surface.

Each operator from SURVEY.md §2 registers itself with the ``@op``
decorator, declaring its PySpark builder and (when SQL-expressible) the
DuckDB oracle SQL next to each other.  ``__spark_entry__.queries()`` /
``oracle_sql()`` derive from this registry, which keeps the driver
contract file trivial and the inventory greppable against SURVEY.md §2.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB ANSI SQL, or None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Op] = {}

#: Modules that register operators on import (SURVEY.md §7.0 layout).
_OP_MODULES = (
    "shared_solar_data_warehouse_spark.sources.io",
    "shared_solar_data_warehouse_spark.operators.relational",
    "shared_solar_data_warehouse_spark.operators.aggregates",
    "shared_solar_data_warehouse_spark.operators.windows",
    "shared_solar_data_warehouse_spark.functions.scalar",
    "shared_solar_data_warehouse_spark.operators.timeseries",
    "shared_solar_data_warehouse_spark.operators.text",
    "shared_solar_data_warehouse_spark.operators.dedup",
    "shared_solar_data_warehouse_spark.operators.graph",
    "shared_solar_data_warehouse_spark.operators.similarity",
    "shared_solar_data_warehouse_spark.operators.udfs",
    "shared_solar_data_warehouse_spark.operators.multimodal",
    "shared_solar_data_warehouse_spark.operators.sql_entry",
    "shared_solar_data_warehouse_spark.operators.etl",
    "shared_solar_data_warehouse_spark.streaming.streams",
)


def op(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""
) -> Callable[[Builder], Builder]:
    """Register a builder under ``name``; returns the builder unchanged.

    The builder must be a pure function of (spark, sf_dir) — no globals,
    no cached state — and must alias every computed column to the same
    lower_snake_case name the oracle SQL uses (SURVEY.md §3.5, §5.4).
    """

    def register(builder: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate op name: {name}")
        REGISTRY[name] = Op(
            name=name,
            builder=builder,
            oracle=oracle.strip() if oracle else None,
            tags=tuple(tags),
            doc=doc or (builder.__doc__ or ""),
        )
        return builder

    return register


def load_all_ops() -> dict[str, Op]:
    """Import every operator module (idempotent) and return the registry."""
    for module in _OP_MODULES:
        try:
            importlib.import_module(module)
        except ModuleNotFoundError as exc:
            # Tolerate not-yet-written modules during incremental build,
            # but never swallow a typo inside an existing module.
            if exc.name and not exc.name.startswith("shared_solar_data_warehouse_spark"):
                raise
    return REGISTRY


def queries() -> dict[str, Builder]:
    load_all_ops()
    return {name: o.builder for name, o in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    load_all_ops()
    return {name: o.oracle for name, o in REGISTRY.items() if o.oracle is not None}
