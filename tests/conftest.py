"""Shared test fixtures: ONE SparkSession for the whole run (session
startup is ~10 s; per-test sessions would dominate runtime)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from shared_solar_data_warehouse_spark.session import get_session

    return get_session("sswh-tests")


@pytest.fixture(scope="session")
def registry():
    from shared_solar_data_warehouse_spark.registry import REGISTRY, load_all_ops

    load_all_ops()
    return REGISTRY
