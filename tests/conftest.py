from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


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
