from __future__ import annotations

import os
from pathlib import Path

import pytest

FIXTURE_DIR = Path("/root/repo/.fixtures/evm")


@pytest.fixture(scope="session")
def spark():
    from apollo_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small
    spark = get_spark("apollo_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def evm_dir() -> Path:
    from apollo_spark.testing import generate_evm_fixtures

    return generate_evm_fixtures(FIXTURE_DIR)


@pytest.fixture(scope="session")
def catalog(spark, evm_dir):
    from apollo_spark.sources.tables import Catalog

    return Catalog(spark, evm_dir)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
