"""Shared fixtures: one local SparkSession per test session, plus a
DuckDB connection with the driver's table views pre-registered —
mirroring how the correctness harness compares Spark vs oracle."""

from __future__ import annotations

import os

import duckdb
import pytest

from usgs_earthquake_data_pipeline_spark.session import get_spark
from usgs_earthquake_data_pipeline_spark.sources.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # SPARK_GRAFT_TEST_SHUFFLE lets the differential run at an
    # adversarial partition count (7, 1, 64, ...) — results must be
    # invariant to it (the driver's session uses its own defaults, so
    # any hidden dependence on partitioning/order is a latent hash
    # break). Convention: before a round snapshot, run the catalog
    # differential at least once with a non-default odd value.
    spark = get_spark(
        app_name="tests",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "8")),
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle(sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    yield con
    con.close()
