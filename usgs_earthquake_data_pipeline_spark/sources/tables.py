"""Loaders for the driver-provided synthetic tables (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. These are
the correctness/bench inputs; the ``events`` table stands in for the
USGS events fact table where a timestamped table is needed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..session import configure_runtime

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_runtime(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {
        name: load_table(spark, sf_dir, name)
        for name in TABLE_NAMES
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet"))
    }


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so queries can use spark.sql."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
