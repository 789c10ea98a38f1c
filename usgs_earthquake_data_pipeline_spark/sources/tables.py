"""Loaders for the driver-provided synthetic tables (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. These are
the correctness/bench inputs; the ``events`` table stands in for the
USGS events fact table where a timestamped table is needed.

``events.parquet`` stores its ``ts`` column as parquet
``TIMESTAMP(NANOS)``, which Spark reads only as bigint nanoseconds
(with ``spark.sql.legacy.parquet.nanosAsLong=true``, set by
``session.configure_runtime``). :func:`load_table` converts it back to
a microsecond timestamp with integer division (``ts div 1000``) —
never float division, which loses precision above 2^53 ns — matching
DuckDB's own nanos→micros truncation so oracle comparisons agree.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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

# table -> columns read back as bigint nanos that must become timestamps
_NANOS_TIMESTAMP_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_runtime(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TIMESTAMP_COLS.get(name, []):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every available table. Genuinely absent files are skipped
    (smaller scale factors ship fewer tables); a file that exists but
    fails to load raises immediately — swallowing it would surface
    later as a confusing "table not found" far from the root cause."""
    tables: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        tables[name] = load_table(spark, sf_dir, name)
    return tables


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so queries can use spark.sql."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
