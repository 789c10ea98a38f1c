"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in
``usgs_earthquake_data_pipeline_spark.plans.catalog``; this module is
just the thin driver-facing adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from usgs_earthquake_data_pipeline_spark.plans import catalog as _catalog
from usgs_earthquake_data_pipeline_spark.session import configure_runtime

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the star-join region-revenue rollup
    (broadcast dims + single fact-fact shuffle)."""
    configure_runtime(spark)
    return _catalog.CATALOG["q5_region_revenue"].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    LLM-pipeline extensions). Each callable takes (spark, sf_dir) and
    returns a DataFrame; computed columns are aliased to match
    ``oracle_sql``."""
    return _catalog.query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query.
    Keys absent here (but present in ``queries()``) are genuinely
    non-SQL-expressible ops → the driver records a rows-only check."""
    return _catalog.oracle_map()
