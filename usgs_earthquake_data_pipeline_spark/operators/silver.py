"""Silver-layer aggregations over the canonical USGS events table —
the reference's analytical heart (A1-A4,
/root/reference/usgs_tsunami_count_fact_silver.py:31-55,116-124).

Each is a DataFrame function over a bronze events DataFrame; the
``build_silver_layer`` orchestrator writes both fact tables
partitioned exactly like the reference (year / year+month).
Plans at scale: partial-agg → single shuffle on the (tiny) group
keys → final agg; the write range-partitions on the partition
columns so each Hive partition gets few large files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sinks import save_partitioned_table


def count_events_in_year(events: DataFrame, year: int) -> DataFrame:
    """A1: ungrouped count with a partition-column filter
    (SELECT COUNT(*) ... WHERE year=N)."""
    return events.filter(F.col("year") == year).agg(F.count("*").alias("cnt"))


def count_events_by_year(events: DataFrame) -> DataFrame:
    """A2: count of all events grouped by year. (The reference's SQL
    mistakenly aliases ``year`` as the count column — the *intent*,
    events-per-year, is what we implement.)"""
    return events.groupBy("year").agg(F.count("*").alias("cnt")).orderBy("year")


def fact_tsunami_yearly(events: DataFrame) -> DataFrame:
    """A3: yearly tsunami fact (filter flag → group year → count →
    order)."""
    return (
        events.filter(F.col("tsunami") == 1)
        .groupBy("year")
        .agg(F.count("*").alias("tsunami_yearly_count"))
        .orderBy("year")
    )


def fact_tsunami_monthly(events: DataFrame) -> DataFrame:
    """A4: monthly tsunami fact."""
    return (
        events.filter(F.col("tsunami") == 1)
        .groupBy("year", "month")
        .agg(F.count("*").alias("tsunami_monthly_count"))
        .orderBy("year", "month")
    )


# SQL-string twins of A1-A4 (SURVEY §7: "as both DataFrame API and
# spark.sql strings") — run with events registered as a view:
#   events_df.createOrReplaceTempView("usgs_events")
#   spark.sql(SILVER_SQL["fact_tsunami_yearly"])
SILVER_SQL = {
    "count_in_year": (
        "SELECT COUNT(*) AS cnt FROM usgs_events WHERE year = {year}"
    ),
    "count_by_year": (
        "SELECT year, COUNT(*) AS cnt FROM usgs_events GROUP BY year ORDER BY year"
    ),
    "fact_tsunami_yearly": (
        "SELECT year, COUNT(*) AS tsunami_yearly_count FROM usgs_events "
        "WHERE tsunami = 1 GROUP BY year ORDER BY year"
    ),
    "fact_tsunami_monthly": (
        "SELECT year, month, COUNT(*) AS tsunami_monthly_count FROM usgs_events "
        "WHERE tsunami = 1 GROUP BY year, month ORDER BY year, month"
    ),
}


def build_silver_layer(
    events: DataFrame, yearly_path: str, monthly_path: str
) -> tuple[DataFrame, DataFrame]:
    """Compute and persist both silver fact tables (overwrite mode,
    partitioned by year / year+month — reference
    usgs_tsunami_count_fact_silver.py:57-72,127-142)."""
    yearly = fact_tsunami_yearly(events)
    monthly = fact_tsunami_monthly(events)
    save_partitioned_table(
        yearly, yearly_path, mode="overwrite", partition_cols=["year"],
        skip_empty=False,
    )
    save_partitioned_table(
        monthly, monthly_path, mode="overwrite", partition_cols=["year", "month"],
        skip_empty=False,
    )
    return yearly, monthly
