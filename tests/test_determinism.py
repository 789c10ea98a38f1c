"""Partitioning-independence: results must not depend on
spark.sql.shuffle.partitions (or, transitively, on batch/partition
boundaries). This is the invariant behind every hash-gated entry —
the EWMA and Misra-Gries designs each had a partitioning-sensitive
formulation rejected during development, and this test pins the class
for a representative cross-section of the catalog."""

from __future__ import annotations

import pytest

from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

# one representative per family with partitioning-sensitive machinery:
# windows, recursive CTE, mapInPandas summaries, grouped-pandas,
# sketch-free aggregates, lateral decorrelation, grid joins
_REPRESENTATIVES = [
    "a2_count_by_year",
    "heavy_hitters_misra_gries",      # mapInPandas batch summaries
    "ewma_daily_value_recursive",     # recursive chain
    "markov_event_transitions",       # window sequence
    "pack_sequences_2048",            # two-level cumsum
    "spatial_radius_join_100km",      # grid join
    "lateral_top_spenders_per_nation",
    "pandas_udaf_weighted_mean",      # grouped-agg UDF
    "dq_validate_events",
    "map_type_counts",            # collect_list -> map (order-insensitive reads)
    "hof_user_value_trend",       # collect_list -> array_sort pipeline
    "sliding_window_counts",      # Expand fan-out windows
]


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


@pytest.mark.parametrize("name", _REPRESENTATIVES)
def test_result_invariant_under_shuffle_partitions(name, spark, sf_dir):
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "32")
        base = _rows(CATALOG[name].spark_fn(spark, sf_dir))
        spark.conf.set(key, "7")
        alt = _rows(CATALOG[name].spark_fn(spark, sf_dir))
    finally:
        spark.conf.set(key, old)
    assert base == alt, f"{name}: result depends on shuffle partitioning"
    assert base, f"{name}: empty result makes the check vacuous"
