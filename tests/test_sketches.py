"""Accuracy bounds for the sketch operators (rows-only catalog
entries): the approximate answers must stay within their advertised
error of the exact ones."""

from __future__ import annotations

from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in CATALOG["sketch_distinct_users"].spark_fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, n in exact.items():
        # rsd=1%; allow 5 standard deviations
        assert abs(approx[k] - n) <= max(5, 0.05 * n), (k, approx[k], n)


def test_approx_quantiles_within_rank_error(spark, sf_dir):
    rows = CATALOG["sketch_value_quantiles"].spark_fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    for r in rows:
        et = r["event_type"]
        values = sorted(
            x["value"]
            for x in ev.filter(F.col("event_type") == et).select("value").collect()
        )
        n = len(values)
        for q, got in zip((0.5, 0.9, 0.99), r["approx_p50_p90_p99"]):
            # percentile_approx guarantees rank error <= n/accuracy;
            # translate to a value window around the target rank
            eps = max(1, n // 10000 + 1)
            lo = values[max(0, int(q * n) - eps - 1)]
            hi = values[min(n - 1, int(q * n) + eps)]
            assert lo <= got <= hi, (et, q, got, lo, hi)
