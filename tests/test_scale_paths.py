"""Scale-path differential: at 100 TB AQE stops broadcasting and the
fact-fact joins run as sort-merge joins. Force that path locally
(autoBroadcastJoinThreshold = -1 strips both AQE's and our explicit
broadcast hints' effect on sizes — hints are still honored, so pick
queries whose fact-fact join carries no hint) and require the results
to be identical to the small-scale broadcast plans."""

from __future__ import annotations

import pytest

from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

# queries with an unhinted fact-fact join that flips to SMJ
_QUERIES = ["q3_top_orders", "q5_region_revenue", "q12_status_priority",
            "q13_customer_distribution", "q21_waiting_orders",
            "dedup_incremental_new_batch",
            # round 4: orphan audit (anti joins), ordered funnel
            # (frontier joins), cohort matrix (customer-keyed join)
            "audit_referential_integrity", "funnel_view_click_purchase",
            "orders_retention_cohort",
            # round 4 session 2: CDC full-outer diff, basket self-join
            "cdc_diff_user_value", "assoc_rules_event_pairs",
            # round 6: the 50%-hot-key salted join+rollup — with
            # broadcasts off the salted (hk, __salt) join runs as SMJ
            # and must still equal the plain-join oracle path
            "skew_hot_key_rollup",
            # round 10: every entry whose customer/supplier-scaled
            # broadcast hint was dropped (r9 verdict item 2) — the
            # 100 TB shuffle path must reproduce the broadcast path
            "q7_volume_shipping", "q10_returned_revenue",
            "q18_large_volume_orders", "q8_market_share"]
            # (token_budget_selection is deliberately absent: its only
            # joins are the hinted 1-row verdict broadcasts, so no SMJ
            # exists to flip to — broadcast-independence is covered by
            # the oracle differential at adversarial shuffle counts)


_THRESHOLD_KEYS = (
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
)


@pytest.fixture()
def no_broadcast(spark):
    old = {}
    for key in _THRESHOLD_KEYS:
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, "-1")
    yield
    for key, value in old.items():
        if value is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, value)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", _QUERIES)
def test_smj_path_matches_broadcast_path(name, spark, sf_dir, no_broadcast):
    entry = CATALOG[name]
    df = entry.spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, f"{name}: expected the SMJ scale path\n{plan}"
    smj_rows = _rows(df)

    for key in _THRESHOLD_KEYS:
        spark.conf.set(key, "10MB")
    bc_rows = _rows(entry.spark_fn(spark, sf_dir))
    assert smj_rows == bc_rows, f"{name}: SMJ path diverges from broadcast path"


# ---------------------------------------------------------------------------
# Runtime bloom-filter join pruning: at 100 TB a selective dim filter
# should prune the fact scan's shuffle rows BEFORE the join, via the
# bloom filter Spark injects on the fact side (InjectRuntimeFilter).
# The production thresholds (creation side <= 10MB, application scan
# >= 10GB) are sane for a cluster; the test lowers the application
# threshold to force injection at toy scale and asserts (a) the filter
# lands in the plan and (b) results are unchanged.
# ---------------------------------------------------------------------------


@pytest.fixture()
def force_bloom(spark, no_broadcast):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {}
    for key, value in keys.items():
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, value)
    yield
    for key, value in old.items():
        if value is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, value)


def test_runtime_bloom_filter_injects_and_preserves_results(spark, sf_dir, force_bloom):
    """Selective filter on orders + shuffle join to lineitem: the
    bloom filter built from the filtered orders keys must appear on
    the lineitem side, and the join result must be unchanged."""
    from pyspark.sql import functions as F

    from usgs_earthquake_data_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count("*").alias("n"))

    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom" in plan.lower(), "runtime bloom filter was not injected"

    expected = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders").filter(
                F.col("o_orderpriority") == "1-URGENT"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    got = joined.collect()
    assert got[0]["n"] == expected
