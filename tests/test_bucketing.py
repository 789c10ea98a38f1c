"""Bucketed co-located join: two tables bucketed by the join key into
the same bucket count must join with no shuffle on either side — the
persisted-layout optimization a 100 TB deployment relies on for
recurring fact-fact joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.sinks import write_bucketed_table
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(
        orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"],
        path=str(base / "orders"),
    )
    write_bucketed_table(
        li, "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"],
        path=str(base / "lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ot, lt = bucketed_tables
    orders = spark.table(ot)
    li = spark.table(lt)
    # force the sort-merge path so the bucketed layout (not a
    # broadcast) is what eliminates the exchanges
    joined = li.hint("merge").join(orders, li.l_orderkey == orders.o_orderkey)
    agg = joined.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # the downstream agg shuffles only its group keys, not the join key:
    # exactly one exchange, hash-partitioned on o_orderstatus
    agg_plan = agg._jdf.queryExecution().executedPlan().toString()
    assert agg_plan.count("Exchange") == 1, agg_plan
    assert "hashpartitioning(o_orderstatus" in agg_plan, agg_plan
    agg.collect()


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    bucketed = (
        spark.table(lt)
        .hint("merge")
        .join(spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert bucketed == plain


def test_invalid_mode_raises(spark, sf_dir):
    with pytest.raises(ValueError, match="Invalid mode"):
        write_bucketed_table(
            load_table(spark, sf_dir, "orders"), "b_bad", ["o_orderkey"], 4,
            mode="replace",
        )
