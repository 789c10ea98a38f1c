"""Algebraic laws of the MERGE/CDC/matview operators under
hypothesis-generated inputs: the invariants users rely on when
composing maintenance operations, checked over random tables rather
than hand-picked cases."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from usgs_earthquake_data_pipeline_spark.operators.matview import (
    merge_aggregate_state,
)
from usgs_earthquake_data_pipeline_spark.operators.merge import (
    diff_snapshots,
    merge_upsert,
)

# small key/value domains force key collisions, the interesting case
_rows = st.lists(
    st.tuples(st.integers(0, 8), st.text(alphabet="abc", min_size=1, max_size=2)),
    max_size=12,
)


def _dedup_keys(rows):
    # a keyed table has one row per key: last value wins
    return list({k: (k, v) for k, v in rows}.values())


def _df(spark, rows):
    rows = _dedup_keys(rows)
    if not rows:
        return spark.createDataFrame([], "k BIGINT, v STRING")
    return spark.createDataFrame(rows, "k BIGINT, v STRING")


def _rowset(df):
    return sorted((r.k, r.v) for r in df.collect())


@settings(max_examples=12, deadline=None)
@given(target=_rows, batch=_rows)
def test_merge_is_idempotent(spark, target, batch):
    t, b = _df(spark, target), _df(spark, batch)
    once = merge_upsert(t, b, ["k"])
    twice = merge_upsert(once, b, ["k"])
    assert _rowset(once) == _rowset(twice)


@settings(max_examples=12, deadline=None)
@given(target=_rows, b1=_rows, b2=_rows)
def test_sequential_merges_equal_last_wins_combined_batch(spark, target, b1, b2):
    """merge(merge(t, b1), b2) == merge(t, b1 <upserted by> b2)."""
    t, d1, d2 = _df(spark, target), _df(spark, b1), _df(spark, b2)
    sequential = merge_upsert(merge_upsert(t, d1, ["k"]), d2, ["k"])
    combined = merge_upsert(t, merge_upsert(d1, d2, ["k"]), ["k"])
    assert _rowset(sequential) == _rowset(combined)


@settings(max_examples=12, deadline=None)
@given(rows=_rows)
def test_diff_of_identical_snapshots_is_empty(spark, rows):
    df = _df(spark, rows)
    assert diff_snapshots(df, df, ["k"]).count() == 0


@settings(max_examples=12, deadline=None)
@given(target=_rows, batch=_rows)
def test_applying_the_diff_reconstructs_the_merge(spark, target, batch):
    """merge(t, post-images of diff(t, merge(t, b))) == merge(t, b) —
    the CDC feed is sufficient to replicate the change downstream."""
    t, b = _df(spark, target), _df(spark, batch)
    merged = merge_upsert(t, b, ["k"])
    feed = diff_snapshots(t, merged, ["k"])
    post = (
        feed.filter(feed.change_type != "delete")
        .selectExpr("k", "new_v AS v")
    )
    replicated = merge_upsert(t, post, ["k"])
    assert _rowset(replicated) == _rowset(merged)


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-50, 50)), max_size=16
    ),
    cut=st.integers(0, 16),
)
def test_matview_merge_any_split_equals_direct_aggregate(spark, rows, cut):
    import pyspark.sql.functions as F

    def partial(subset):
        if not subset:
            return spark.createDataFrame([], "k BIGINT, cnt BIGINT, s BIGINT")
        return (
            spark.createDataFrame(subset, "k BIGINT, x BIGINT")
            .groupBy("k")
            .agg(F.count("*").alias("cnt"), F.sum("x").alias("s"))
        )

    merges = {"cnt": "count", "s": "sum"}
    direct = partial(rows)
    split = merge_aggregate_state(partial(rows[:cut]), partial(rows[cut:]), ["k"], merges)
    assert sorted(tuple(r) for r in direct.collect()) == sorted(
        tuple(r) for r in split.collect()
    )
