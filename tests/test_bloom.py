"""Bloom-prefilter semi join tests: no false negatives ever, exact
result parity with the plain semi join, survivor-count bounds, and
the plan property that the bloom predicate filters the probe BEFORE
the join's exchange (the whole point at 100 TB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.operators.bloom import (
    bloom_might_contain,
    bloom_prefilter_semi_join,
    build_bloom_bitmap,
)


@pytest.fixture(scope="module")
def keyed(spark):
    probe = spark.range(0, 20_000).select(F.col("id").alias("pk"))
    build = spark.range(0, 20_000, 41).select(F.col("id").alias("bk"))
    return probe, build


def test_no_false_negatives(spark, keyed):
    # every build key must pass its own bloom — definitional
    _, build = keyed
    bm = build_bloom_bitmap(build, "bk", m_bits=1 << 14)
    missed = build.filter(~bloom_might_contain(F.col("bk"), bm, 1 << 14)).count()
    assert missed == 0


def test_semi_join_parity(spark, keyed):
    probe, build = keyed
    got = bloom_prefilter_semi_join(probe, build, "pk", "bk", m_bits=1 << 14)
    want = probe.join(build, probe["pk"] == build["bk"], "left_semi")
    assert sorted(r.pk for r in got.collect()) == sorted(
        r.pk for r in want.collect()
    )


def test_survivors_bounded_between_exact_and_total(spark, keyed):
    probe, build = keyed
    bm = build_bloom_bitmap(build, "bk", m_bits=1 << 14)
    survivors = probe.filter(
        bloom_might_contain(F.col("pk"), bm, 1 << 14)
    ).count()
    exact = probe.join(build, probe["pk"] == build["bk"], "left_semi").count()
    total = probe.count()
    assert exact <= survivors <= total
    # at ~2.4% selectivity and a 16k-bit bloom the prefilter must do
    # real work: well under half the probe may survive
    assert survivors < total / 2


def test_null_keys_filtered(spark):
    probe = spark.createDataFrame(
        [(1,), (None,), (2,)], "pk long"
    )
    build = spark.createDataFrame([(1,), (2,)], "bk long")
    got = bloom_prefilter_semi_join(probe, build, "pk", "bk", m_bits=1 << 10)
    assert sorted(r.pk for r in got.collect()) == [1, 2]


def test_saturated_bloom_still_exact(spark):
    # bloom too small for the key count -> every bit set -> filter
    # passes everything; the join must still produce the exact result
    probe = spark.range(0, 5_000).select(F.col("id").alias("pk"))
    build = spark.range(0, 5_000, 2).select(F.col("id").alias("bk"))
    got = bloom_prefilter_semi_join(probe, build, "pk", "bk", m_bits=64)
    assert got.count() == 2_500


def test_rejects_bad_parameters(spark, keyed):
    _, build = keyed
    with pytest.raises(ValueError):
        build_bloom_bitmap(build, "bk", m_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        build_bloom_bitmap(build, "bk", m_bits=1 << 10, k=0)
    with pytest.raises(ValueError):
        bloom_might_contain(F.col("bk"), [0, 0], m_bits=1 << 10)


def test_bitmap_is_fixed_size(spark, keyed):
    _, build = keyed
    bm = build_bloom_bitmap(build, "bk", m_bits=1 << 14)
    assert len(bm) == (1 << 14) // 64
    assert all(isinstance(w, int) for w in bm)


def test_bloom_filter_sits_below_the_join_exchange(spark, keyed):
    # the bloom predicate must be an ordinary Filter in the probe's
    # scan stage — i.e. appear UNDER the semi join in the plan — so
    # the shuffle only carries survivors.  A plan that filters after
    # the join (or not at all) defeats the operator.
    probe, build = keyed
    plan = bloom_prefilter_semi_join(
        probe, build, "pk", "bk", m_bits=1 << 14
    )._jdf.queryExecution().executedPlan().toString()
    join_at = plan.find("LeftSemi")
    assert join_at != -1, plan
    below = plan[join_at:]
    assert "Filter" in below and "xxhash64" in below, plan
