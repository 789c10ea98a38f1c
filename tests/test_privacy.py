"""Privacy entries: deterministic-Laplace DP release and the
l-diversity audit."""

from __future__ import annotations

import hashlib
import math

from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG


def _py_laplace(key: str, b: float = 10.0, m: int = 1 << 20) -> float:
    h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % m
    u = (h + 0.5) / m
    s = (u > 0.5) - (u < 0.5)
    return -b * s * math.log(1 - 2 * abs(u - 0.5))


def test_dp_noise_matches_reference_and_is_stable(spark, sf_dir):
    rows = CATALOG["dp_noisy_counts_by_type"].spark_fn(spark, sf_dir).collect()
    again = CATALOG["dp_noisy_counts_by_type"].spark_fn(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]  # auditable
    from usgs_earthquake_data_pipeline_spark.sources.tables import load_table

    exact = {
        r.event_type: r.c
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "c")
        .collect()
    }
    for r in rows:
        want = round(exact[r.event_type] + _py_laplace(r.event_type), 6)
        assert abs(r.noisy_count - want) < 1e-6, (r.event_type,)
        # Laplace(b=10): |noise| < b * ln(m) ≈ 139 — sane release
        assert abs(r.noisy_count - exact[r.event_type]) < 139


def test_l_diversity_flags_match_group_contents(spark, sf_dir):
    rows = CATALOG["l_diversity_audit"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_sensitive <= r.group_size
        assert r.violates_l == (r.n_sensitive < 3)


def test_k_anon_ladder_picks_finest_satisfying_level(spark, sf_dir):
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    rows = (
        CATALOG["k_anon_generalize_ladder"].spark_fn(spark, sf_dir).collect()
    )
    assert [r.level for r in rows] == ["day", "week", "month"]
    # coarsening monotonicity: groups shrink in number, min size grows
    assert rows[0].n_groups >= rows[1].n_groups >= rows[2].n_groups
    assert rows[0].min_group <= rows[1].min_group <= rows[2].min_group
    # exactly one chosen level iff any level meets k, and it is the
    # finest one that does
    meeting = [r for r in rows if r.meets_k]
    chosen = [r for r in rows if r.chosen]
    if meeting:
        assert len(chosen) == 1
        assert chosen[0].level == meeting[0].level
    else:
        assert not chosen
