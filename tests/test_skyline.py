"""Grouped skyline (catalog entry ``skyline_parts_per_brand``): the
window-based O(n log n) plan must equal brute-force Pareto dominance
on arbitrary generated point sets."""

from __future__ import annotations

import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

_POINTS = st.lists(
    st.tuples(
        st.sampled_from(["B1", "B2"]),
        st.integers(min_value=0, max_value=8),  # price (small grid → ties)
        st.integers(min_value=0, max_value=8),  # size
    ),
    min_size=1,
    max_size=30,
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _py_skyline(points):
    pts = {(b, float(p), s) for b, p, s in points}
    out = set()
    for b, p, s in pts:
        dominated = any(
            b2 == b and p2 <= p and s2 >= s and (p2 < p or s2 > s)
            for b2, p2, s2 in pts
        )
        if not dominated:
            out.add((b, p, s))
    return out


@given(points=_POINTS)
@_SETTINGS
def test_skyline_matches_bruteforce(spark, points):
    df = spark.createDataFrame(
        [(i, f"part{i}", b, "t", s, float(p)) for i, (b, p, s) in enumerate(points)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    d = tempfile.mkdtemp(prefix="skyline_")
    df.write.mode("overwrite").parquet(os.path.join(d, "part.parquet"))
    got = {
        (r.brand, r.price, r.size)
        for r in CATALOG["skyline_parts_per_brand"].spark_fn(spark, d).collect()
    }
    assert got == _py_skyline(points)


def test_skyline_members_undominated_at_sf(spark, sf_dir):
    rows = CATALOG["skyline_parts_per_brand"].spark_fn(spark, sf_dir).collect()
    by_brand: dict[str, list] = {}
    for r in rows:
        by_brand.setdefault(r.brand, []).append((r.price, r.size))
    for pts in by_brand.values():
        # frontier property: sorted by price, sizes strictly INCREASE
        # (a higher price is only on the frontier if it buys more size)
        pts.sort()
        for (p1, s1), (p2, s2) in zip(pts, pts[1:]):
            assert p2 > p1 and s2 > s1, (pts,)
