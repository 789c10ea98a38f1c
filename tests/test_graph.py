"""PageRank operator properties on hand-computable graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.operators.graph import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    return {
        r.node: r.rank for r in pagerank(df, weight="w", **kw).collect()
    }


def test_symmetric_two_cycle_is_uniform(spark):
    """A ⇄ B passes full mass back and forth: every iteration keeps
    both ranks at exactly 1.0 (0.15 + 0.85 * 1.0)."""
    r = _ranks(spark, [("A", "B", 1.0), ("B", "A", 1.0)], iterations=3)
    assert r == {"A": 1.0, "B": 1.0}


def test_source_settles_at_one_minus_damping(spark):
    """A node with no in-edges ends at 1 - d after one iteration."""
    r = _ranks(spark, [("A", "B", 1.0)], iterations=2)
    assert r["A"] == pytest.approx(0.15)
    # B receives A's full (out-normalized) rank: 0.15 + 0.85 * 0.15
    assert r["B"] == pytest.approx(0.15 + 0.85 * 0.15)


def test_weights_split_contributions(spark):
    """One source splitting 3:1 over two targets: contributions follow
    the weight ratio exactly."""
    r = _ranks(
        spark,
        [("A", "B", 3.0), ("A", "C", 1.0)],
        iterations=1,
    )
    assert r["B"] == pytest.approx(0.15 + 0.85 * 0.75)
    assert r["C"] == pytest.approx(0.15 + 0.85 * 0.25)


def test_matches_python_reference_on_random_graph(spark):
    """Two Spark iterations equal a plain-Python reference on a seeded
    random graph."""
    import random

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(12)]
    edges = []
    for s in nodes:
        for t in rng.sample(nodes, 3):
            if s != t:
                edges.append((s, t, float(rng.randint(1, 5))))
    got = _ranks(spark, edges, iterations=2)

    outw: dict[str, float] = {}
    for s, _t, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    all_nodes = {s for s, _, _ in edges} | {t for _, t, _ in edges}
    rank = {n: 1.0 for n in all_nodes}
    for _ in range(2):
        nxt = {n: 0.0 for n in all_nodes}
        for s, t, w in edges:
            nxt[t] += rank[s] * w / outw[s]
        rank = {n: 0.15 + 0.85 * nxt[n] for n in all_nodes}
    for n in all_nodes:
        assert got[n] == pytest.approx(rank[n], rel=1e-12), n


def test_triangle_count_known_graph(spark):
    """K4 has 4 triangles; adding a pendant edge adds none. Hub
    orientation must not change the count (node 1 is the hub)."""
    from usgs_earthquake_data_pipeline_spark.operators.graph import triangle_count

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5)]
    edges = spark.createDataFrame(k4, "src long, dst long")
    assert triangle_count(edges).collect()[0]["n_triangles"] == 4


def test_triangle_count_direction_and_dup_insensitive(spark):
    from usgs_earthquake_data_pipeline_spark.operators.graph import triangle_count

    tri = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (3, 3)]
    edges = spark.createDataFrame(tri, "src long, dst long")
    assert triangle_count(edges).collect()[0]["n_triangles"] == 1
