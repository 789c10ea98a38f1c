"""Z-order clustering tests: interleave correctness vs the Python
reference, quantization clamping, and the locality property (file-
level min/max ranges shrink vs a lexicographic sort)."""

from __future__ import annotations

from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.operators.zorder import (
    interleave_bits,
    quantize,
    z_order_sort,
    z_value_py,
)


def test_interleave_matches_python_reference(spark):
    rows = [(a, b) for a in [0, 1, 5, 255, 65535] for b in [0, 2, 7, 1000, 65535]]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", interleave_bits(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert r.z == z_value_py(r.a, r.b), (r.a, r.b)


def test_quantize_clamps_and_spans(spark):
    df = spark.createDataFrame(
        [(-200.0,), (-90.0,), (0.0,), (90.0,), (200.0,)], "v double"
    ).withColumn("q", quantize(F.col("v"), -90.0, 90.0, 8))
    got = [r.q for r in df.collect()]
    assert got[0] == 0 and got[1] == 0  # clamped low
    assert got[2] == 128  # midpoint ≈ half of 255
    assert got[3] == 255 and got[4] == 255  # clamped high


def test_z_order_improves_2d_locality(spark):
    # grid of (x, y) points; compare per-chunk y-extent after sorting
    # lexicographically (x then y) vs Z-curve: the Z-curve keeps both
    # dimensions bounded per chunk.
    pts = [(float(x), float(y)) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x double, y double")

    def worst_dim_extent(sorted_df, chunk=256):
        """Worst per-chunk single-dimension extent: a file's min/max
        stats prune a predicate on either dimension only if that
        dimension's extent is small."""
        rows = sorted_df.collect()
        worst = 0.0
        for i in range(0, len(rows), chunk):
            ys = [r.y for r in rows[i : i + chunk]]
            xs = [r.x for r in rows[i : i + chunk]]
            worst = max(worst, max(ys) - min(ys), max(xs) - min(xs))
        return worst

    lex = df.orderBy("x", "y")
    zed = z_order_sort(df.coalesce(1), "x", "y", (0, 63), (0, 63), bits=6).coalesce(1)
    # lexicographic chunks span the full y range (63); Z-curve chunks
    # are 16×16 squares (extent 15) — both dimensions prunable
    assert worst_dim_extent(zed) < worst_dim_extent(lex)
