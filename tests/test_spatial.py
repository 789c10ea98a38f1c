"""Spatial operator tests: haversine sanity, grid radius join parity
with brute force, and the antimeridian wrap case the grid must not
miss."""

from __future__ import annotations

from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.operators.spatial import (
    grid_radius_join,
    haversine_km,
)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, lat double, lon double")


def test_haversine_known_distances(spark):
    df = spark.createDataFrame(
        [
            # Paris -> London ~343.5 km
            (48.8566, 2.3522, 51.5074, -0.1278, 343.5),
            # 1 degree of latitude at the equator ~111.19 km
            (0.0, 0.0, 1.0, 0.0, 111.19),
            (10.0, 20.0, 10.0, 20.0, 0.0),  # identical points
        ],
        "lat1 double, lon1 double, lat2 double, lon2 double, want double",
    )
    got = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d"),
        "want",
    ).collect()
    for r in got:
        assert abs(r["d"] - r["want"]) < 1.0, (r["d"], r["want"])


def _brute_pairs(spark, left, right, radius):
    l = left.select(F.col("id").alias("lid"), F.col("lat").alias("la"), F.col("lon").alias("lo"))
    r = right.select(F.col("id").alias("rid"), F.col("lat").alias("ra"), F.col("lon").alias("ro"))
    d = haversine_km(F.col("la"), F.col("lo"), F.col("ra"), F.col("ro"))
    return {
        (x["lid"], x["rid"])
        for x in l.crossJoin(r).withColumn("d", d).filter(F.col("d") <= radius).collect()
    }


def test_grid_join_matches_brute_force(spark):
    """Pseudo-random scatter: the grid join must find exactly the
    brute-force pair set (no dupes: result is a set of tuples AND the
    row count matches)."""
    import random

    rng = random.Random(7)
    left = _pts(
        spark, [(i, rng.uniform(-35, 35), rng.uniform(-180, 180)) for i in range(150)]
    )
    right = _pts(
        spark,
        [(1000 + i, rng.uniform(-35, 35), rng.uniform(-180, 180)) for i in range(150)],
    )
    got_rows = grid_radius_join(
        left, right, radius_km=500.0, max_abs_lat=35.0
    ).select("l_id", "r_id").collect()
    got = {(r["l_id"], r["r_id"]) for r in got_rows}
    assert len(got_rows) == len(got), "grid join emitted duplicate pairs"
    want = _brute_pairs(spark, left, right, 500.0)
    assert got == want and want


def test_grid_join_catches_antimeridian_pairs(spark):
    """Points straddling lon=+-180 are ~22 km apart at lat 0; a
    non-wrapping grid would put them at opposite index extremes."""
    left = _pts(spark, [(1, 0.0, 179.9)])
    right = _pts(spark, [(2, 0.0, -179.9)])
    got = grid_radius_join(left, right, radius_km=50.0, max_abs_lat=10.0).collect()
    assert len(got) == 1
    assert abs(got[0]["dist_km"] - 22.26) < 0.5


def test_grid_join_excludes_beyond_radius(spark):
    left = _pts(spark, [(1, 10.0, 10.0)])
    right = _pts(spark, [(2, 10.0, 12.0)])  # ~219 km east
    assert grid_radius_join(left, right, radius_km=100.0, max_abs_lat=15.0).count() == 0
    assert grid_radius_join(left, right, radius_km=250.0, max_abs_lat=15.0).count() == 1


def test_heatmap_shares_sum_to_one(spark, sf_dir):
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    rows = CATALOG["spatial_grid_heatmap"].spark_fn(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.density_share for r in rows) - 1.0) < 1e-6
    # the synthetic band is lat in [-30, 30): cells -3..2 only
    assert all(-3 <= r.cell_lat <= 2 for r in rows)
    assert all(-18 <= r.cell_lon <= 17 for r in rows)
    total = sum(r.n_events for r in rows)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert total == ev.count()


def test_dbscan_cores_match_bruteforce_counts(spark, sf_dir):
    import math

    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    rows = CATALOG["spatial_dbscan_cores_250km"].spark_fn(spark, sf_dir).collect()
    assert rows
    # brute-force recount driver-side from the same derivation
    pts = [
        (
            r.event_id,
            ((r.event_id * 2654435761) % 4294967296) / 4294967296 * 60 - 30,
            ((r.event_id * 2246822519) % 4294967296) / 4294967296 * 360 - 180,
        )
        for r in rows
    ]

    def hav(a, b):
        la1, lo1, la2, lo2 = map(
            math.radians, (a[1], a[2], b[1], b[2])
        )
        h = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * 6371.0088 * math.asin(math.sqrt(h))

    got = {r.event_id: (r.n_neighbors, r.is_core) for r in rows}
    for i, a in enumerate(pts):
        nn = sum(
            1 for j, b in enumerate(pts) if i != j and hav(a, b) <= 250
        )
        assert got[a[0]] == (nn, nn >= 2), a[0]


def test_dbscan_planted_clusters(spark):
    """Two planted blobs + a border point + isolated noise: the full
    DBSCAN operator must recover exactly the planted structure with
    deterministic labels (min core id per component, min neighboring
    core label for borders)."""
    from usgs_earthquake_data_pipeline_spark.operators.spatial import (
        dbscan_labels,
    )

    # ~0.1 deg ≈ 11 km; eps=50 km keeps each blob internally connected
    # and the blobs ~3000 km apart. Blob A: ids 1-3, arranged so the
    # blob extends AWAY from id 20 — 20 sits 46.7 km from id 1 but
    # 57.8/58.9 km from ids 2/3, so it has exactly one neighbor
    # (border, not core, with min_neighbors=2). id 99 is alone.
    pts = _pts(
        spark,
        [
            (1, 0.0, 0.0),
            (2, -0.1, 0.0),
            (3, -0.1, 0.1),
            (10, 20.0, 20.0),
            (11, 20.1, 20.0),
            (12, 20.0, 20.1),
            (20, 0.42, 0.0),
            (99, -40.0, 100.0),
        ],
    )
    got = {
        r["id"]: (r["role"], r["cluster_label"])
        for r in dbscan_labels(
            pts, eps_km=50.0, min_neighbors=2, max_abs_lat=45.0
        ).collect()
    }
    assert got == {
        1: ("core", 1),
        2: ("core", 1),
        3: ("core", 1),
        10: ("core", 10),
        11: ("core", 10),
        12: ("core", 10),
        20: ("border", 1),
        99: ("noise", None),
    }


def test_dbscan_singleton_core_keeps_own_label(spark):
    """A star: center has 2 leaf neighbors (core), the leaves have 1
    (border). No core-core edge exists, so the component machinery
    sees an empty graph — the core must still label itself."""
    from usgs_earthquake_data_pipeline_spark.operators.spatial import (
        dbscan_labels,
    )

    pts = _pts(
        spark,
        [(5, 0.0, 0.0), (6, 0.3, 0.0), (7, -0.3, 0.0)],
    )
    got = {
        r["id"]: (r["role"], r["cluster_label"])
        for r in dbscan_labels(
            pts, eps_km=50.0, min_neighbors=2, max_abs_lat=45.0
        ).collect()
    }
    assert got == {
        5: ("core", 5),
        6: ("border", 5),
        7: ("border", 5),
    }


def test_grid_join_rejects_degenerate_lon_grid(spark):
    """Fewer than 3 lon cells makes pmod-wrapped dx=-1 and dx=+1
    coincide, so a qualifying pair would join twice and inflate
    DBSCAN degree counts — the constructor must refuse."""
    import pytest

    left = _pts(spark, [(1, 0.0, 0.0)])
    # radius 13000 km at lat 85: lon cell > 120 degrees -> n_lon < 3
    with pytest.raises(ValueError, match="longitude cells"):
        grid_radius_join(left, left, radius_km=13000.0, max_abs_lat=85.0)
