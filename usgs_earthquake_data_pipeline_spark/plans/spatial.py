"""Geospatial catalog entries — the spatial queries the reference's
earthquake schema implies (lat/lon on every event,
usgs-earthquake-data-ingest.py:131-132; commented-out geo enrichment,
usgs-earthquake-data-ingestion-prod.py:188-228).

The driver's synthetic events table carries no coordinates, so the
entries derive a deterministic lat/lon from event_id with pure
integer arithmetic — bit-identical in Spark and DuckDB — and the
oracle verifies the grid-bucketed radius join against the brute-force
cross-join ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.spatial import dbscan_labels, grid_radius_join, haversine_km
from ..sources.tables import load_table
from .catalog import register

# deterministic synthetic coordinates via multiplicative hashing
# (Knuth/xxhash prime constants): exact bigint arithmetic in both
# engines, then one exact double division — lat in [-30, 30), lon in
# [-180, 180), scattered rather than lattice-aligned so the pair
# distances form a continuum (a lattice derivation was tried first
# and degenerates: every pair lands at distance 0 or far away).
# Boundary safety for the radius predicate: nearest pair distance to
# the 100 km threshold is 9.0e-3 km at sf0.1 (measured), ~8 orders
# above cross-engine trig ulp differences.
_LAT_SQL = (
    "(CAST((event_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296)"
    " * 60 - 30"
)
_LON_SQL = (
    "(CAST((event_id * 2246822519) % 4294967296 AS DOUBLE) / 4294967296)"
    " * 360 - 180"
)


def _with_coords(df: DataFrame) -> DataFrame:
    return df.select(
        "event_id",
        "event_type",
        F.expr(_LAT_SQL).alias("lat"),
        F.expr(_LON_SQL).alias("lon"),
    )


@register(
    "spatial_radius_join_100km",
    oracle=(
        "WITH pts AS (SELECT event_id, event_type, "
        f"{_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM events), "
        "e AS (SELECT * FROM pts WHERE event_type = 'error'), "
        "p AS (SELECT * FROM pts WHERE event_type = 'purchase') "
        "SELECT e.event_id AS id_err, p.event_id AS id_buy, "
        "round(2 * 6371.0088 * asin(sqrt("
        "pow(sin((radians(p.lat) - radians(e.lat)) / 2), 2) "
        "+ cos(radians(e.lat)) * cos(radians(p.lat)) "
        "* pow(sin((radians(p.lon) - radians(e.lon)) / 2), 2))), 3) "
        "AS dist_km "
        "FROM e JOIN p ON 2 * 6371.0088 * asin(sqrt("
        "pow(sin((radians(p.lat) - radians(e.lat)) / 2), 2) "
        "+ cos(radians(e.lat)) * cos(radians(p.lat)) "
        "* pow(sin((radians(p.lon) - radians(e.lon)) / 2), 2))) <= 100 "
        "ORDER BY 1, 2"
    ),
    headline=True,  # data-dominated: the grid join's algorithmic win
    # over the oracle's cross join grows with |events|^2 (sf0.1:
    # Spark 2.0 s vs DuckDB 52.7 s on the same files)
    tags=("spatial", "join", "geo"),
)
def spatial_radius_join_100km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error events within 100 km of purchase events, via the
    grid-bucketed radius join (operators/spatial.py): cells sized to
    the radius, 9-cell neighborhood equi-join, haversine verify —
    never the oracle's O(|e|x|p|) cross join, whose cost at 100 TB is
    the reason spatial joins need the grid. Antimeridian pairs are
    covered by the evenly-dividing wrapped lon grid (tested). The
    coordinate derivation is integer-exact on both sides; distances
    round to 3 dp (engine trig agrees to ~1e-10)."""
    ev = _with_coords(load_table(spark, sf_dir, "events"))
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("id"), "lat", "lon"
    )
    buy = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("id"), "lat", "lon"
    )
    pairs = grid_radius_join(
        err, buy, radius_km=100.0, max_abs_lat=30.0
    )
    return pairs.select(
        F.col("l_id").alias("id_err"),
        F.col("r_id").alias("id_buy"),
        F.round("dist_km", 3).alias("dist_km"),
    ).orderBy("id_err", "id_buy")


@register(
    "spatial_nearest_purchase",
    oracle=(
        "WITH pts AS (SELECT event_id, event_type, "
        f"{_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM events), "
        "e AS (SELECT * FROM pts WHERE event_type = 'error'), "
        "p AS (SELECT * FROM pts WHERE event_type = 'purchase'), "
        "d AS (SELECT e.event_id AS id_err, p.event_id AS id_buy, "
        "2 * 6371.0088 * asin(sqrt("
        "pow(sin((radians(p.lat) - radians(e.lat)) / 2), 2) "
        "+ cos(radians(e.lat)) * cos(radians(p.lat)) "
        "* pow(sin((radians(p.lon) - radians(e.lon)) / 2), 2))) AS dist "
        "FROM e, p), "
        "ranked AS (SELECT id_err, id_buy, dist, row_number() OVER ("
        "PARTITION BY id_err ORDER BY dist, id_buy) AS rk "
        "FROM d WHERE dist <= 100) "
        "SELECT id_err, id_buy, round(dist, 3) AS dist_km "
        "FROM ranked WHERE rk = 1 ORDER BY id_err"
    ),
    tags=("spatial", "knn", "geo"),
)
def spatial_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest purchase within 100 km of each error event (spatial
    kNN, k=1): rank window over the grid join's candidates — the
    radius-bounded form of nearest-neighbor that scales (unbounded
    kNN needs expanding-ring search; a bounded radius is what
    alerting/enrichment actually wants). Rank orders by the UNROUNDED
    distance then id (cross-engine stable: the closest top-2 gap is
    3.4e-4 km at sf0.01, eight orders above trig ulp)."""
    from pyspark.sql import Window

    ev = _with_coords(load_table(spark, sf_dir, "events"))
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("id"), "lat", "lon"
    )
    buy = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("id"), "lat", "lon"
    )
    pairs = grid_radius_join(err, buy, radius_km=100.0, max_abs_lat=30.0)
    w = Window.partitionBy("l_id").orderBy("dist_km", "r_id")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("l_id").alias("id_err"),
            F.col("r_id").alias("id_buy"),
            F.round("dist_km", 3).alias("dist_km"),
        )
        .orderBy("id_err")
    )


@register(
    "spatial_grid_heatmap",
    oracle=(
        "WITH pts AS (SELECT event_type, value, "
        f"{_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM events), "
        "cell AS (SELECT CAST(floor(lat / 10) AS BIGINT) AS cell_lat, "
        "CAST(floor(lon / 10) AS BIGINT) AS cell_lon, "
        "count(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS sv "
        "FROM pts GROUP BY 1, 2), "
        "tot AS (SELECT SUM(n) AS n_all FROM cell) "
        "SELECT cell_lat, cell_lon, CAST(n AS BIGINT) AS n_events, "
        "CAST(sv AS DOUBLE) AS sum_value, "
        "round(n / CAST(n_all AS DOUBLE), 9) AS density_share "
        "FROM cell CROSS JOIN tot ORDER BY cell_lat, cell_lon"
    ),
    tags=("spatial", "agg", "geo"),
)
def spatial_grid_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The density heatmap aggregation every quake dashboard draws:
    events binned into 10°×10° grid cells with counts, exact-decimal
    value totals, and each cell's share of all events.  Cell ids are
    integer floors of the exact coordinate derivation, so binning has
    no float-boundary risk; the aggregate is map-side-combined and
    its output is bounded by the grid domain (≤ 36×6 cells for this
    corpus' ±30° band) regardless of row count — the canonical
    "reduce the planet to a bounded raster" shape."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.expr(_LAT_SQL).alias("lat"),
        F.expr(_LON_SQL).alias("lon"),
        "value",
    )
    cell = pts.groupBy(
        F.floor(F.col("lat") / 10).cast("long").alias("cell_lat"),
        F.floor(F.col("lon") / 10).cast("long").alias("cell_lon"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
    )
    tot = cell.agg(F.sum("n").alias("n_all"))
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            "cell_lat",
            "cell_lon",
            F.col("n").cast("long").alias("n_events"),
            F.col("sv").cast("double").alias("sum_value"),
            F.round(
                F.col("n") / F.col("n_all").cast("double"), 9
            ).alias("density_share"),
        )
        .orderBy("cell_lat", "cell_lon")
    )


@register(
    "spatial_dbscan_cores_250km",
    oracle=(
        "WITH pts AS (SELECT event_id, "
        f"{_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM events "
        "WHERE event_type = 'error' AND event_id % 4 = 0), "
        "d AS (SELECT a.event_id AS id, CAST(count(*) AS BIGINT) AS nn "
        "FROM pts a JOIN pts b ON a.event_id <> b.event_id "
        "AND 2 * 6371.0088 * asin(sqrt("
        "pow(sin((radians(b.lat) - radians(a.lat)) / 2), 2) "
        "+ cos(radians(a.lat)) * cos(radians(b.lat)) "
        "* pow(sin((radians(b.lon) - radians(a.lon)) / 2), 2))) <= 250 "
        "GROUP BY 1) "
        "SELECT pts.event_id, COALESCE(nn, 0) AS n_neighbors, "
        "COALESCE(nn, 0) >= 2 AS is_core "
        "FROM pts LEFT JOIN d ON d.id = pts.event_id "
        "ORDER BY pts.event_id"
    ),
    tags=("spatial", "clustering", "geo"),
)
def spatial_dbscan_cores_250km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN's density phase — core-point detection (eps = 250 km,
    minPts = 2 neighbors) over the error events (hash-thinned ×4 so
    the oracle's verification cross join stays bounded): a point is
    CORE when enough others fall inside its radius, the seed set
    cluster expansion grows from.  Earthquake-catalog use: cores are
    the aftershock-sequence members, noise points the isolated
    events.

    Plan: the neighbor counts come from the SAME grid-bucketed
    radius self-join as the radius-join entry (cells sized to eps,
    9-cell neighborhood, haversine verify — never the oracle's cross
    join), self-pairs filtered, then one count per id left-joined
    back so zero-neighbor noise points appear explicitly.  At
    sf0.001 the thinned set is sparse enough that ALL points are
    noise — the report is still exact; density appears from sf0.01
    up (8 cores) and dominates at sf0.1 (~4.3k).  The expansion
    step (label propagation over the core graph) is the
    `dedup_resolve_clusters` operator reapplied to these edges."""
    ev = load_table(spark, sf_dir, "events")
    pts = (
        ev.filter(
            (F.col("event_type") == "error") & (F.col("event_id") % 4 == 0)
        )
        .select(
            F.col("event_id").alias("id"),
            F.expr(_LAT_SQL).alias("lat"),
            F.expr(_LON_SQL).alias("lon"),
        )
    )
    pairs = grid_radius_join(
        pts, pts, radius_km=250.0, max_abs_lat=30.0
    ).filter(F.col("l_id") != F.col("r_id"))
    counts = pairs.groupBy("l_id").agg(
        F.count("*").cast("long").alias("nn")
    )
    return (
        pts.join(counts, pts.id == counts.l_id, "left")
        .select(
            F.col("id").alias("event_id"),
            F.coalesce("nn", F.lit(0)).alias("n_neighbors"),
            (F.coalesce("nn", F.lit(0)) >= 2).alias("is_core"),
        )
        .orderBy("event_id")
    )


# haversine predicate shared by the DBSCAN oracle's distance CTE
_HAV_250 = (
    "2 * 6371.0088 * asin(sqrt("
    "pow(sin((radians(b.lat) - radians(a.lat)) / 2), 2) "
    "+ cos(radians(a.lat)) * cos(radians(b.lat)) "
    "* pow(sin((radians(b.lon) - radians(a.lon)) / 2), 2))) <= 250"
)


@register(
    "spatial_dbscan_clusters",
    oracle=(
        "WITH RECURSIVE pts AS (SELECT event_id, "
        f"{_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM events "
        "WHERE event_type = 'error' AND event_id % 4 = 0), "
        "d AS (SELECT a.event_id AS src, b.event_id AS dst "
        f"FROM pts a JOIN pts b ON a.event_id <> b.event_id AND {_HAV_250}), "
        "deg AS (SELECT src AS id, count(*) AS nn FROM d GROUP BY 1), "
        "core AS (SELECT id FROM deg WHERE nn >= 2), "
        "ce AS (SELECT d.src, d.dst FROM d "
        "JOIN core c1 ON d.src = c1.id JOIN core c2 ON d.dst = c2.id), "
        # min-reachable-id = the component's canonical label (edges are
        # symmetric, so reachability is the undirected component)
        "reach(id, lbl) AS (SELECT id, id FROM core "
        "UNION SELECT ce.dst, r.lbl FROM reach r JOIN ce ON ce.src = r.id), "
        "clab AS (SELECT id, min(lbl) AS label FROM reach GROUP BY 1), "
        "border AS (SELECT d.src AS id, min(clab.label) AS label "
        "FROM d JOIN clab ON d.dst = clab.id "
        "WHERE d.src NOT IN (SELECT id FROM core) GROUP BY 1) "
        "SELECT pts.event_id, "
        "CASE WHEN clab.id IS NOT NULL THEN 'core' "
        "WHEN border.id IS NOT NULL THEN 'border' ELSE 'noise' END AS role, "
        "COALESCE(clab.label, border.label) AS cluster_label "
        "FROM pts LEFT JOIN clab ON clab.id = pts.event_id "
        "LEFT JOIN border ON border.id = pts.event_id "
        "ORDER BY pts.event_id"
    ),
    tags=("spatial", "clustering", "geo", "iterative"),
)
def spatial_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full DBSCAN (eps = 250 km, minPts = 2 neighbors) over the
    hash-thinned error events — the expansion step the cores-only
    entry (`spatial_dbscan_cores_250km`) seeds:

    * CORE points (≥ 2 radius neighbors) are labeled by connected
      components over the core-core radius graph — `resolve_dup_
      clusters` (iterative min-label propagation, localCheckpoint per
      round) reapplied to spatial edges; the label is the component's
      minimum core event_id, and a core with no core neighbor keeps
      its own id (singleton cluster).
    * BORDER points (non-core within eps of ≥ 1 core) adopt the
      MINIMUM neighboring core's cluster label — textbook DBSCAN
      leaves border assignment scan-order-dependent; min-label is the
      deterministic tie-break both engines agree on.
    * NOISE points carry a NULL label.

    Scale shape: both the degree count and the core-core edge list
    come from ONE grid-bucketed radius self-join (cells sized to eps,
    9-cell neighborhood — never the oracle's O(n²) cross join); the
    label propagation shuffles only the ~|cores| label table per
    round, and rounds = core-graph diameter (measured 0 at sf0.01 —
    all singleton cores; ≤ 50-gated at sf0.1 where the largest of the
    171 components spans 309 cores).  The oracle's recursive-CTE
    closure is bounded by Σ(component size²) ≈ 467k rows at sf0.1.
    """
    ev = load_table(spark, sf_dir, "events")
    pts = ev.filter(
        (F.col("event_type") == "error") & (F.col("event_id") % 4 == 0)
    ).select(
        F.col("event_id").alias("id"),
        F.expr(_LAT_SQL).alias("lat"),
        F.expr(_LON_SQL).alias("lon"),
    )
    labels = dbscan_labels(
        pts, eps_km=250.0, min_neighbors=2, max_abs_lat=30.0
    )
    return labels.select(
        F.col("id").alias("event_id"), "role", "cluster_label"
    ).orderBy("event_id")
