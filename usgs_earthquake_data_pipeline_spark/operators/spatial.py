"""Geospatial operators: haversine distance and a grid-bucketed
radius join.

The reference's domain is earthquakes — every event carries lat/lon
(``usgs-earthquake-data-ingest.py:131-132``) and its roadmap included
spatial enrichment (the commented-out reverse geocoding,
``usgs-earthquake-data-ingestion-prod.py:188-228``). These operators
supply the spatial query the schema implies ("events within R km of
X") in a shape that scales: never the all-pairs cross join, but an
equi-join on grid cells sized so that any pair within the radius
falls in adjacent cells.

Everything is pure codegen (trig expressions, integer cell math) —
no UDFs, no collected geometry.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..materialize import materialize

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius
KM_PER_DEG_LAT = 111.0  # conservative (true range 110.57-111.69)


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine form — numerically
    stable for small angles, the case a radius join cares about)."""
    dlat = F.radians(lat2) - F.radians(lat1)
    dlon = F.radians(lon2) - F.radians(lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    *,
    radius_km: float,
    max_abs_lat: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    dist_col: str = "dist_km",
) -> DataFrame:
    """All (left, right) pairs within ``radius_km`` — via a grid-cell
    equi-join, never a cross join.

    Cell sizing: lat cells are ``radius/111 km`` degrees; lon cells
    are sized at the widest latitude the data can reach
    (``max_abs_lat``, a declared contract — rows beyond it raise no
    error but may miss pairs), so adjacent cells always cover the
    radius. The lon grid divides 360 EVENLY (``n = floor(360/min)``
    cells of ``360/n`` degrees): a ragged last cell narrower than the
    radius would put near-antimeridian pairs two cells apart and the
    3x3 neighborhood would miss them. Neighbor lookup wraps with pmod
    for the same reason.

    Each qualifying pair joins exactly once (the right row's cell
    matches exactly one of the left row's 9 exploded neighbor cells),
    so no distinct is needed. Shuffle volume: 9x the left side's
    (id, lat, lon, cell) rows plus the right side once — at 100 TB
    the grid key spreads uniformly and AQE's skew split covers dense
    metros. Per-latitude-band lon sizing (finer cells near the
    equator) is the refinement when data spans the full globe; a
    single conservative band keeps this entry exactly verifiable.
    """
    lat_cell = radius_km / KM_PER_DEG_LAT
    min_lon_cell = radius_km / (
        KM_PER_DEG_LAT * math.cos(math.radians(max_abs_lat))
    )
    n_lon = int(360.0 // min_lon_cell)
    if n_lon < 3:
        # With fewer than 3 lon cells the pmod-wrapped dx=-1 and dx=+1
        # neighbors coincide, so a pair would join twice and downstream
        # degree counts (dbscan_labels) would inflate. Such a radius
        # covers ≥ a third of the globe at max_abs_lat — out of scope
        # for a grid join.
        raise ValueError(
            f"radius_km={radius_km} at max_abs_lat={max_abs_lat} leaves "
            f"only {n_lon} longitude cells (<3); the 3x3 neighborhood "
            "would emit duplicate pairs. Use a smaller radius or lower "
            "max_abs_lat."
        )
    lon_cell = 360.0 / n_lon

    def cells(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            *[F.col(c).alias(f"{prefix}{c}") for c in df.columns],
            F.floor((F.col(lat_col) + 90.0) / lat_cell).alias(f"{prefix}cy"),
            F.pmod(
                F.floor((F.col(lon_col) + 180.0) / lon_cell), F.lit(n_lon)
            ).alias(f"{prefix}cx"),
        )

    l = cells(left, "l_")
    r = cells(right, "r_")
    offsets = F.explode(
        F.array(*[F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                  for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    ).alias("o")
    l9 = l.select("*", offsets).select(
        "*",
        (F.col("l_cy") + F.col("o.dy")).alias("jy"),
        F.pmod(F.col("l_cx") + F.col("o.dx"), F.lit(n_lon)).alias("jx"),
    ).drop("o")
    joined = l9.join(
        r, (F.col("jy") == F.col("r_cy")) & (F.col("jx") == F.col("r_cx"))
    )
    dist = haversine_km(
        F.col(f"l_{lat_col}"), F.col(f"l_{lon_col}"),
        F.col(f"r_{lat_col}"), F.col(f"r_{lon_col}"),
    )
    return (
        joined.withColumn(dist_col, dist)
        .filter(F.col(dist_col) <= radius_km)
        .drop("jy", "jx", "l_cy", "l_cx", "r_cy", "r_cx")
    )


def dbscan_labels(
    pts: DataFrame,
    *,
    eps_km: float,
    min_neighbors: int,
    max_abs_lat: float,
    max_iterations: int = 50,
) -> DataFrame:
    """Full DBSCAN over (id, lat, lon) points: ``(id, role,
    cluster_label)`` with role in {core, border, noise}.

    * CORE = ≥ ``min_neighbors`` other points within ``eps_km``
      (DBSCAN's minPts counted EXCLUDING the point itself).
    * Cluster = connected component of the core-core radius graph;
      label = the component's minimum core id (a core with no core
      neighbor is its own singleton cluster).  Components resolve via
      iterative min-label propagation (``resolve_dup_clusters`` —
      lineage-checkpointed per round; rounds = core-graph diameter).
    * BORDER = non-core within eps of ≥ 1 core; adopts the MINIMUM
      neighboring core's label.  Textbook DBSCAN leaves border
      assignment scan-order-dependent — min-label is the
      deterministic tie-break.
    * NOISE = everything else; label NULL.

    Scale shape: one grid-bucketed radius self-join feeds degree
    counts, core edges, and border adoption (the pair list is
    localCheckpoint-ed once); core/label tables are |cores|-sized so
    the broadcasts are bounded by the cluster population, never the
    input. The all-pairs fallback never exists here.
    """
    from .dedup import resolve_dup_clusters

    pairs = grid_radius_join(
        pts, pts, radius_km=eps_km, max_abs_lat=max_abs_lat
    ).filter(F.col("l_id") != F.col("r_id"))
    pairs = pairs.select("l_id", "r_id").transform(materialize)

    cores = (
        pairs.groupBy("l_id")
        .agg(F.count("*").alias("nn"))
        .filter(F.col("nn") >= min_neighbors)
        .select(F.col("l_id").alias("core_id"))
    )
    core_edges = (
        pairs.join(F.broadcast(cores), pairs.l_id == cores.core_id)
        .drop("core_id")
        .join(
            F.broadcast(cores.withColumnRenamed("core_id", "core_r")),
            F.col("r_id") == F.col("core_r"),
        )
        .select(F.col("l_id").alias("id_a"), F.col("r_id").alias("id_b"))
    )
    comp = resolve_dup_clusters(core_edges, max_iterations=max_iterations)
    core_labels = cores.join(comp, cores.core_id == comp.id, "left").select(
        F.col("core_id").alias("id"),
        F.coalesce("canonical_id", "core_id").alias("label"),
    )
    border_labels = (
        pairs.join(
            F.broadcast(core_labels.withColumnRenamed("id", "nbr")),
            F.col("r_id") == F.col("nbr"),
        )
        .join(F.broadcast(cores), F.col("l_id") == F.col("core_id"), "left_anti")
        .groupBy("l_id")
        .agg(F.min("label").alias("label"))
        .select(F.col("l_id").alias("id"), "label")
    )
    labels = core_labels.withColumn("role", F.lit("core")).unionByName(
        border_labels.withColumn("role", F.lit("border"))
    )
    return pts.join(F.broadcast(labels), "id", "left").select(
        F.col("id"),
        F.coalesce("role", F.lit("noise")).alias("role"),
        F.col("label").alias("cluster_label"),
    )
