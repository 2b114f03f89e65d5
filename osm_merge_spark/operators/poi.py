"""Point-distance kNN join (POI conflation / dedup).

Reference: `osm_merge/conflatePOI.py:86-153` (haversine candidates within
tolerance, consumer takes nearest — the PostGIS variant is
``ST_Distance ... ORDER BY ST_Distance`` `:316-318`), and the brute-force
dup finder `osm_merge/poidup.py:19-28`.

Spark design: manufacture the cell equi-key at a zoom derived from the
tolerance, ring-expand the probe side, hash-join, then haversine + window
rank — all JVM-side Column math (no Python at all for point joins).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import grid


def haversine_col(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle meters as a Column expression (whole-stage codegen)."""
    rlon1, rlat1, rlon2, rlat2 = (F.radians(c) for c in (lon1, lat1, lon2, lat2))
    a = (
        F.pow(F.sin((rlat2 - rlat1) / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin((rlon2 - rlon1) / 2), 2)
    )
    return 2 * 6_371_008.8 * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def zoom_for_tolerance(tolerance_m: float, max_abs_lat: float = 60.0) -> int:
    """Pick the deepest zoom whose (worst-case) cell edge still exceeds the
    tolerance, so ring-1 expansion suffices — derived, not hard-coded."""
    for z in range(24, 4, -1):
        if grid.cell_size_m(z, max_abs_lat) >= tolerance_m:
            return z
    return 4


def _cell_col(lon: Column, lat: Column, z: int) -> Column:
    """Pure-Column mercator cell id — identical math to grid.cell_id but in
    whole-stage codegen (x/y packed side-by-side; hierarchy not needed here)."""
    n = F.lit(float(1 << z))
    lat_c = F.least(F.greatest(lat, F.lit(-85.05112878)), F.lit(85.05112878))
    x = F.floor((lon + 180.0) / 360.0 * n).cast("long")
    y = F.floor((1.0 - F.asinh(F.tan(F.radians(lat_c))) / float(np.pi)) / 2.0 * n).cast("long")
    x = F.least(F.greatest(x, F.lit(0)), F.lit((1 << z) - 1))
    y = F.least(F.greatest(y, F.lit(0)), F.lit((1 << z) - 1))
    return (x * F.lit(1 << z) + y).cast("long")


def knn_join(
    probes: DataFrame,
    targets: DataFrame,
    tolerance_m: float = 7.0,
    k: int = 1,
    probe_id: str = "poi_id",
    target_id: str = "osm_id",
) -> DataFrame:
    """For each probe point, the k nearest target points within tolerance.

    probes:  (probe_id, lon, lat, ...); targets: (target_id, lon, lat, ...).
    Returns probe columns + target id + ``dist`` + ``rank``.
    Entirely JVM-side: cell equi-join (border-epsilon-expanded probes) +
    haversine + rank window. Broadcast the target side by hinting upstream if
    small.

    Perf (optimization guide §2.3/§2.4, r6): probes previously exploded a
    blanket 3×3 ring (9 rows per probe) and then paid a dropDuplicates
    exchange.  Neighbor cells are now emitted only where the probe lies
    within the tolerance (×1.25 safety margin for the local-scale
    approximation) of that cell border — the same border-epsilon pattern the
    conflation cover uses (grid.cover_polyline pad_m) — which is ~1-2 cells
    per probe instead of 9, and the per-row array_distinct makes the
    (probe, cell) rows unique by construction, so the dedupe exchange is
    gone.  Candidate discovery is still a superset: a target within
    tolerance of the probe can only lie in the base cell or across a border
    that is itself within tolerance of the probe, so results are unchanged.
    """
    z = zoom_for_tolerance(tolerance_m)
    p = probes.select(
        F.col(probe_id), F.col("lon").alias("p_lon"), F.col("lat").alias("p_lat")
    )
    n = 1 << z
    xf = (F.col("p_lon") + 180.0) / 360.0 * n
    lat_c = F.least(F.greatest(F.col("p_lat"), F.lit(-85.05112878)), F.lit(85.05112878))
    yf = (1.0 - F.asinh(F.tan(F.radians(lat_c))) / float(np.pi)) / 2.0 * n
    base_x = F.floor(xf).cast("long")
    base_y = F.floor(yf).cast("long")
    fx = xf - F.floor(xf)
    fy = yf - F.floor(yf)
    # mercator is locally conformal: a zoom-z tile edge spans the same ground
    # meters in x and y at the point's latitude
    tile_m = F.lit(grid.EARTH_CIRCUMFERENCE_M) * F.cos(F.radians(lat_c)) / n
    pad = F.lit(tolerance_m * 1.25) / tile_m  # tolerance as a tile-edge fraction
    west, east = fx < pad, fx > 1.0 - pad
    north, south = fy < pad, fy > 1.0 - pad

    def cell(dx: int, dy: int) -> Column:
        x = F.pmod(base_x + dx, F.lit(n)) if dx else base_x
        y = F.least(F.greatest(base_y + dy, F.lit(0)), F.lit(n - 1)) if dy else base_y
        return (x * n + y).cast("long")

    cand = F.array(
        cell(0, 0),
        F.when(west, cell(-1, 0)),
        F.when(east, cell(1, 0)),
        F.when(north, cell(0, -1)),
        F.when(south, cell(0, 1)),
        F.when(west & north, cell(-1, -1)),
        F.when(west & south, cell(-1, 1)),
        F.when(east & north, cell(1, -1)),
        F.when(east & south, cell(1, 1)),
    )
    p = p.withColumn(
        "cell", F.explode(F.array_distinct(F.filter(cand, lambda c: c.isNotNull())))
    )

    t = targets.select(
        F.col(target_id), F.col("lon").alias("t_lon"), F.col("lat").alias("t_lat")
    ).withColumn("cell", _cell_col(F.col("t_lon"), F.col("t_lat"), z))

    joined = p.join(t, "cell").withColumn(
        "dist", haversine_col(F.col("p_lon"), F.col("p_lat"), F.col("t_lon"), F.col("t_lat"))
    )
    joined = joined.filter(F.col("dist") <= tolerance_m)
    if k == 1:
        # nearest-only (the reference's case): one min_by aggregation
        # replaces the pair-dedupe shuffle AND the rank window — map-side
        # partial agg collapses to one row per probe before the exchange
        # (SortAggregate due to the struct buffer; the shuffle reduction is
        # the win).
        # Ring-duplicate rows of the same pair carry identical coordinates,
        # hence identical dist, so the (dist, target_id) pick stays
        # deterministic without deduping first.
        payload = F.struct(
            F.col(target_id).alias(target_id),
            F.col("p_lon").alias("p_lon"),
            F.col("p_lat").alias("p_lat"),
            F.col("dist").alias("dist"),
        )
        order = F.struct(F.col("dist").alias("d"), F.col(target_id).alias("t"))
        return (
            joined.groupBy(probe_id)
            .agg(F.min_by(payload, order).alias("__b"))
            .select(probe_id, "__b.*")
            .withColumn("rank", F.lit(1))
        )
    # a target can reach a probe through several ring cells → dedupe pair
    joined = joined.groupBy(probe_id, target_id).agg(
        F.first("p_lon").alias("p_lon"),
        F.first("p_lat").alias("p_lat"),
        F.min("dist").alias("dist"),
    )
    w = Window.partitionBy(probe_id).orderBy(F.asc("dist"), F.asc(target_id))
    return joined.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
