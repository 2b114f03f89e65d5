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
    nx = int(np.ceil((max_lon - min_lon) / dlon))
    ny = int(np.ceil((max_lat - min_lat) / dlat))
    return dlon, dlat, nx, ny


def assign_points_to_tiles(
    points: DataFrame, min_lon: float, min_lat: float, max_lon: float, max_lat: float, tile_m: float = 10_000.0
) -> DataFrame:
    """Point → tile routing as pure Column math (floor division — exactly the
    semantics an ANSI oracle reproduces). Points outside the AOI are dropped
    (the reference clips to the AOI first, `tm_splitter.py:144-145`)."""
    dlon, dlat, _nx, ny = grid_params(min_lon, min_lat, max_lon, max_lat, tile_m)
    inside = (
        (F.col("lon") >= min_lon) & (F.col("lon") < max_lon) & (F.col("lat") >= min_lat) & (F.col("lat") < max_lat)
    )
    tx = F.floor((F.col("lon") - min_lon) / dlon).cast("long")
    ty = F.floor((F.col("lat") - min_lat) / dlat).cast("long")
    return points.filter(inside).withColumn(
        "tile_id", F.concat(F.lit("Task_"), (tx * ny + ty).cast("string"))
    )


def line_tiles_kernel(
    flat: np.ndarray,
    offsets: np.ndarray,
    min_lon: float,
    min_lat: float,
    dlon: float,
    dlat: float,
    nx: int,
    ny: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Ragged polylines → unique (row, tile_index) pairs.

    Every segment is sampled at quarter-tile spacing (conservative supercover)
    with NO per-row Python: one densification pass over all segments of the
    batch at once (the `grid.cover_polyline` layout).  Samples falling outside
    the [0,nx)×[0,ny) grid are dropped — the reference clips features to the
    AOI before routing (`tm_splitter.py:144-145`); without the upper bound a
    tile index would alias into a different valid task id.
    """
    n_rows = len(offsets) - 1
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if flat.shape[0] == 0:
        return empty
    seg_a, seg_b = flat[:-1], flat[1:]
    seg_row = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offsets))
    last_vertex = offsets[1:] - 1
    keep = np.ones(flat.shape[0] - 1, dtype=bool)
    keep[last_vertex[last_vertex < flat.shape[0] - 1]] = False
    seg_a, seg_b = seg_a[keep], seg_b[keep]
    seg_rows = seg_row[:-1][keep]
    if seg_a.shape[0] == 0:  # degenerate single-vertex rows route nowhere (P4)
        return empty
    steps = np.maximum(
        np.ceil(
            np.maximum(
                np.abs(seg_b[:, 0] - seg_a[:, 0]) / (dlon / 4.0),
                np.abs(seg_b[:, 1] - seg_a[:, 1]) / (dlat / 4.0),
            )
        ).astype(np.int64),
        1,
    )
    n_samp = steps + 1
    total = int(n_samp.sum())
    seg_idx = np.repeat(np.arange(len(n_samp)), n_samp)
    starts = np.concatenate(([0], np.cumsum(n_samp)[:-1]))
    local = np.arange(total) - starts[seg_idx]
    frac = local / steps[seg_idx]
    px = seg_a[seg_idx, 0] + (seg_b[seg_idx, 0] - seg_a[seg_idx, 0]) * frac
    py = seg_a[seg_idx, 1] + (seg_b[seg_idx, 1] - seg_a[seg_idx, 1]) * frac
    rows = seg_rows[seg_idx]
    tx = np.floor((px - min_lon) / dlon).astype(np.int64)
    ty = np.floor((py - min_lat) / dlat).astype(np.int64)
    ok = (tx >= 0) & (ty >= 0) & (tx < nx) & (ty < ny)
    tid = tx[ok] * ny + ty[ok]
    rows = rows[ok]
    order = np.lexsort((tid, rows))
    rows, tid = rows[order], tid[order]
    if len(rows):
        first = np.ones(len(rows), dtype=bool)
        first[1:] = (rows[1:] != rows[:-1]) | (tid[1:] != tid[:-1])
        rows, tid = rows[first], tid[first]
    return rows, tid


def _line_tiles_udf(min_lon: float, min_lat: float, dlon: float, dlat: float, nx: int, ny: int):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tiles(geoms: pd.Series) -> pd.Series:
        flat, offsets = G.ragged_from_arrays(geoms)
        rows, tid = line_tiles_kernel(flat, offsets, min_lon, min_lat, dlon, dlat, nx, ny)
        out: list[list[str]] = [[] for _ in range(len(geoms))]
        if len(rows):
            labels = np.char.add("Task_", tid.astype(str))
            bounds = np.nonzero(np.diff(rows))[0] + 1
            chunks = np.split(labels, bounds)
            uniq = np.concatenate(([rows[0]], rows[bounds]))
            for r, chunk in zip(uniq.tolist(), chunks):
                out[r] = chunk.tolist()
        return pd.Series(out)

    # deterministic; marked nondeterministic to force single materialization
    return _tiles.asNondeterministic()


def assign_lines_to_tiles(
    lines: DataFrame, min_lon: float, min_lat: float, max_lon: float, max_lat: float, tile_m: float = 10_000.0
) -> DataFrame:
    """Polyline → (possibly many) tiles: exploded ``tile_id`` rows, the
    reference's multi-tile routing (`tm_splitter.py:377-395`)."""
    dlon, dlat, nx, ny = grid_params(min_lon, min_lat, max_lon, max_lat, tile_m)
    return (
        lines.withColumn("__tiles", _line_tiles_udf(min_lon, min_lat, dlon, dlat, nx, ny)(F.col("geom")))
        .withColumn("tile_id", F.explode("__tiles"))
        .drop("__tiles")
    )


def write_by_tile(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Per-tile fan-out sink — the Spark twin of one-file-per-task
    (`tm_splitter.py:370-395`): hive-partitioned parquet by tile_id."""
    df.write.partitionBy("tile_id").mode(mode).parquet(path)
