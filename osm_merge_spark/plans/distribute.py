"""Spatial work distribution: executor-local conflation via morton-range
tile ownership.

On a real cluster, Spark's shuffle co-partitions both join sides by the cell
key.  For *executor-count scaling* (the north rule's N→4N criterion) the
equivalent explicit construction is:

1. every feature gets a **coarse tile** (z12 parent of its z18 cover;
   ~7.6 km): the primary is owned by its anchor tile, the secondary is
   *needed by* each tile in the 1-ring of any tile its cover touches
   (one ring suffices because way extent + threshold ≪ tile size);
2. tiles are ordered on the **Z-order (morton) curve** and split into K
   contiguous ranges at the primary's K-quantiles — spatial locality keeps
   the secondary's cross-range replication to range borders only (the
   `repartitionByRange` pattern the north rule names);
3. executor r conflates `primary[anchor ∈ range_r]` against
   `secondary[needed_tiles ∩ range_r ≠ ∅]` — fully independently:
   no cross-executor traffic, per-executor work ≈ (P + S·(1+ε)) / K.

The same columns power partition pruning for AOI-clipped queries: writing
the corpus partitioned by a morton-range bucket makes `WHERE tile IN (...)`
a file-skipping scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import geometry as G
from .. import grid

COARSE_Z = 12

_ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("anchor_tile", T.LongType()),       # morton at COARSE_Z of first vertex
        T.StructField("needed_tiles", T.ArrayType(T.LongType())),  # ring-1 of covered tiles
    ]
)


def tile_assign_udf(zoom: int = grid.DEFAULT_ZOOM, coarse_z: int = COARSE_Z, pad_m: float = 7.0):
    @F.pandas_udf(_ASSIGN_SCHEMA)
    def _assign(geoms: pd.Series) -> pd.DataFrame:
        flat, offsets = G.ragged_from_arrays(geoms)
        n = len(offsets) - 1
        anchors = np.zeros(n, dtype=np.int64)
        has = np.diff(offsets) > 0
        firsts = flat[offsets[:-1][has]]
        if len(firsts):
            a_cells = grid.cell_id(firsts[:, 0], firsts[:, 1], coarse_z)
            anchors[has] = a_cells & grid._MORTON_MASK
        cells, rows = grid.cover_polyline(flat, offsets, zoom, pad_m=pad_m)
        needed: list[list[int]] = [[] for _ in range(n)]
        if len(cells):
            coarse = grid.parent_cell(cells, coarse_z)
            ring = grid.k_ring(coarse, 1)  # (m, 9)
            r_rows = np.repeat(rows, 9)
            mortons = ring.ravel() & grid._MORTON_MASK
            order = np.lexsort((mortons, r_rows))
            rr, mm = r_rows[order], mortons[order]
            first = np.ones(len(rr), dtype=bool)
            first[1:] = (rr[1:] != rr[:-1]) | (mm[1:] != mm[:-1])
            rr, mm = rr[first], mm[first]
            bounds = np.nonzero(np.diff(rr))[0] + 1
            chunks = np.split(mm, bounds)
            for row, chunk in zip(np.concatenate(([rr[0]], rr[bounds])) if len(rr) else [], chunks):
                needed[row] = chunk.tolist()
        return pd.DataFrame({"anchor_tile": anchors, "needed_tiles": needed})

    return _assign.asNondeterministic()


def with_tile_columns(df: DataFrame, geom_col: str = "geom", pad_m: float = 7.0) -> DataFrame:
    """Attach (anchor_tile, needed_tiles) — one Arrow pass."""
    return df.withColumn("__t", tile_assign_udf(pad_m=pad_m)(F.col(geom_col))).select(
        "*", F.col("__t.anchor_tile").alias("anchor_tile"), F.col("__t.needed_tiles").alias("needed_tiles")
    ).drop("__t")


def range_boundaries(primary_with_tiles: DataFrame, k: int) -> list[int]:
    """K-quantile morton boundaries of the primary's anchor tiles (the
    range-partitioner's split points)."""
    qs = [i / k for i in range(1, k)]
    return [int(b) for b in primary_with_tiles.approxQuantile("anchor_tile", qs, 0.001)]


def owned_range(boundaries: list[int], rank: int) -> tuple[int, int]:
    lo = boundaries[rank - 1] if rank > 0 else -(1 << 62)
    hi = boundaries[rank] if rank < len(boundaries) else (1 << 62)
    return lo, hi


def primary_slice(primary_with_tiles: DataFrame, boundaries: list[int], rank: int) -> DataFrame:
    lo, hi = owned_range(boundaries, rank)
    return primary_with_tiles.filter((F.col("anchor_tile") >= lo) & (F.col("anchor_tile") < hi))


def secondary_slice(secondary_with_tiles: DataFrame, boundaries: list[int], rank: int) -> DataFrame:
    lo, hi = owned_range(boundaries, rank)
    return secondary_with_tiles.filter(
        F.exists("needed_tiles", lambda t: (t >= lo) & (t < hi))
    )
