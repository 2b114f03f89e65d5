"""Column-expression CRS reprojection (P11) and degenerate-geometry
filtering (P4) — all JVM-side, no Python in the path.

Reference semantics:

- P11 4326↔3857 transform: `osm_merge/conflator.py:482-487,586-591`,
  `tm_splitter.py:120-124,161-164` (pyproj per feature).  Here it is exact
  spherical web-mercator math as Catalyst expressions over the flat
  ``array<double>`` geometry — whole-stage codegen, zero UDFs, so it
  survives a 100 TB scan without a Python worker in sight.
- P4 null/degenerate filter: `osm_merge/conflator.py:149-151,185-195`
  (skip null geometry, skip Points in highway conflation, skip LineStrings
  with <= 1 coordinate); `trails.py:86-89`, `usgs.py:108-112`.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: EPSG:3857 sphere radius (WGS84 semi-major axis)
R_3857 = 6378137.0
#: web-mercator latitude clamp (tan singularity at the poles)
MAX_LAT_3857 = 85.0511287798066


def merc_x(lon: Column) -> Column:
    """EPSG:4326 lon degrees → EPSG:3857 x meters."""
    return F.radians(lon) * F.lit(R_3857)


def merc_y(lat: Column) -> Column:
    """EPSG:4326 lat degrees → EPSG:3857 y meters (clamped at ±85.05°)."""
    lat_c = F.greatest(F.lit(-MAX_LAT_3857), F.least(F.lit(MAX_LAT_3857), lat))
    return F.log(F.tan(F.lit(math.pi / 4) + F.radians(lat_c) / 2)) * F.lit(R_3857)


def inv_merc_x(x: Column) -> Column:
    """EPSG:3857 x meters → lon degrees."""
    return F.degrees(x / F.lit(R_3857))


def inv_merc_y(y: Column) -> Column:
    """EPSG:3857 y meters → lat degrees."""
    return F.degrees(F.atan(F.exp(y / F.lit(R_3857))) * 2 - F.lit(math.pi / 2))


def reproject_3857(geom: Column) -> Column:
    """Flat ``[x0,y0,x1,y1,...]`` 4326 geometry → 3857 meters, elementwise
    via ``transform`` (even index = lon → x, odd = lat → y)."""
    return F.transform(
        geom,
        lambda v, i: F.when(i % 2 == 0, merc_x(v)).otherwise(merc_y(v)),
    )


def reproject_4326(geom: Column) -> Column:
    """Inverse of :func:`reproject_3857`."""
    return F.transform(
        geom,
        lambda v, i: F.when(i % 2 == 0, inv_merc_x(v)).otherwise(inv_merc_y(v)),
    )


def drop_degenerate(
    df: DataFrame, geom_col: str = "geom", keep_points: bool = False
) -> DataFrame:
    """P4: drop null geometries, empty coordinate lists, and (for line
    conflation) single-point "lines"; odd-length coordinate arrays are
    malformed and dropped too.  ``keep_points=True`` retains 1-vertex
    geometries (the POI path, `conflatePOI.py` accepts Points)."""
    g = F.col(geom_col)
    min_pts = 1 if keep_points else 2
    return df.filter(
        g.isNotNull()
        & (F.size(g) % 2 == 0)
        & (F.size(g) >= 2 * min_pts)
        & ~F.exists(g, lambda v: v.isNull() | F.isnan(v))
    )
