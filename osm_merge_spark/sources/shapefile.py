"""Esri Shapefile ingest (S6) — no fiona/GDAL ships in this environment, so
this is a minimal stdlib reader for the public shapefile spec
(ESRI Shapefile Technical Description, 1998): the .shp geometry records
(Point / PolyLine / Polygon) and the .dbf attribute table (dBASE III header,
fixed-width fields) that the reference opens through fiona
(`osm_merge/utilities/mvum.py:323-345`, `usgs.py:90-91`).

SURVEY.md sanctions "GeoPandas at ingest only"; this keeps even that out:
parsing runs at the ingest boundary inside mapInPandas (one task per file —
shapefiles are small per-forest extracts in the reference's pipeline), and
everything downstream is the engine's normal columnar row shape
``(feature_id, kind, geom array<double>, tags map)`` feeding the converter
family (P8) directly.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SHAPE_KIND = {1: "Point", 3: "LineString", 5: "Polygon"}

ROW_SCHEMA = T.StructType(
    [
        T.StructField("feature_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("geom", T.ArrayType(T.DoubleType())),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)


def parse_shp(data: bytes) -> list[tuple[int, str, list[float]]]:
    """.shp bytes → [(record_no, kind, flat [x0,y0,...])].  Polygons keep the
    outer ring only (the reference conflates building outer rings,
    `conflateBuildings.py:106-112`); multi-part polylines concatenate parts."""
    if struct.unpack_from(">i", data, 0)[0] != 9994:
        raise ValueError("not a shapefile (.shp magic 9994 missing)")
    file_len = struct.unpack_from(">i", data, 24)[0] * 2
    out: list[tuple[int, str, list[float]]] = []
    pos = 100
    while pos < file_len:
        rec_no, content_len = struct.unpack_from(">ii", data, pos)
        pos += 8
        end = pos + content_len * 2
        shp_type = struct.unpack_from("<i", data, pos)[0]
        if shp_type == 1:  # Point
            x, y = struct.unpack_from("<dd", data, pos + 4)
            out.append((rec_no, "Point", [x, y]))
        elif shp_type in (3, 5):  # PolyLine / Polygon
            n_parts, n_points = struct.unpack_from("<ii", data, pos + 36)
            parts = struct.unpack_from(f"<{n_parts}i", data, pos + 44)
            pts_off = pos + 44 + 4 * n_parts
            xy = struct.unpack_from(f"<{2 * n_points}d", data, pts_off)
            if shp_type == 5 and n_parts > 1:  # outer ring only
                xy = xy[: 2 * parts[1]]
            out.append((rec_no, _SHAPE_KIND[shp_type], list(xy)))
        # null shapes (0) and unsupported types are skipped
        pos = end
    return out


def parse_dbf(data: bytes) -> list[dict[str, str]]:
    """.dbf bytes → one {field: value} dict per record (text values trimmed;
    deleted records skipped).  dBASE III layout: 32-byte header, 32-byte
    field descriptors terminated by 0x0D, fixed-width records."""
    n_rec = struct.unpack_from("<I", data, 4)[0]
    header_len, rec_len = struct.unpack_from("<HH", data, 8)
    fields: list[tuple[str, int]] = []
    pos = 32
    while data[pos] != 0x0D:
        name = data[pos : pos + 11].split(b"\x00")[0].decode("ascii", "replace")
        length = data[pos + 16]
        fields.append((name, length))
        pos += 32
    out: list[dict[str, str]] = []
    pos = header_len
    for _ in range(n_rec):
        rec = data[pos : pos + rec_len]
        pos += rec_len
        if not rec or rec[0:1] == b"*":  # deleted
            continue
        vals: dict[str, str] = {}
        off = 1
        for name, length in fields:
            raw = rec[off : off + length].decode("latin-1").strip()
            off += length
            if raw:
                vals[name] = raw
        out.append(vals)
    return out


def read_shapefile(spark: SparkSession, shp_path: str) -> DataFrame:
    """.shp (+ sibling .dbf) → (feature_id, kind, geom, tags) rows.  The
    format is unsplittable per file; parallelism comes from many files (the
    reference's per-state/per-forest layout) — pass a glob for a directory
    of shapefiles."""
    import glob as _glob

    paths = sorted(_glob.glob(shp_path)) if any(c in shp_path for c in "*?[") else [shp_path]
    work = spark.createDataFrame([(p,) for p in paths], "path string").repartition(max(len(paths), 1))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for p in pdf["path"]:
                with open(p, "rb") as f:
                    shp = f.read()
                dbf_path = os.path.splitext(p)[0] + ".dbf"
                attrs: list[dict[str, str]] = []
                if os.path.exists(dbf_path):
                    with open(dbf_path, "rb") as f:
                        attrs = parse_dbf(f.read())
                for rec_no, kind, flat in parse_shp(shp):
                    tags = attrs[rec_no - 1] if 0 < rec_no <= len(attrs) else {}
                    rows.append((rec_no, kind, flat, tags))
            yield pd.DataFrame(rows, columns=[f.name for f in ROW_SCHEMA.fields])

    return work.mapInPandas(run, ROW_SCHEMA)
