"""S4 (OSM PBF) + S6 (shapefile) ingest tests.

The PBF reader is checked against the reference's own fixture pair
(`libosm/testsuite/test-data/test.pbf` vs `test.osm` — same objects in both
formats): identical ids, refs, tags, and coordinates.  The shapefile reader
round-trips spec-conformant bytes built with struct (no GDAL in the env).
"""

import struct

import pytest
from pyspark.sql import functions as F

from osm_merge_spark.sources import files as FS
from osm_merge_spark.sources import pbf as PBF
from osm_merge_spark.sources import shapefile as SHP

TEST_PBF = "/root/reference/libosm/testsuite/test-data/test.pbf"
TEST_OSM = "/root/reference/libosm/testsuite/test-data/test.osm"


def test_varint_decoding():
    import numpy as np

    # 1, 300, 2^40 as packed varints
    buf = bytes([0x01]) + bytes([0xAC, 0x02]) + bytes([0x80, 0x80, 0x80, 0x80, 0x80, 0x20])
    assert PBF.decode_packed_varints(buf).tolist() == [1, 300, 1 << 40]
    # zigzag deltas: [+5, -3, +10] → cumsum [5, 2, 12]
    zz = bytes([10, 5, 20])
    assert PBF.decode_packed_sint_delta(zz).tolist() == [5, 2, 12]


def test_pbf_matches_xml_fixture(spark):
    pbf = PBF.read_osm_pbf(spark, TEST_PBF).cache()
    xml = FS.read_osm_xml(spark, TEST_OSM).cache()
    assert pbf.groupBy("kind").count().collect() == xml.groupBy("kind").count().collect()

    def ways(df):
        return df.filter("kind='way'").select(
            "osm_id",
            F.to_json("refs").alias("refs"),
            F.to_json(F.array_sort(F.map_entries(F.map_filter("tags", lambda k, v: k != "created_by")))).alias("t"),
        )

    assert ways(pbf).subtract(ways(xml)).count() == 0
    assert ways(xml).subtract(ways(pbf)).count() == 0

    def nodes(df):
        return df.filter("kind='node'").select("osm_id", F.round("lon", 7).alias("lon"), F.round("lat", 7).alias("lat"))

    assert nodes(pbf).subtract(nodes(xml)).count() == 0


def test_pbf_feeds_way_geometry_build(spark):
    ways = FS.build_way_geometries(PBF.read_osm_pbf(spark, TEST_PBF))
    n = ways.filter(F.size("geom") >= 4).count()
    assert n == 347


def _make_shapefile(tmp_path, name="roads"):
    """Craft a minimal spec-conformant .shp (1 point + 1 polyline) + .dbf."""
    # --- .shp ---
    recs = b""
    # record 1: Point(-106.5, 39.0)
    content = struct.pack("<i", 1) + struct.pack("<dd", -106.5, 39.0)
    recs += struct.pack(">ii", 1, len(content) // 2) + content
    # record 2: PolyLine 1 part, 3 points
    pts = [(-106.0, 39.0), (-106.001, 39.001), (-106.002, 39.0015)]
    content = struct.pack("<i", 3)
    content += struct.pack("<4d", -106.002, 39.0, -106.0, 39.0015)  # bbox
    content += struct.pack("<ii", 1, 3) + struct.pack("<i", 0)
    for x, y in pts:
        content += struct.pack("<dd", x, y)
    recs += struct.pack(">ii", 2, len(content) // 2) + content
    header = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", (100 + len(recs)) // 2)
    header += struct.pack("<ii", 1000, 3) + struct.pack("<8d", -107, 38, -105, 40, 0, 0, 0, 0)
    (tmp_path / f"{name}.shp").write_bytes(header + recs)
    # --- .dbf: fields NAME (C,12), SURFACE (C,8) ---
    fields = b""
    for fname, ln in ((b"NAME", 12), (b"SURFACE", 8)):
        fields += fname.ljust(11, b"\x00") + b"C" + b"\x00" * 4 + bytes([ln]) + b"\x00" * 15
    rec_len = 1 + 12 + 8
    header_len = 32 + len(fields) + 1
    dbf = struct.pack("<B3xI2H20x", 3, 2, header_len, rec_len) + fields + b"\x0d"
    dbf += b" " + b"Trailhead".ljust(12) + b"".ljust(8)
    dbf += b" " + b"Bear Road".ljust(12) + b"gravel".ljust(8)
    (tmp_path / f"{name}.dbf").write_bytes(dbf)
    return str(tmp_path / f"{name}.shp")


def test_shapefile_roundtrip(spark, tmp_path):
    path = _make_shapefile(tmp_path)
    rows = {r["feature_id"]: r for r in SHP.read_shapefile(spark, path).collect()}
    assert rows[1]["kind"] == "Point" and rows[1]["geom"] == [-106.5, 39.0]
    assert rows[1]["tags"] == {"NAME": "Trailhead"}
    assert rows[2]["kind"] == "LineString" and len(rows[2]["geom"]) == 6
    assert rows[2]["tags"] == {"NAME": "Bear Road", "SURFACE": "gravel"}


def test_shapefile_feeds_converter(spark, tmp_path):
    """S6 → P8: shapefile attributes drive the converter family."""
    from osm_merge_spark.sources import converters as CV

    path = _make_shapefile(tmp_path)
    df = SHP.read_shapefile(spark, path).select(
        "feature_id", F.element_at("tags", F.lit("NAME")).alias("name")
    )
    out = CV.convert(df, CV.USGS_SPEC, keep_cols=["feature_id"])
    t = {r["feature_id"]: r["tags"] for r in out.collect()}
    assert t[2]["name"] == "Bear Road" and t[2]["highway"] == "unclassified"
