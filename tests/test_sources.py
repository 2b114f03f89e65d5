"""Converter + file-format source/sink tests."""

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from osm_merge_spark.sources import converters as CV
from osm_merge_spark.sources import files as FL


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="oms-src-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_mvum_converter(spark):
    src = spark.createDataFrame(
        [
            (1, "cedar lk  rd", "FS 521.1A", "1", "2", "RD", "05/15-11/30", "Y", None),
            (2, "BEAR CR RD", "30", "3", "5", "TR", "01/01-12/31", None, "Y"),
        ],
        "gid long, name string, id string, sur_code string, smo_code string, "
        "hw_code string, seasonal_dates string, atv string, motorcycle string",
    )
    out = CV.convert(src, CV.MVUM_SPEC, keep_cols=["gid"]).orderBy("gid").collect()
    t1, t2 = out[0]["tags"], out[1]["tags"]
    assert t1["name"] == "Cedar Lake Road"
    assert t1["ref:usfs"] == "FR 521.1A"
    assert t1["surface"] == "dirt" and t1["smoothness"] == "horrible"
    assert t1["highway"] == "track"
    assert t1["opening_hours"] == "May-Nov" and t1["seasonal"] == "yes"
    assert t1["atv"] == "designated" and "motorcycle" not in t1
    assert t1["operator"] == "US Forest Service"
    assert t2["seasonal"] == "no" and t2["ref:usfs"] == "FR 30"
    assert t2["motorcycle"] == "designated" and "atv" not in t2


def test_geojson_roundtrip(spark, tmpdir):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {"type": "LineString", "coordinates": [[-105.0, 40.0], [-104.99, 40.01]]},
                "properties": {"highway": "track", "name": "Elk Road"},
            },
            {
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [-105.5, 39.5]},
                "properties": {"amenity": "parking"},
            },
        ],
    }
    with open(f"{tmpdir}/fc.geojson", "w") as f:
        json.dump(fc, f)
    df = FL.read_geojson(spark, f"{tmpdir}/fc.geojson")
    rows = {r["kind"]: r for r in df.collect()}
    assert rows["LineString"]["geom"] == [-105.0, 40.0, -104.99, 40.01]
    assert rows["LineString"]["tags"]["name"] == "Elk Road"
    assert rows["Point"]["geom"] == [-105.5, 39.5]

    FL.write_geojson_lines(df, f"{tmpdir}/out")
    back = [json.loads(r["value"]) for r in spark.read.text(f"{tmpdir}/out").collect()]
    assert len(back) == 2
    line = [b for b in back if b["geometry"]["type"] == "LineString"][0]
    assert line["geometry"]["coordinates"] == [[-105.0, 40.0], [-104.99, 40.01]]
    assert line["properties"]["name"] == "Elk Road"


OSM_XML = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6">
  <node id="101" version="2" lon="-105.0" lat="40.0"/>
  <node id="102" version="1" lon="-104.99" lat="40.01">
    <tag k="amenity" v="parking"/>
    <tag k="tiger:county" v="Routt"/>
  </node>
  <way id="7" version="3">
    <nd ref="101"/>
    <nd ref="102"/>
    <tag k="highway" v="track"/>
    <tag k="name" v="Elk Road"/>
  </way>
</osm>
"""


def test_osm_xml_scan_and_way_build(spark, tmpdir):
    with open(f"{tmpdir}/test.osm", "w") as f:
        f.write(OSM_XML)
    osm = FL.read_osm_xml(spark, f"{tmpdir}/test.osm")
    rows = {(r["kind"], r["osm_id"]): r for r in osm.collect()}
    assert rows[("node", 102)]["tags"] == {"amenity": "parking"}  # tiger dropped
    assert rows[("way", 7)]["refs"] == [101, 102]
    ways = FL.build_way_geometries(osm).collect()
    assert len(ways) == 1
    assert ways[0]["geom"] == [-105.0, 40.0, -104.99, 40.01]
    assert ways[0]["tags"]["name"] == "Elk Road"


def test_osm_xml_sink(spark, tmpdir):
    with open(f"{tmpdir}/test.osm", "w") as f:
        f.write(OSM_XML)
    osm = FL.read_osm_xml(spark, f"{tmpdir}/test.osm")
    ways = FL.build_way_geometries(osm)
    ways_refs = osm.filter(F.col("kind") == "way")
    xml = FL.to_osm_xml(ways_refs, kind="way", modify=True).collect()[0]["xml"]
    assert 'action="modify"' in xml
    assert 'version="4"' in xml  # 3 + 1
    assert '<nd ref="101"/>' in xml
    assert '<tag k="highway" v="track"/>' in xml
    assert xml.startswith("<way") and xml.endswith("</way>")


def test_osm_xml_sink_escapes_adversarial_tags(spark):
    """K2 escaping parity with the reference's html.escape on both keys and
    values (`osmfile.py:395-397`): tags containing & < > \" ' must round-trip
    through a strict XML parser (VERDICT r5 'What's wrong' #1)."""
    import xml.etree.ElementTree as ET

    nasty = {
        "name": 'Smith & Sons "East" Rd',
        "note<weird>": "a<b>&c",
        "apos": "it's",
        "amp;trick": "&amp; already escaped stays literal",
    }
    df = spark.createDataFrame(
        [(1, 2, nasty, [101, 102])],
        "osm_id bigint, version bigint, tags map<string,string>, refs array<bigint>",
    )
    xml = FL.to_osm_xml(df, kind="way", modify=True).collect()[0]["xml"]
    elem = ET.fromstring(xml)  # raises on any unescaped & < > in attributes
    parsed = {t.get("k"): t.get("v") for t in elem.findall("tag")}
    assert parsed == nasty  # parser unescaping inverts the sink's escaping


def test_geojson_chunked_reader(spark, tmpdir):
    """S2: ndjson chunked scan — deterministic ids, chunk column, and
    resumable chunked processing via the lineage checkpoint (K7)."""
    feats = [
        {
            "type": "Feature",
            "geometry": {"type": "LineString",
                         "coordinates": [[-105.0 - i * 0.01, 40.0], [-104.99 - i * 0.01, 40.01]]},
            "properties": {"name": f"Way {i}", "highway": "track"},
        }
        for i in range(20)
    ]
    path = f"{tmpdir}/feats.ndjson"
    with open(path, "w") as f:
        for ft in feats:
            f.write(json.dumps(ft) + "\n")

    df = FL.read_geojson_lines(spark, path, n_chunks=4)
    rows = df.collect()
    assert len(rows) == 20
    assert all(r["kind"] == "LineString" and len(r["geom"]) == 4 for r in rows)
    assert all(0 <= r["chunk"] < 4 for r in rows)
    # ids are stable across re-reads (hash of the line, not read order)
    again = {r["feature_id"] for r in FL.read_geojson_lines(spark, path).collect()}
    assert again == {r["feature_id"] for r in rows}
    names = {r["tags"]["name"] for r in rows}
    assert names == {f"Way {i}" for i in range(20)}

    # chunked processing with resume: first run completes all chunks,
    # second run with the same run_id skips every one
    out = f"{tmpdir}/chunked_out"
    job = lambda part: part.select("feature_id", "kind")  # noqa: E731
    r1 = FL.process_geojson_chunked(spark, path, job, out, run_id="r1", n_chunks=4)
    assert sorted(r1["completed"]) == [0, 1, 2, 3] and r1["output_rows"] == 20
    r2 = FL.process_geojson_chunked(spark, path, job, out, run_id="r1", n_chunks=4)
    assert sorted(r2["skipped"]) == [0, 1, 2, 3] and not r2["completed"]
