"""ODK source tests (S5): CSV/JSON file ingest through the real readers,
warmup-location fallback, metadata ignore, tag renames, and the POI-join
hand-off (`fieldwork/parsers.py:88-214` semantics)."""

import json
import os

from osm_merge_spark.sources import odk as ODK


def test_basename():
    assert ODK.basename("all-group-sub-latitude") == "latitude"
    assert ODK.basename("xformns:amenity") == "amenity"
    assert ODK.basename("Name") == "name"


def test_csv_roundtrip(spark, tmp_path):
    csv = tmp_path / "submissions.csv"
    csv.write_text(
        "SubmissionDate,all-location-latitude,all-location-longitude,"
        "all-warmup-latitude,all-warmup-longitude,all-poi-name,all-poi-cafe_type,deviceid\n"
        "2024-05-01,39.5,-106.1,39.9,-106.9,Bear Cafe,coffee_shop,abc123\n"
        "2024-05-02,,,38.5,-105.5,Elk Diner,regional,abc124\n"
    )
    out = ODK.read_odk_csv(spark, str(csv)).orderBy("lat").collect()
    assert len(out) == 2
    # row 2: primary location empty → warmup carries it
    assert (out[0]["lon"], out[0]["lat"]) == (-105.5, 38.5)
    assert (out[1]["lon"], out[1]["lat"]) == (-106.1, 39.5)  # primary wins
    assert out[1]["tags"]["name"] == "Bear Cafe"
    assert out[1]["tags"]["cuisine"] == "coffee_shop"  # cafe_type renamed
    assert "submissiondate" not in out[1]["tags"] and "deviceid" not in out[1]["tags"]


def test_json_nested_flatten(spark, tmp_path):
    j = tmp_path / "submissions.json"
    j.write_text(
        json.dumps(
            [
                {
                    "meta": {"instanceID": "uuid:1"},
                    "location": {"latitude": "39.25", "longitude": "-106.25"},
                    "poi": {"name": "Granite Overlook", "amenity": "viewpoint"},
                    "deviceid": "x",
                }
            ]
        )
    )
    out = ODK.read_odk_json(spark, str(j)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["lon"], r["lat"]) == (-106.25, 39.25)
    assert r["tags"]["name"] == "Granite Overlook"
    assert r["tags"]["amenity"] == "viewpoint"
    assert "instanceid" not in r["tags"] and "deviceid" not in r["tags"]


def test_odk_feeds_knn(spark):
    """The conflatePOI flow: parsed POIs join nodes within tolerance."""
    from osm_merge_spark.operators import poi as P

    probes = spark.createDataFrame(
        [(1, "39.0", "-106.0", "A"), (2, "39.5", "-105.0", "B")],
        "`sub-id` int, `g-latitude` string, `g-longitude` string, `g-name` string",
    )
    feats = ODK.odk_to_features(probes, id_col="sub-id")
    targets = spark.createDataFrame(
        [(10, -106.0001, 39.0), (11, -104.0, 38.0)], "osm_id int, lon double, lat double"
    )
    got = P.knn_join(feats, targets, tolerance_m=50.0, k=1, probe_id="sub-id", target_id="osm_id").collect()
    assert len(got) == 1 and got[0]["osm_id"] == 10 and got[0]["sub-id"] == 1


def test_xml_instance_parse(spark, tmp_path):
    """S5 XML variant (`parsers.py:287-358`): per-file instances, ':'-path
    flatten, geopoint detection (lat first), ignore list, renames."""
    d = tmp_path / "instances"
    d.mkdir()
    (d / "a.xml").write_text(
        '<data xmlns:jr="http://openrosa.org/javarosa" id="waterpoints">'
        "<meta><instanceID>uuid:42</instanceID></meta>"
        "<start>2024-05-01T10:00:00</start>"
        "<all><location><warmup>39.9 -106.9 2400.0 5.0</warmup>"
        "<geopoint>39.5 -106.1 2500.0 4.0</geopoint></location>"
        "<poi><name>Bear Cafe</name><cafe_type>coffee_shop</cafe_type>"
        "<comment>busy</comment><empty/></poi></all></data>"
    )
    (d / "b.xml").write_text(
        "<data><all><location><geopoint>38.5 -105.5 2000.0 3.0</geopoint></location>"
        "<poi><xid>FR 325.1</xid><existing>yes</existing></poi></all></data>"
    )
    out = ODK.read_odk_xml(spark, str(d)).orderBy("lat").collect()
    assert len(out) == 2
    a, b = out[1], out[0]
    # last geopoint wins (reference overwrites geom per match); lat is FIRST
    assert (a["lon"], a["lat"]) == (-106.1, 39.5)
    assert a["tags"] == {"name": "Bear Cafe", "cuisine": "coffee_shop", "note": "busy"}
    assert (b["lon"], b["lat"]) == (-105.5, 38.5)
    assert b["tags"] == {"ref": "FR 325.1", "building": "yes"}


def test_xml_matches_csv_features(spark, tmp_path):
    """The XML and CSV paths of the same submission produce the same
    feature — the conflatePOI input contract is format-independent."""
    csv = tmp_path / "s.csv"
    csv.write_text(
        "SubmissionDate,all-location-latitude,all-location-longitude,all-poi-name,deviceid\n"
        "2024-05-01,39.25,-106.25,Granite Overlook,x\n"
    )
    d = tmp_path / "x"
    d.mkdir()
    (d / "s.xml").write_text(
        "<data><submissiondate>2024-05-01</submissiondate>"
        "<all><location><geopoint>39.25 -106.25 2500.0 4.0</geopoint></location>"
        "<poi><name>Granite Overlook</name></poi></all>"
        "<deviceid>x</deviceid></data>"
    )
    from_csv = ODK.read_odk_csv(spark, str(csv)).select("lon", "lat", "tags").first()
    from_xml = ODK.read_odk_xml(spark, str(d)).select("lon", "lat", "tags").first()
    assert from_csv == from_xml
