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


# ---------------------------------------------------------------------------
# Full conversion engine (fieldwork/convert.py:47-339 + xforms.yaml)
# ---------------------------------------------------------------------------

from osm_merge_spark.sources import odk_convert as OC


class TestConvertEngineTruth:
    """Driver-side truth tables vs the reference semantics."""

    def setup_method(self):
        self.cfg = OC.XFormsConfig.default()

    def test_plain_rename(self):
        # `xid: id` (`xforms.yaml`) — rename, value untouched
        assert self.cfg.convert_entry("xid", "123") == [("id", "123")]

    def test_rename_with_value_spec_keeps_raw_value(self):
        # `openfire: leisure=firepit` — convertTag keeps only the pre-'='
        # part (`convert.py:297-299`); the '=firepit' is NOT applied
        assert self.cfg.convert_entry("openfire", "yes") == [("leisure", "yes")]

    def test_value_table_multi_pair(self):
        # food → amenity (rename), then the amenity value table expands
        # coffee to two pairs (`convert.py:268-276`)
        assert self.cfg.convert_entry("food", "coffee") == [
            ("amenity", "cafe"),
            ("cuisine", "coffee_shop"),
        ]

    def test_value_table_single_pair(self):
        assert self.cfg.convert_entry("emergency", "police") == [("amenity", "police")]

    def test_value_table_miss_passes_through(self):
        # value not in the table → {tag: value} (`convert.py:257-259`)
        assert self.cfg.convert_entry("emergency", "lifeguard") == [("emergency", "lifeguard")]

    def test_ele_truncation(self):
        # altitude → ele, value truncated to 7 chars (`convert.py:217-219`)
        assert self.cfg.convert_entry("altitude", "2500.123456") == [("ele", "2500.12")]

    def test_untouched_passthrough(self):
        assert self.cfg.convert_entry("surface", "dirt") == [("surface", "dirt")]

    def test_ignore_dropped(self):
        assert self.cfg.convert_entry("deviceid", "x123") == []

    def test_quirk_renamed_to_string_key_vanishes(self):
        # livestock → drinking_water, itself a string convert key →
        # convertValue returns [] (`convert.py:251-254,277`)
        assert self.cfg.convert_entry("livestock", "cattle") == []

    def test_quirk_capitalized_config_keys_dead(self):
        # `Monday: Mo` is stored verbatim but lookups lowercase
        # (`convert.py:74-89` vs `:125`) — the rename never fires
        assert self.cfg.convert_entry("Monday", "09:00-17:00") == [("monday", "09:00-17:00")]

    def test_multiple_known_choices_join(self):
        # choices with k=v conversions; same-key values ';'-joined
        # (`convert.py:326-339`)
        assert self.cfg.convert_multiple("faucet well") == [
            ("valve", "yes"),
            ("well", "yes"),
        ]
        assert self.cfg.convert_multiple("drinkable_water drinking_water") == [
            ("amenity", "drinking_water;drinking_water")
        ]

    def test_multiple_unknown_choice_yes(self):
        assert self.cfg.convert_multiple("wheelchair parking") == [
            ("wheelchair", "yes"),
            ("parking", "yes"),
        ]

    def test_multiple_no_eq_choice_dropped(self):
        # `xid: id` has no '=' → convertMultiple contributes nothing
        # for that choice (`convert.py:328-337` quirk)
        assert self.cfg.convert_multiple("xid parking") == [("parking", "yes")]


class TestConvertEngineCompiled:
    """The compiled Column engine matches the driver-side truth."""

    def _run(self, spark, tags, multiple=None, drop_private=False):
        cfg = OC.XFormsConfig.default()
        if multiple is not None:
            cfg.multiple = multiple
        df = spark.createDataFrame([(tags,)], "tags map<string,string>")
        return df.select(
            OC.convert_tags("tags", cfg, drop_private=drop_private).alias("t")
        ).first()["t"]

    def test_rename_and_value_table(self, spark):
        got = self._run(spark, {"xid": "77", "food": "coffee", "surface": "dirt"})
        assert got == {"id": "77", "amenity": "cafe", "cuisine": "coffee_shop", "surface": "dirt"}

    def test_ignore_and_quirks(self, spark):
        got = self._run(
            spark,
            {"deviceid": "d", "livestock": "cattle", "Monday": "09-17", "altitude": "2500.123456"},
        )
        assert got == {"monday": "09-17", "ele": "2500.12"}

    def test_select_multiple_semicolon_join(self, spark):
        got = self._run(
            spark,
            {"waterpoint_services": "drinkable_water drinking_water wheelchair xid"},
            multiple=["waterpoint_services"],
        )
        assert got == {"amenity": "drinking_water;drinking_water", "wheelchair": "yes"}

    def test_private_strip_and_extract(self, spark):
        tags = {"age": "41", "income": "x", "name": "A"}
        cfg = OC.XFormsConfig.default()
        df = spark.createDataFrame([(tags,)], "tags map<string,string>")
        row = df.select(
            OC.convert_tags("tags", cfg, drop_private=True).alias("osm"),
            OC.private_tags("tags", cfg).alias("priv"),
        ).first()
        assert row["osm"] == {"name": "A"}
        assert row["priv"] == {"age": "41", "income": "x"}

    def test_empty_values_skipped(self, spark):
        got = self._run(spark, {"name": "", "surface": "dirt"})
        assert got == {"surface": "dirt"}

    def test_compiled_matches_truth_sweep(self, spark):
        """Property-style sweep: every convert key × a few values, the
        compiled engine equals the driver-side truth."""
        cfg = OC.XFormsConfig.default()
        cases = []
        for key in list(cfg.convert) + ["surface", "deviceid", "age"]:
            vals = cfg.convert.get(key)
            probe = list(vals)[:2] + ["zzz"] if isinstance(vals, dict) else ["val1", "zzz"]
            for v in probe:
                cases.append((key, v))
        rows = [({k: v},) for k, v in cases]
        df = spark.createDataFrame(rows, "tags map<string,string>")
        got = [r["t"] for r in df.select(OC.convert_tags("tags", cfg).alias("t")).collect()]
        for (k, v), g in zip(cases, got):
            want = dict(cfg.convert_entry(k, v))
            assert g == want, f"{k}={v}: compiled {g} != truth {want}"

    def test_from_yaml_roundtrip(self, spark, tmp_path):
        y = tmp_path / "custom.yaml"
        y.write_text(
            "convert:\n"
            "  - species: genus\n"
            "  - habitat:\n"
            "      - wetland: natural=wetland,water=marsh\n"
            "ignore:\n  - meta\n"
            "private:\n  - collector\n"
            "multiple:\n  - features\n"
        )
        cfg = OC.XFormsConfig.from_yaml(str(y))
        assert cfg.convert_entry("species", "pinus") == [("genus", "pinus")]
        assert cfg.convert_entry("habitat", "wetland") == [
            ("natural", "wetland"),
            ("water", "marsh"),
        ]
        df = spark.createDataFrame([({"habitat": "wetland", "collector": "me"},)], "tags map<string,string>")
        got = df.select(OC.convert_tags("tags", cfg, drop_private=True).alias("t")).first()["t"]
        assert got == {"natural": "wetland", "water": "marsh"}
