"""Converter family unit tests: the branch behavior of each spec against
hand-computed expectations (the oracle queries cover hash parity at scale;
these pin the semantics on crafted edge rows).

Reference branches exercised:
- trails.py:127-130  ' Trail' suffix rule
- usgs.py:142-186    name-field ref-mining ladder (incl. the no-space CR<N>)
- blm.py:160-166     BLM-prefix idempotence; numeric names are refs
- local_roads.py:117-168  int refs, Fs N-Name split, ;-consolidation
- osmhighways.py:119-221  FSR renorm, County-Road consumption, consolidation
"""

from pyspark.sql import functions as F

from osm_merge_spark.sources import converters as CV


def _tags(df):
    return {r["gid"]: r["tags"] for r in df.collect()}


def test_trails_suffix_and_access(spark):
    src = spark.createDataFrame(
        [(1, "bear creek", "101", "05/01-11/30", "Y", "N"),
         (2, "elk ridge trail", "102", "01/01-12/31", "N", "Y")],
        "gid int, name string, trail_no string, season_dates string, atv string, horse string",
    )
    t = _tags(CV.convert(src, CV.TRAILS_SPEC, keep_cols=["gid"]))
    assert t[1]["name"] == "Bear Creek Trail"          # suffix appended
    assert t[2]["name"] == "Elk Ridge Trail"           # already present
    assert t[1]["ref:usfs"] == "FR 101"
    assert t[1]["atv"] == "designated" and "horse" not in t[1]
    assert t[2]["horse"] == "designated" and "atv" not in t[2]
    assert t[1]["opening_hours"] == "May-Nov" and t[1]["seasonal"] == "yes"
    assert t[2]["seasonal"] == "no"
    assert t[1]["highway"] == "path" and t[1]["operator"] == "US Forest Service"


def test_usgs_ref_mining_ladder(spark):
    src = spark.createDataFrame(
        [(1, "County Road 12"), (2, "Old Co Rd 7"), (3, "Rd 44"),
         (4, "usfs Road 332"), (5, "Main Street"), (6, "County Road"), (7, "Solo")],
        "gid int, name string",
    )
    t = _tags(CV.convert(src, CV.USGS_SPEC, keep_cols=["gid"]))
    assert t[1]["ref"] == "CR12" and "name" not in t[1]   # usgs.py:147 — no space
    assert t[2]["ref"] == "CR 7"
    assert t[3]["ref"] == "CR 44"
    assert t[4]["ref"] == "FR 332"
    assert t[5]["name"] == "Main Street" and "ref" not in t[5]
    assert "ref" not in t[6] and "name" not in t[6]       # bare 'County Road' consumed
    assert "name" not in t[7]                             # no space → no name branch
    assert all(v["highway"] == "unclassified" for v in t.values())


def test_blm_refs_and_mode(spark):
    src = spark.createDataFrame(
        [(1, "Motorized", "BLM 12", "Juniper Flats"),
         (2, "Non-Mechanized", "440", "Juniper Flats"),
         (3, "Motorized", None, "7201")],
        "gid int, plan_mode string, rd_id string, name string",
    )
    t = _tags(CV.convert(src, CV.BLM_SPEC, keep_cols=["gid"]))
    assert t[1]["ref"] == "BLM 12" and t[1]["highway"] == "track"
    assert t[2]["ref"] == "BLM 440" and t[2]["highway"] == "path"
    assert t[3]["ref"] == "BLM 7201" and "name" not in t[3]
    assert t[1]["name"] == "Juniper Flats" and t[1]["operator"] == "BLM"


def test_local_roads_consolidation(spark):
    src = spark.createDataFrame(
        [(1, 15, "Fs 428-cedar ridge"),     # CR + FR consolidation
         (2, None, "Fs 91"),                # FR only, no dash → name keeps Fs form
         (3, None, "County Road 8"),
         (4, 22, "plain old lane"),
         (5, None, "428"),                  # numeric name → ref, name dropped
         (6, None, "no ref here at all")],  # no ref → row dropped
        "gid int, rd_num int, road_name string",
    )
    out = CV.local_roads_convert(src, keep_cols=["gid"])
    t = _tags(out)
    assert t[1]["ref"] == "CR 15;FR 428" and t[1]["name"] == "Cedar Ridge"
    assert t[2]["ref"] == "FR 91" and t[2]["name"] == "Fs 91"
    assert t[3]["ref"] == "CR 8" and t[3]["name"] == "County Road 8"
    assert t[4]["ref"] == "CR 22" and t[4]["name"] == "Plain Old Lane"
    assert t[5]["ref"] == "CR 428" and "name" not in t[5]
    assert 6 not in t


def test_osmhighways_filter(spark):
    src = spark.createDataFrame(
        [(1, {"highway": "track", "name": "County Road 15", "ref:usfs": "FSR 70",
              "tiger:cfcc": "A41", "_FID": "9"}),
         (2, {"highway": "path", "name": "Bear Road", "ref:usfs": "FS 123.1A"}),
         (3, {"highway": "track", "name": "Elk Road 9", "ref:usfs": "Forest Service Road 44"})],
        "gid int, tags map<string,string>",
    )
    t = _tags(CV.osmhighways_filter(src, keep_cols=["gid"]))
    # county name consumed → CR ref; FSR renormalized; junk dropped; consolidated
    assert t[1]["ref"] == "CR 15;FR 70"
    assert "name" not in t[1] and "tiger:cfcc" not in t[1] and "_FID" not in t[1]
    assert t[2]["ref"] == "FS 123.1A" and t[2]["name"] == "Bear Road"
    # non-FS-prefixed ref:usfs falls back to the name's last token (getRef)
    assert t[3]["ref"] == "FR 9"
    assert all(v["highway"] in ("track", "path") for v in t.values())
