"""fieldwork/filter_data.py semantics (the last reference utility): the
choices-sheet parse truth table, the data-model category filter (the
reference's documented-but-dead branch, live here), and the flatten/title
path — pinned against a row-level python mirror of the reference logic."""

import pytest
from pyspark.sql import functions as F

from osm_merge_spark.sources import filter_data as FD


# ---------------------------------------------------------------------------
# parse_choices truth table (filter_data.py:77-113)
# ---------------------------------------------------------------------------


def test_parse_skips_row_zero_like_reference():
    rows = [
        {"list_name": "highway", "name": "skipped-by-index-1-start"},
        {"list_name": "highway", "name": "path"},
    ]
    model, _ = FD.parse_choices(rows)
    assert model == {"highway": ["path"]}


def test_parse_skips_model_nan_text_null():
    rows = [
        {"list_name": None, "name": "row0"},
        {"list_name": "model", "name": "ignored"},          # filter_data.py:81
        {"list_name": float("nan"), "name": "ignored"},     # str(key) == 'nan'
        {"list_name": "amenity", "name": "<text>"},         # filter_data.py:85
        {"list_name": "amenity", "name": "null"},           # str 'null'
        {"list_name": "amenity", "name": "cafe"},
        {"list_name": "amenity", "name": "pub"},
    ]
    model, _ = FD.parse_choices(rows)
    assert model == {"amenity": ["cafe", "pub"]}


def test_parse_keep_extends_defaults():
    _, keep = FD.parse_choices([{}], config_keep=["ref", "access"])
    assert list(FD.DEFAULT_KEEP) == keep[: len(FD.DEFAULT_KEEP)]
    assert keep[-2:] == ["ref", "access"]


# ---------------------------------------------------------------------------
# reference-mirror truth table for the model filter (filter_data.py:173-190,
# the dead-branch semantics)
# ---------------------------------------------------------------------------


def _reference_filter(properties, model, keep=FD.CLEAN_KEEP):
    """Row-level mirror of the reference's dead branch: keep-list first,
    then model-list membership; everything else (including ignore-set noise
    and the silent 'yes') is dropped."""
    out = {}
    for key, value in properties.items():
        if key in keep:
            out[key] = value
            continue
        if key in model:
            if value in model[key]:
                out[key] = value
            # else dropped ('yes' silently, others with a warning)
    return out


MODEL = {"highway": ["path", "footway", "track"], "surface": ["dirt", "gravel"]}

CASES = [
    {"highway": "path", "surface": "dirt"},
    {"highway": "junkval", "surface": "gravel"},      # out-of-model value dropped
    {"highway": "yes"},                                # the silent-yes drop
    {"timestamp": "2024", "changeset": "9", "foo": "bar"},  # noise + unknown
    {"version": "2", "timestamp": "x"},                # keep beats ignore for 'version'
    {"osm_id": "123", "highway": "track"},
    {},
]


def test_model_filter_matches_reference_truth_table(spark):
    rows = [(i, c) for i, c in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i int, tags map<string,string>")
    got = {
        r["i"]: r["f"]
        for r in df.select("i", FD.filter_tags_by_model(F.col("tags"), MODEL).alias("f")).collect()
    }
    for i, case in enumerate(CASES):
        assert got[i] == _reference_filter(case, MODEL), f"case {i}: {case}"


def test_version_survives_because_keep_checked_before_ignore(spark):
    # 'version' is in BOTH CLEAN_KEEP and DEFAULT_IGNORE; the reference
    # checks keep first (filter_data.py:173-175) so it survives
    df = spark.createDataFrame([({"version": "3"},)], "tags map<string,string>")
    out = df.select(FD.filter_tags_by_model(F.col("tags"), MODEL).alias("f")).first()["f"]
    assert out == {"version": "3"}


def test_empty_model_keeps_only_keep_columns(spark):
    df = spark.createDataFrame(
        [({"osm_id": "7", "highway": "path"},)], "tags map<string,string>"
    )
    out = df.select(FD.filter_tags_by_model(F.col("tags"), {}).alias("f")).first()["f"]
    assert out == {"osm_id": "7"}


# ---------------------------------------------------------------------------
# live flatten path (filter_data.py:147-195)
# ---------------------------------------------------------------------------


def test_clean_properties_title_from_first_name_tag(spark):
    df = spark.createDataFrame(
        [
            (1, {"name:en": "Zed", "name": "Alpha", "highway": "path"}),
            (2, {"highway": "track"}),  # no name* → title falls back to id
        ],
        "osm_id bigint, tags map<string,string>",
    )
    out = {
        r["osm_id"]: r["p"]
        for r in df.select(
            "osm_id", FD.clean_properties(F.col("tags"), F.col("osm_id")).alias("p")
        ).collect()
    }
    # deterministic: first name* key in sorted order ('name' < 'name:en'),
    # NOT the reference's insertion-order last-writer-wins (documented quirk)
    assert out[1]["title"] == "Alpha" and out[1]["label"] == "Alpha"
    assert out[1]["properties"] == {"highway": "path"}  # name* routed out
    assert out[2]["title"] == "2" and out[2]["id"] == "2"
    assert out[2]["properties"] == {"highway": "track"}


def test_title_from_tags_is_ansi_safe_on_empty_map(spark):
    df = spark.createDataFrame([(9, {})], "osm_id bigint, tags map<string,string>")
    got = df.select(FD.title_from_tags(F.col("tags"), F.col("osm_id")).alias("t")).first()["t"]
    assert got == "9"
