"""OsmAnd favorites GPX sink (K8, `fieldwork/osm2favorities.py:38-140`):
centroid kernel, icon-ladder quirks, and a full write→parse round-trip."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_merge_spark import geometry as G
from osm_merge_spark.sources import gpx as GX


def _ragged(rows):
    offsets = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum([len(r) for r in rows], out=offsets[1:])
    flat = np.array([p for r in rows for p in r], dtype=float).reshape(-1, 2)
    return offsets, flat


class TestPolygonCentroid:
    def test_square_ring_centers(self):
        sq = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]
        off, flat = _ragged([sq])
        c = G.polygon_centroid(off, flat)
        np.testing.assert_allclose(c, [[1.0, 1.0]], atol=1e-12)

    def test_closed_ring_matches_open(self):
        sq = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]
        off, flat = _ragged([sq + [sq[0]]])
        c = G.polygon_centroid(off, flat)
        np.testing.assert_allclose(c, [[1.0, 1.0]], atol=1e-12)

    def test_asymmetric_ring_is_area_weighted(self):
        # L-shape: vertex mean (1, 1) != area centroid (5/6, 5/6)
        ring = [(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0), (1.0, 2.0), (0.0, 2.0)]
        off, flat = _ragged([ring])
        c = G.polygon_centroid(off, flat)
        np.testing.assert_allclose(c, [[5.0 / 6.0, 5.0 / 6.0]], atol=1e-12)

    def test_point_and_empty(self):
        off, flat = _ragged([[(5.0, 7.0)], []])
        c = G.polygon_centroid(off, flat)
        np.testing.assert_allclose(c[0], [5.0, 7.0])
        assert np.isnan(c[1]).all()


@pytest.fixture(scope="module")
def feats(spark):
    rows = [
        # polygon camp site → centroid + camp icon + color
        (1, "POLYGON((10 10,12 10,12 12,10 12,10 10))", {"name": "Alpha", "tourism": "camp site"}),
        # picnic site: the reference's unreachable second branch → NO icon
        (2, "POINT(1 2)", {"name": "Beta", "tourism": "picnic site"}),
        # trailhead → special_trekking, color #a71de1
        (3, "POINT(3 4)", {"name": "Gamma", "highway": "trailhead"}),
        # parking → icon, no color
        (4, "POINT(5 6)", {"name": "Delta", "amenity": "parking"}),
        # highway present → amenity ignored (`osm2favorities.py:105-107`)
        (5, "POINT(7 8)", {"name": "Eps", "highway": "residential", "amenity": "parking"}),
        # nameless, two tags → key-sorted description, empty name
        (6, "POINT(9 1)", {"surface": "dirt", "access": "yes"}),
    ]
    df = spark.createDataFrame(rows, "id int, geom string, tags map<string,string>")
    return GX.favorite_waypoints(df).orderBy("id").collect()


class TestFavoriteWaypoints:
    def test_polygon_collapses_to_centroid(self, feats):
        assert (feats[0].lon, feats[0].lat) == (11.0, 11.0)
        assert feats[0].icon == "tourism_camp_site"
        assert feats[0].background == "circle"
        assert feats[0].color == "#ff5020"

    def test_picnic_quirk_no_icon(self, feats):
        assert feats[1].icon is None
        assert feats[1].background is None
        assert feats[1].color is None

    def test_trailhead_and_parking(self, feats):
        assert feats[2].icon == "special_trekking"
        assert feats[2].color == "#a71de1"
        assert feats[3].icon == "amenity_parking"
        assert feats[3].color is None

    def test_highway_shadows_amenity(self, feats):
        assert feats[4].icon is None

    def test_description_sorted_nameless(self, feats):
        assert feats[5].name == ""
        assert feats[5].description == "<p>access = yes<br></p><p>surface = dirt<br></p>"


def test_gpx_round_trip(spark, tmp_path):
    rows = [
        (1, "POINT(-105.5 39.25)", {"name": "A <camp> & co", "tourism": "camp site"}),
        (2, "POINT(-105.6 39.35)", {"name": "B", "highway": "trailhead"}),
        (3, "POINT(-105.7 39.45)", {"name": "C", "tourism": "picnic site"}),
    ]
    df = spark.createDataFrame(rows, "id int, geom string, tags map<string,string>")
    path = str(tmp_path / "favorites.gpx")
    n = GX.write_gpx_favorites(GX.favorite_waypoints(df), path, order_col="id")
    assert n == 3
    got = GX.read_gpx_favorites(path)
    assert [w["name"] for w in got] == ["A <camp> & co", "B", "C"]
    assert got[0]["icon"] == "tourism_camp_site"
    assert got[0]["color"] == "#ff5020"
    assert got[1]["icon"] == "special_trekking"
    assert got[2]["icon"] is None
    assert got[0]["lon"] == -105.5 and got[0]["lat"] == 39.25
    assert got[0]["description"] == "<p>tourism = camp site<br></p>"


def test_empty_string_tags_count_as_absent(spark):
    # reference gates on Python truthiness (`if tourism and ...`,
    # `osm2favorities.py:96-107`): "" behaves like a missing tag
    rows = [
        (1, "POINT(0 0)", {"name": "T", "tourism": ""}),
        (2, "POINT(0 0)", {"name": "H", "highway": "", "amenity": "parking"}),
    ]
    df = spark.createDataFrame(rows, "id int, geom string, tags map<string,string>")
    got = GX.favorite_waypoints(df).orderBy("id").collect()
    assert got[0].icon is None  # empty tourism ≠ camp site
    assert got[1].icon == "amenity_parking"  # empty highway doesn't shadow amenity


def test_nonfinite_waypoints_skipped(spark, tmp_path):
    rows = [
        (1, "POINT(-105.5 39.25)", {"name": "ok"}),
        (2, "", {"name": "broken"}),  # empty WKT → NaN centroid
    ]
    df = spark.createDataFrame(rows, "id int, geom string, tags map<string,string>")
    path = str(tmp_path / "fav.gpx")
    n = GX.write_gpx_favorites(GX.favorite_waypoints(df), path, order_col="id")
    assert n == 1
    got = GX.read_gpx_favorites(path)
    assert [w["name"] for w in got] == ["ok"]
    assert "nan" not in open(path).read()
