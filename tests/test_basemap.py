"""S8 basemap acquisition: provider URL templates (`basemapper.py:167-204`)
and the resumable download shape (`basemapper.py:206-270`)."""

import os

from pyspark.sql import functions as F

from osm_merge_spark.sources import basemap as BM


def test_format_url_providers():
    tile = (3, 5, 4)  # (x, y, z)
    assert (
        BM.format_url(BM.PROVIDERS["esri"], tile)
        == "http://clarity.maptiles.arcgis.com/arcgis/rest/services/World_Imagery/MapServer/tile/4/5/3"
    )
    assert BM.format_url(BM.PROVIDERS["usgs"], tile).endswith("/USGSImageryOnly/MapServer/tile/4/5/3")
    assert BM.format_url(BM.PROVIDERS["google"], tile) == "https://mt0.google.com/vt?lyrs=s&x=3&s=&y=5&z=4"
    # bing: quadkey of z=4, x=3, y=5 → digits: z4 bits (x=0011, y=0101) → 0,2,1,3
    assert BM.format_url(BM.PROVIDERS["bing"], tile) == (
        "http://ecn.t0.tiles.virtualearth.net/tiles/h0213.jpg?g=129&mkt=en&stl=H"
    )
    # xy flag flips the path order for path-substituted sources
    custom = {"url": "https://tiles.example.com/%s.png", "suffix": "png", "xy": True, "source": "custom"}
    assert BM.format_url(custom, tile) == "https://tiles.example.com/4/3/5.png"
    assert BM.format_url({"url": "x%s", "source": "wms"}, tile) is None


def test_format_url_col_matches_scalar(spark):
    tiles = spark.createDataFrame(
        [(4, 3, 5), (10, 511, 340), (17, 12345, 67890)], "z int, x long, y long"
    )
    with_urls = BM.tile_urls(tiles)
    for r in with_urls.collect():
        for name, site in BM.PROVIDERS.items():
            assert r[f"url_{name}"] == BM.format_url(site, (r.x, r.y, r.z))


def test_download_resume_and_mirror_fallback(spark, tmp_path):
    dest = str(tmp_path / "cache")
    log_dir = str(tmp_path / "calls")
    os.makedirs(log_dir)

    # fetch runs in the Python workers — record calls as marker files on the
    # shared tmp dir (a driver-side list would never see worker appends)
    def make_fetch(log_dir):
        def fake_fetch(url):
            import uuid

            with open(os.path.join(log_dir, uuid.uuid4().hex), "w") as fd:
                fd.write(url)
            if "maptiles.arcgis.com" in url:
                raise IOError("mirror down")
            return b"PAYLOAD:" + url.encode()

        return fake_fetch

    tiles = spark.createDataFrame([(4, 3, 5), (4, 3, 6)], "z int, x long, y long")
    mirrors = [BM.PROVIDERS["esri"], BM.PROVIDERS["usgs"]]

    out1 = BM.download_tiles(tiles, dest, mirrors=mirrors, fetch=make_fetch(log_dir)).collect()
    assert {r.status for r in out1} == {"downloaded"}
    # on-disk layout {z}/{y}/{x}.{suffix} with the first mirror's suffix
    assert os.path.exists(os.path.join(dest, "4/5/3.jpg"))
    assert os.path.exists(os.path.join(dest, "4/6/3.jpg"))
    with open(os.path.join(dest, "4/5/3.jpg"), "rb") as fd:
        assert b"USGSImageryOnly" in fd.read()  # fallback mirror supplied it

    def calls():
        out = []
        for f in os.listdir(log_dir):
            with open(os.path.join(log_dir, f)) as fd:
                out.append(fd.read())
        return out

    # esri tried first and failed for both tiles, then usgs succeeded
    assert sum("arcgis" in u for u in calls()) == 2
    assert sum("USGSImageryOnly" in u for u in calls()) == 2

    # resume: second run touches nothing and fetches nothing
    for f in os.listdir(log_dir):
        os.unlink(os.path.join(log_dir, f))
    out2 = BM.download_tiles(tiles, dest, mirrors=mirrors, fetch=make_fetch(log_dir)).collect()
    assert {r.status for r in out2} == {"exists"}
    assert calls() == []


def test_download_all_mirrors_fail(spark, tmp_path):
    def dead(url):
        raise IOError("no network")

    tiles = spark.createDataFrame([(2, 1, 1)], "z int, x long, y long")
    out = BM.download_tiles(tiles, str(tmp_path / "c"), fetch=dead).collect()
    assert out[0].status == "failed"
    assert not os.path.exists(os.path.join(str(tmp_path / "c"), "2/1/1.jpg"))


def test_fetch_tiles_frame_feeds_sinks(spark, tmp_path):
    """The cache-free path: fetched payloads stay in-frame and drop straight
    into the PMTiles sink."""
    from osm_merge_spark.sources import tilesinks as TS

    def fake_fetch(url):
        return b"IMG:" + url.encode()

    tiles = spark.createDataFrame([(4, 3, 5), (4, 4, 5)], "z int, x long, y long")
    frame = BM.fetch_tiles_frame(tiles, mirrors=[BM.PROVIDERS["esri"]], fetch=fake_fetch)
    path = str(tmp_path / "t.pmtiles")
    stats = TS.write_pmtiles(frame, path)
    assert stats["tiles"] == 2
    got = {(z, x, y): b for z, x, y, b in TS.read_pmtiles(path)}
    assert got[(4, 3, 5)].startswith(b"IMG:") and b"/4/5/3" in got[(4, 3, 5)]


# ---------------------------------------------------------------------------
# End-to-end pipeline (`create_basemap_file`, basemapper.py:462-583)
# ---------------------------------------------------------------------------

import math

import numpy as np

from osm_merge_spark.functions import png as PNG


def _ref_tiles(w, s, e, n, z):
    """Scalar slippy enumeration (mercantile.tiles semantics) as the
    oracle for the distributed bbox_tiles."""
    def tx(lon):
        return min((1 << z) - 1, max(0, int((lon + 180.0) / 360.0 * (1 << z))))

    def ty(lat):
        lat = min(85.0511287798066, max(-85.0511287798066, lat))
        r = math.radians(lat)
        return min((1 << z) - 1, max(0, int((1 - math.asinh(math.tan(r)) / math.pi) / 2 * (1 << z))))

    eps = 1e-11
    out = []
    for x in range(tx(w), tx(e - eps if e > w else e) + 1):
        for y in range(ty(n), ty(s + eps if n > s else s) + 1):
            out.append((z, x, y))
    return out


class TestZoomList:
    def test_range(self):
        assert BM.zoom_list("12-15") == [12, 13, 14, 15]

    def test_commas(self):
        assert BM.zoom_list("12,14,17") == [12, 14, 17]

    def test_single_and_int(self):
        assert BM.zoom_list("9") == [9]
        assert BM.zoom_list(9) == [9]
        assert BM.zoom_list([9, 10]) == [9, 10]


def test_bbox_tiles_matches_scalar_enumeration(spark):
    bbox = (-105.7, 39.6, -105.3, 39.9)
    got = {
        (r.z, r.x, r.y)
        for r in BM.bbox_tiles(spark, bbox, "10-12").collect()
    }
    want = set()
    for z in (10, 11, 12):
        want.update(_ref_tiles(*bbox, z))
    assert got == want
    assert len(got) > 20  # multi-tile, multi-zoom


def test_bbox_tiles_chunked_expansion(spark):
    # chunk smaller than the x-range: two-level explode must still cover
    # every index exactly once
    bbox = (-110.0, 39.0, -100.0, 39.01)
    rows = BM.bbox_tiles(spark, bbox, 12, chunk=7).collect()
    xs = sorted(r.x for r in rows)
    assert xs == list(range(min(xs), max(xs) + 1))
    assert len(set(xs)) == len(xs)


def test_bbox_tiles_chunked_expansion_y_axis(spark):
    # r4 ADVICE: the y explode used to be a single unchunked sequence —
    # a tall bbox with chunk smaller than BOTH ranges must still enumerate
    # every (x, y) exactly once (matching the scalar oracle)
    bbox = (-106.0, 35.0, -105.5, 40.0)
    rows = BM.bbox_tiles(spark, bbox, 10, chunk=3).collect()
    got = sorted((r.x, r.y) for r in rows)
    want = sorted((x, y) for _z, x, y in _ref_tiles(*bbox, 10))
    assert got == want
    ys = {y for _x, y in got}
    assert len(ys) > 3  # the y-range genuinely exceeds the chunk


def test_custom_tms_template():
    site = BM.custom_tms("https://maps.nyc.gov/xyz/1.0.0/carto/basemap/{z}/{x}/{y}.jpg", xy=True)
    assert site["suffix"] == "jpg"
    assert site["url"].endswith("/%s")
    assert BM.format_url(site, (3, 5, 12)) == "https://maps.nyc.gov/xyz/1.0.0/carto/basemap/12/3/5"


def _tile_png(z, x, y):
    """Deterministic valid PNG per tile (drives the real decoder paths)."""
    rng = (z * 73856093) ^ (x * 19349663) ^ (y * 83492791)
    img = np.full((8, 8), rng % 251, dtype=np.uint8)
    img[0, 0] = (rng >> 8) % 251
    return PNG.encode_png(img, filters=int(rng % 5))


def test_create_basemap_end_to_end(spark, tmp_path):
    """The full basemapper.main chain: boundary → zoom parse → tile
    enumeration → mirror fetch (injected, serving valid PNGs) → MBTiles
    AND PMTiles sinks → read both back and byte-compare every tile."""
    from osm_merge_spark.sources import tilesinks as TS

    bbox = (-105.7, 39.6, -105.3, 39.9)
    site = dict(BM.PROVIDERS["esri"], suffix="png")
    by_url = {}
    for (z, x, y) in _ref_tiles(*bbox, 13):
        by_url[BM.format_url(site, (x, y, z))] = _tile_png(z, x, y)

    def fake_fetch(url):
        return by_url[url]

    out_mb = str(tmp_path / "base.mbtiles")
    out_pm = str(tmp_path / "base.pmtiles")
    st_mb = BM.create_basemap(spark, bbox, out_mb, zooms="13", mirrors=[site], fetch=fake_fetch)
    st_pm = BM.create_basemap(spark, bbox, out_pm, zooms="13", mirrors=[site], fetch=fake_fetch)
    want = {(z, x, y): _tile_png(z, x, y) for (z, x, y) in _ref_tiles(*bbox, 13)}
    assert st_mb["tiles"] == len(want) and st_mb["written"] == len(want)
    assert st_pm["tiles"] == len(want) and st_pm["written"] == len(want)
    assert st_mb["format"] == "mbtiles" and st_pm["format"] == "pmtiles"

    got_mb = {
        (r.z, r.x, r.y): bytes(r.data) for r in TS.read_mbtiles(spark, out_mb).collect()
    }
    assert got_mb == want
    got_pm = {(z, x, y): blob for z, x, y, blob in TS.read_pmtiles(out_pm)}
    assert got_pm == want
    # and the tiles are REAL images: decode one end-to-end
    z, x, y = next(iter(want))
    img = PNG.decode_png(got_pm[(z, x, y)])
    assert img.shape == (8, 8)


def test_create_basemap_validation(spark, tmp_path):
    import pytest as _pt

    with _pt.raises(ValueError, match="boundary"):
        BM.create_basemap(spark, None, str(tmp_path / "x.mbtiles"))
    with _pt.raises(ValueError, match="OpenAerialMap"):
        BM.create_basemap(spark, (0, 0, 1, 1), str(tmp_path / "x.mbtiles"), source="oam")
    with _pt.raises(ValueError, match="not supported"):
        BM.create_basemap(
            spark, (0, 0, 1, 1), str(tmp_path / "x.zip"),
            mirrors=[BM.PROVIDERS["esri"]], fetch=lambda u: b"",
        )
