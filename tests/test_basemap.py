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
