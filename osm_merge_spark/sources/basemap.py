"""Basemap imagery acquisition (S8 completion): provider URL templates and
the resumable tile-download shape.

Reference parity:

- ``format_url`` provider dispatch — `osm_merge/fieldwork/basemapper.py:167-204`:
  ``%s``-substituted templates, z/y/x vs z/x/y path order per the provider's
  ``xy`` flag, Bing quadkey addressing, Google's query-string form; provider
  catalog `osm_merge/fieldwork/imagery.yaml` (public tile endpoints).
- ``download_tile`` / ``dlthread`` — `basemapper.py:206-270`: mirror
  fallback (first success wins), skip-if-exists resume, parent-dir creation,
  on-disk layout ``{z}/{y}/{x}.{suffix}``.

Spark-first shape: URL construction is pure Column string math (JVM,
codegen, zero Python) — a billion-tile work list is a DataFrame, not a
driver loop.  The fetch itself is an Arrow-batched ``mapInPandas`` stage
over the work list: each partition walks its tiles, skips tiles already in
the destination cache (resume), and calls an injectable ``fetch(url) ->
bytes`` callable.  No network libraries ship in this container, so the
default fetch raises — tests and offline runs inject a fake; the plumbing
(work-list partitioning, mirror fallback, resume semantics, status frame)
is real and tested.  At cluster scale ``dest`` is a shared mount, or use
``fetch_tiles_frame`` to keep payloads IN the frame and feed the MBTiles/
PMTiles sinks directly (no intermediate tile-file cache at all).
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.media import quadkey

# `imagery.yaml` provider catalog (public endpoints), keyed by source name.
PROVIDERS: dict[str, dict] = {
    "bing": {
        "url": "http://ecn.t0.tiles.virtualearth.net/tiles/h%s.jpg?g=129&mkt=en&stl=H",
        "suffix": "jpg",
        "xy": False,
        "source": "bing",
    },
    "esri": {
        "url": "http://clarity.maptiles.arcgis.com/arcgis/rest/services/World_Imagery/MapServer/tile/%s",
        "suffix": "jpg",
        "xy": False,
        "source": "esri",
    },
    "google": {
        "url": "https://mt0.google.com/vt?lyrs=s&%s",
        "suffix": "jpg",
        "xy": False,
        "source": "google",
    },
    "topo": {
        "url": "https://basemap.nationalmap.gov/ArcGIS/rest/services/USGSTopo/MapServer/tile/%s",
        "suffix": "jpg",
        "xy": False,
        "source": "topo",
    },
    "usgs": {
        "url": "https://basemap.nationalmap.gov/ArcGIS/rest/services/USGSImageryOnly/MapServer/tile/%s",
        "suffix": "jpg",
        "xy": False,
        "source": "usgs",
    },
}


def format_url_col(site: dict, z: Column, x: Column, y: Column) -> Column:
    """`basemapper.py:167-204` ``format_url`` as a Column expression.

    ``xy`` True → the download path is z/x/y (moved to z/y/x on disk);
    False → z/y/x.  esri/oam/custom substitute that path; topo/usgs always
    z/y/x; bing substitutes the quadkey; google uses the x=&s=&y=&z= query
    form.  Unsupported source → null (reference logs + returns None)."""
    template = site["url"]
    if site.get("xy"):
        url_path = F.format_string("%d/%d/%d", z, x, y)
    else:
        url_path = F.format_string("%d/%d/%d", z, y, x)
    source = site.get("source", "custom")
    if source == "bing":
        sub = quadkey(z, x, y)
    elif source in ("topo", "usgs"):
        sub = F.format_string("%d/%d/%d", z, y, x)
    elif source == "google":
        sub = F.format_string("x=%d&s=&y=%d&z=%d", x, y, z)
    elif source in ("esri", "oam", "custom"):
        sub = url_path
    else:
        return F.lit(None).cast("string")
    # the templates are %s-substituted (reference NOTE) — split around the
    # single placeholder so no other char is format-interpreted
    head, _, tail = template.partition("%s")
    return F.concat(F.lit(head), sub, F.lit(tail))


def tile_urls(tiles: DataFrame, providers: list[dict] | None = None) -> DataFrame:
    """Attach one URL column per mirror to a (z, x, y) work list — the
    distributed form of the reference's per-tile mirror loop."""
    providers = providers if providers is not None else list(PROVIDERS.values())
    out = tiles
    for i, site in enumerate(providers):
        out = out.withColumn(
            f"url_{site.get('source', i)}",
            format_url_col(site, F.col("z"), F.col("x"), F.col("y")),
        )
    return out


_DL_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("path", T.StringType()),
        T.StructField("status", T.StringType()),
    ]
)


def _default_fetch(url: str) -> bytes:
    raise NotImplementedError(
        "no network stack in this environment — inject fetch=... (any callable url -> bytes)"
    )


def download_tiles(
    tiles: DataFrame,
    dest: str,
    mirrors: list[dict] | None = None,
    fetch: Callable[[str], bytes] | None = None,
) -> DataFrame:
    """`download_tile`/`dlthread` semantics as one distributed stage.

    For each (z, x, y) row: resolve the on-disk path ``{z}/{y}/{x}.{suffix}``
    (first mirror's suffix, `basemapper.py:218`), SKIP if it already exists
    (resume, `:220,237-238`), else try mirrors in order — first success
    writes the blob and wins (`:206-240`).  Returns a status frame
    (downloaded / exists / failed per tile); ``dest`` must be visible to the
    executors (shared mount) — or use :func:`fetch_tiles_frame` to avoid the
    file cache entirely.
    """
    mirrors = mirrors if mirrors is not None else [PROVIDERS["esri"]]
    do_fetch = fetch if fetch is not None else _default_fetch
    ordered_sites = [dict(m) for m in mirrors]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, statuses = [], []
            for z, x, y in zip(pdf["z"], pdf["x"], pdf["y"]):
                suffix = ordered_sites[0].get("suffix", "jpg")
                rel = f"{int(z)}/{int(y)}/{int(x)}.{suffix}"
                outfile = os.path.join(dest, rel)
                paths.append(rel)
                if os.path.exists(outfile):
                    statuses.append("exists")
                    continue
                status = "failed"
                for site in ordered_sites:
                    url = format_url(site, (int(x), int(y), int(z)))
                    if url is None:
                        continue
                    try:
                        blob = do_fetch(url)
                    except Exception:
                        continue
                    os.makedirs(os.path.dirname(outfile), exist_ok=True)
                    with open(outfile, "wb") as fd:
                        fd.write(blob)
                    status = "downloaded"
                    break
                statuses.append(status)
            yield pd.DataFrame(
                {
                    "z": pdf["z"].astype("int32"),
                    "x": pdf["x"].astype("int64"),
                    "y": pdf["y"].astype("int64"),
                    "path": paths,
                    "status": statuses,
                }
            )

    return tiles.select(
        F.col("z").cast("int"), F.col("x").cast("long"), F.col("y").cast("long")
    ).mapInPandas(run, _DL_SCHEMA)


_FETCH_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def fetch_tiles_frame(
    tiles: DataFrame,
    mirrors: list[dict] | None = None,
    fetch: Callable[[str], bytes] | None = None,
) -> DataFrame:
    """Cache-free variant: fetched payloads stay IN the frame (z, x, y,
    data), ready for :func:`..sources.tilesinks.write_mbtiles` /
    ``write_pmtiles`` — the scale path (no shared tile-file cache, no
    small-file storm; failed tiles drop out as nulls filtered here)."""
    mirrors = mirrors if mirrors is not None else [PROVIDERS["esri"]]
    do_fetch = fetch if fetch is not None else _default_fetch
    ordered_sites = [dict(m) for m in mirrors]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for z, x, y in zip(pdf["z"], pdf["x"], pdf["y"]):
                blob = None
                for site in ordered_sites:
                    url = format_url(site, (int(x), int(y), int(z)))
                    if url is None:
                        continue
                    try:
                        blob = do_fetch(url)
                        break
                    except Exception:
                        continue
                blobs.append(blob)
            out = pd.DataFrame(
                {
                    "z": pdf["z"].astype("int32"),
                    "x": pdf["x"].astype("int64"),
                    "y": pdf["y"].astype("int64"),
                    "data": blobs,
                }
            )
            yield out[out["data"].notna()]

    return tiles.select(
        F.col("z").cast("int"), F.col("x").cast("long"), F.col("y").cast("long")
    ).mapInPandas(run, _FETCH_SCHEMA)


def format_url(site: dict, tile: tuple[int, int, int]) -> str | None:
    """Scalar twin of :func:`format_url_col` (tile = (x, y, z), the
    reference's argument order) — used inside the fetch kernels and as the
    parity surface for tests."""
    x, y, z = tile
    url_path = f"{z}/{x}/{y}" if site.get("xy") else f"{z}/{y}/{x}"
    source = site.get("source", "custom")
    if source == "bing":
        sub = _quadkey_scalar(z, x, y)
    elif source in ("topo", "usgs"):
        sub = f"{z}/{y}/{x}"
    elif source == "google":
        sub = f"x={x}&s=&y={y}&z={z}"
    elif source in ("esri", "oam", "custom"):
        sub = url_path
    else:
        return None
    return site["url"] % sub


def _quadkey_scalar(z: int, x: int, y: int) -> str:
    digits = []
    for i in range(z, 0, -1):
        d = 0
        mask = 1 << (i - 1)
        if x & mask:
            d += 1
        if y & mask:
            d += 2
        digits.append(str(d))
    return "".join(digits)
