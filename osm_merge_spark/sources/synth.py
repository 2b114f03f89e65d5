"""Deterministic synthetic geo corpus derived from the driver's testdata.

The driver ships a TPC-H-ish relational corpus (TESTDATA.md) but no geo
tables; the engine's conflation inputs are therefore *derived* from those
tables with pure column arithmetic — fully deterministic (no RNG), scale-
proportional (sf0.1 → 10× the ways of sf0.01), and reproducible inside both
Spark and ANSI SQL (which is what makes the DuckDB oracle possible).

Tables produced (FIXTURES.md shapes):

- ``osm_ways(way_id, geom array<double>, tags map, name, ref, version)`` —
  the secondary dataset (existing OSM), one way per ``orders`` row;
- ``external_ways(ext_id, geom, tags, name, ref)`` — the primary dataset,
  jittered/renamed copies of ~90% of osm_ways (typos, Rd/Road abbreviation
  flips, FS↔FR prefix flips — exercising every branch the reference's
  ``checkTags`` cares about, `osm_merge/conflator.py:670-792`) plus ~11%
  brand-new ways with no OSM counterpart (the anti-join output);
- ``documents_spans(doc_id, spans array<struct<kind,text,media_ref,offset>>)``
  — the interleaved text+media table mandated by BASELINE.json input_hint:
  tag spans + a WKT geom span + a media span per doc.

Deliberate skew: ways whose key ≡ 7 (mod 10) are squeezed into a ~300 m box
(one hot z18 cell neighborhood) so salting/AQE-skew paths are exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Colorado-ish AOI (same latitude band as the reference's Routt NF fixtures)
LON0, LAT0 = -109.0, 37.0
LON_SPAN, LAT_SPAN = 5.0, 3.5
HOT_LON, HOT_LAT = -106.5, 39.0  # the hot-cell box

_WORDS = [
    "Cedar", "Bear", "Elk", "Aspen", "Granite", "Willow", "Spruce", "Juniper",
    "Mesa", "Canyon", "Ridge", "Summit", "Vista", "Hidden", "Silver", "Copper",
]
_SUFFIX = ["Road", "Creek Road", "Mountain Road", "Lake Road", "Trail", "Spur"]
_HW = ["track", "unclassified", "residential", "tertiary", "path", "footway"]


def _u(key, salt: int):
    """Deterministic uniform in [0,1) from an integer column — pure modular
    arithmetic so DuckDB reproduces it bit-for-bit."""
    return F.pmod(key * (2654435761 + salt * 40503) + salt * 97, F.lit(1_000_003)) / 1_000_003.0


def _pick(key, salt: int, options: list[str]):
    expr = F.lit(options[0])
    idx = F.pmod(key * 2654435761 + salt * 97, F.lit(len(options)))
    for i in range(1, len(options)):
        expr = F.when(idx == i, F.lit(options[i])).otherwise(expr)
    return expr


def base_lonlat(key):
    """Anchor point for a way id: hot keys (k%100==7, 1%) collapse into a
    ~1 km box (≈2000× the background density — a dense-urban-tile stand-in
    that stresses salting without going quadratic at bench scale); the rest
    spread over the AOI."""
    hot = F.pmod(key, F.lit(100)) == 7
    lon = F.when(hot, HOT_LON + _u(key, 11) * 0.01).otherwise(LON0 + _u(key, 1) * LON_SPAN)
    lat = F.when(hot, HOT_LAT + _u(key, 12) * 0.01).otherwise(LAT0 + _u(key, 2) * LAT_SPAN)
    return lon, lat


def way_geom(key, jitter_deg=None, n_pts: int = 3):
    """An ``n_pts``-vertex polyline: anchor + continuation segments
    (~100-500 m each), as a flat [x0,y0,x1,y1,...] array column.
    ``jitter_deg`` (Column or None) shifts every vertex — the
    external-dataset perturbation.  The default 3-vertex form is the shape
    the SQL oracles encode; larger ``n_pts`` raises per-pair kernel cost for
    compute-bound benchmarking."""
    lon, lat = base_lonlat(key)
    # jitter shifts latitude only, so displacement in meters is exactly
    # jitter_deg * M_PER_DEG_LAT (keeps fixture distances on the right side
    # of the 7 m threshold)
    jx = jitter_deg if jitter_deg is not None else F.lit(0.0)
    # hot-box (urban) ways are short, like real city streets: segment steps
    # scale down 20x so density stresses the *join key* (many ways per cell)
    # without implying quadratic true-candidate work (stacked multi-km lines)
    scale = F.when(F.pmod(key, F.lit(100)) == 7, F.lit(0.05)).otherwise(F.lit(1.0))
    x, y = lon, lat + jx
    coords = [x, y]
    for i in range(n_pts - 1):
        x = x + (_u(key, 3 + 2 * i) - 0.5) * 0.008 * scale
        y = y + (_u(key, 4 + 2 * i) - 0.5) * 0.006 * scale
        coords += [x, y]
    return F.array(*(c.cast("double") for c in coords))


def way_name(key, abbreviated: bool = False):
    w = _pick(key, 21, _WORDS)
    if abbreviated:
        sfx = _pick(key, 22, ["Rd", "Cr Rd", "Mtn Rd", "Lk Rd", "Trail", "Spur"])
    else:
        sfx = _pick(key, 22, _SUFFIX)
    return F.concat(w, F.lit(" "), sfx)


def way_ref(key, prefix: str = "FR"):
    num = F.pmod(key, F.lit(900)) + 100
    sub = F.when(F.pmod(key, F.lit(3)) == 0, F.concat(F.lit("."), F.pmod(key, F.lit(9)) + 1)).otherwise(F.lit(""))
    return F.concat(F.lit(prefix + " "), num.cast("string"), sub)


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders scan, re-split to the session's parallelism: the parquet file
    is a few MB (one split) but the derived-geometry + cell-cover work per
    row is heavy — without the repartition the whole corpus would be
    generated on one core (the classic small-input/large-compute trap)."""
    n = spark.sparkContext.defaultParallelism * 2
    return spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(n, "o_orderkey")


def _replicate(orders: DataFrame, replicas: int) -> DataFrame:
    """Corpus scale-up for benchmarking: K replicas with disjoint key ranges
    (every replica re-derives fresh positions/names from its shifted key, so
    density scales uniformly, hot box included)."""
    if replicas <= 1:
        return orders
    return orders.select(
        F.explode(F.array(*[F.col("o_orderkey") + j * 50_000_000 for j in range(replicas)])).alias("o_orderkey")
    )


def osm_ways(spark: SparkSession, sf_dir: str, replicas: int = 1, n_pts: int = 3) -> DataFrame:
    """Secondary dataset: one OSM-style way per orders row."""
    orders = _replicate(_orders(spark, sf_dir), replicas)
    k = F.col("o_orderkey")
    return (
        orders.select(
            k.alias("way_id"),
            way_geom(k, n_pts=n_pts).alias("geom"),
            way_name(k).alias("name"),
            way_ref(k, "FR").alias("ref"),
            _pick(k, 23, _HW).alias("highway"),
            (F.pmod(k, F.lit(5)) + 1).cast("int").alias("version"),
        )
        .withColumn(
            "tags",
            F.map_concat(
                F.create_map(
                    F.lit("highway"), F.col("highway"),
                    F.lit("name"), F.col("name"),
                    F.lit("ref:usfs"), F.col("ref"),
                ),
                # ~25% of rows carry tiger junk (exercises drop_junk_tags)
                F.when(
                    F.pmod(F.col("way_id"), F.lit(4)) == 0,
                    F.create_map(F.lit("tiger:cfcc"), F.lit("A41"), F.lit("tiger:county"), F.lit("Routt")),
                ).otherwise(F.create_map().cast("map<string,string>")),
            ),
        )
    )


def external_ways(spark: SparkSession, sf_dir: str, replicas: int = 1, n_pts: int = 3) -> DataFrame:
    """Primary dataset (MVUM-like): jittered twins of 90% of osm_ways plus
    ~11% novel ways.  Perturbations per key:

    - geometry jitter 0–6 m (k%10<8) or 12–18 m (k%10==8 → beyond the 7 m
      threshold, exercising distance rejection);
    - names abbreviated (Rd/Cr/Mtn — normalize_name must recover them);
    - refs flipped to the "FS " prefix (ref_number comparison must ignore it);
    - keys ≡ 3 (mod 10) are *dropped* (those OSM ways get no match);
    - novel ways keyed off lineitem with no orders counterpart pattern.
    """
    orders = _replicate(_orders(spark, sf_dir), replicas)
    k = F.col("o_orderkey")
    jitter_m = F.when(F.pmod(k, F.lit(10)) == 8, 12.0 + _u(k, 31) * 6.0).otherwise(_u(k, 31) * 6.0)
    jitter_deg = jitter_m / 110_540.0  # latitude-only shift (see way_geom)
    twins = (
        orders.filter(F.pmod(k, F.lit(10)) != 3)
        .select(
            (-k).alias("ext_id"),
            k.alias("src_key"),
            way_geom(k, jitter_deg=jitter_deg, n_pts=n_pts).alias("geom"),
            way_name(k, abbreviated=True).alias("name"),
            way_ref(k, "FS").alias("ref"),
        )
    )
    # novel ways: geometry derived from a remixed key (bounded so the hash
    # multiplier in _u never overflows int64 at high replica counts)
    m = F.pmod(F.col("o_orderkey") * 13 + 5, F.lit(40_000_000))
    novel = (
        orders.filter(F.pmod(F.col("o_orderkey"), F.lit(9)) == 4)
        .select(
            # novel ids live far outside any replicated twin key range
            # (replica offsets are j*50M — a 1B offset can never collide)
            (-(F.col("o_orderkey") + 1_000_000_000)).alias("ext_id"),
            F.lit(None).cast("bigint").alias("src_key"),
            way_geom(m, n_pts=n_pts).alias("geom"),
            way_name(m).alias("name"),
            way_ref(m, "CR").alias("ref"),
        )
    )
    ext = twins.unionByName(novel)
    return ext.withColumn(
        "tags",
        F.create_map(
            F.lit("highway"), F.lit("track"),
            F.lit("name"), F.col("name"),
            F.lit("ref:usfs"), F.col("ref"),
            F.lit("surface"), _pick(F.col("ext_id"), 41, ["dirt", "gravel", "paved"]),
            F.lit("seasonal"), _pick(F.col("ext_id"), 42, ["yes", "no"]),
        ),
    )


# ---------------------------------------------------------------------------
# Interleaved spans table (BASELINE.json input_hint schema)
# ---------------------------------------------------------------------------


def _wkt_linestring(geom_col):
    """array<double> [x0,y0,...] → 'LINESTRING(x0 y0,x1 y1,...)' (JVM-side)."""
    pair_idx = F.sequence(F.lit(0), (F.size(geom_col) / 2 - 1).cast("int"))
    pairs = F.transform(
        pair_idx,
        lambda i: F.concat_ws(
            " ",
            # fixed %.7f formatting: bit-identical string from Spark and the
            # ANSI-SQL oracle (plain cast-to-string reprs can differ)
            F.format_string("%.7f", F.element_at(geom_col, (i * 2 + 1).cast("int"))),
            F.format_string("%.7f", F.element_at(geom_col, (i * 2 + 2).cast("int"))),
        ),
    )
    return F.concat(F.lit("LINESTRING("), F.concat_ws(",", pairs), F.lit(")"))


def documents_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The interleaved text+media document table: one doc per OSM way, with
    ordered spans [tag*, geom(WKT), media(z/y/x.jpg)].  Span order (kind,
    text, media_ref, offset) is the engine's per-row invariant."""
    ways = osm_ways(spark, sf_dir)

    def span(kind, text, media_ref, offset):
        return F.struct(
            F.lit(kind).alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            offset.cast("int").alias("offset"),
        )

    k = F.col("way_id")
    tile_x = F.pmod(k * 37, F.lit(1 << 18))
    tile_y = F.pmod(k * 53, F.lit(1 << 18))
    media = F.concat(F.lit("18/"), tile_y.cast("string"), F.lit("/"), tile_x.cast("string"), F.lit(".jpg"))
    return ways.select(
        F.concat(F.lit("doc-"), k.cast("string")).alias("doc_id"),
        F.array(
            span("tag", F.concat(F.lit("highway="), F.col("highway")), F.lit(""), F.lit(0)),
            span("tag", F.concat(F.lit("name="), F.col("name")), F.lit(""), F.lit(10)),
            span("tag", F.concat(F.lit("ref:usfs="), F.col("ref")), F.lit(""), F.lit(20)),
            span("geom", _wkt_linestring(F.col("geom")), F.lit(""), F.lit(30)),
            span("media", F.lit(""), media, F.lit(40)),
        ).alias("spans"),
    )
