"""PostGIS / Underpass source (S7) — `osm_merge/dbextract.py:44-122`.

The reference opens a psycopg2 connection to an Underpass-schema postgres
database, creates a ``highway_view`` filtered by ``tags->>'highway'`` and an
optional ``ST_Contains`` AOI clip (`dbextract.py:79-88`), then streams
``osm_id, version, timestamp, refs, tags, ST_AsText(geom)``.

Spark-native shape: the same query is pushed down *server-side* as a JDBC
``dbtable`` subquery — the AOI clip and tag filter run in postgres where the
GiST index lives, and Spark range-partitions the fetch on ``osm_id`` so a
1000-executor cluster reads disjoint slices concurrently.  No collect, no
driver staging.

There is no postgres server in this container, so ``load()`` is never called
in tests; the query construction, partitioning options, and the
hstore/WKT post-transform (pure Column work on the JDBC output shape) are
covered by unit tests over synthesized frames.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Strict WKT grammar for the AOI clip: geometry keyword + parenthesized
# numeric coordinate lists only.  The AOI string is interpolated into a JDBC
# subquery, so anything outside this grammar (quotes, semicolons, comments)
# is rejected up front rather than shipped to the server.
_WKT_RE = re.compile(
    r"^\s*(?:POLYGON|MULTIPOLYGON|LINESTRING|MULTILINESTRING|POINT|MULTIPOINT|GEOMETRYCOLLECTION)"
    r"[0-9eE+\-.,()\s]*$",
    re.IGNORECASE,
)


def validate_aoi_wkt(aoi_wkt: str) -> str:
    """Reject any AOI string that isn't plain numeric WKT.  The AOI is
    interpolated into the pushdown subquery, so this is the injection gate —
    callers passing externally-sourced AOIs rely on it."""
    if not _WKT_RE.match(aoi_wkt) or "'" in aoi_wkt:
        raise ValueError(f"AOI is not plain numeric WKT: {aoi_wkt[:80]!r}")
    return aoi_wkt


def postgis_query(aoi_wkt: str | None = None, highway_only: bool = True) -> str:
    """The server-side subquery (`dbextract.py:79-88` semantics): tag filter
    + AOI containment evaluated by postgres, only matching rows ship.  The
    AOI must be trusted or pre-validated — :func:`validate_aoi_wkt` enforces
    a strict numeric-WKT grammar before interpolation."""
    where = []
    if highway_only:
        where.append("tags->>'highway' IS NOT NULL")
    if aoi_wkt:
        where.append(f"ST_Contains(ST_GeomFromEWKT('SRID=4326;{validate_aoi_wkt(aoi_wkt)}'), geom)")
    cond = " AND ".join(where) or "TRUE"
    return (
        "(SELECT osm_id, version, timestamp, refs::text AS refs, "
        "tags::text AS tags, ST_AsText(geom) AS geom_wkt "
        f"FROM ways_line WHERE {cond}) AS highway_view"
    )


def postgis_reader(
    spark: SparkSession,
    url: str,
    aoi_wkt: str | None = None,
    highway_only: bool = True,
    partition_column: str = "osm_id",
    lower_bound: int = 0,
    upper_bound: int = 1 << 40,
    num_partitions: int = 64,
    fetchsize: int = 10_000,
):
    """Configured JDBC reader (not yet loaded): range-partitioned on
    ``osm_id`` so the scan parallelizes; ``fetchsize`` keeps the cursor
    streaming instead of buffering whole results."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", postgis_query(aoi_wkt, highway_only))
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetchsize))
        .option("driver", "org.postgresql.Driver")
    )


def read_postgis(spark: SparkSession, url: str, **kwargs) -> DataFrame:
    """S7 scan: server-filtered, range-partitioned JDBC load + engine-shape
    post-transform."""
    return postgis_to_features(postgis_reader(spark, url, **kwargs).load())


_HSTORE_PAIR = r'"((?:[^"\\]|\\.)*)"\s*=>\s*"((?:[^"\\]|\\.)*)"'


def postgis_to_features(df: DataFrame) -> DataFrame:
    """JDBC output shape → engine feature shape: hstore text → ``tags`` map,
    ``refs`` int-array text → array<bigint>, WKT passthrough as ``geom``.

    Pure Column work (regexp extract-all + map_from_arrays) — stays in
    whole-stage codegen; no Python in the transform.
    """
    pat = F.lit(_HSTORE_PAIR)

    def _unescape(arr):
        # hstore escapes `"` and `\` inside quoted strings; collapse any
        # backslash escape to the escaped char (psycopg2-decoded parity)
        return F.transform(arr, lambda s: F.regexp_replace(s, F.lit(r"\\(.)"), F.lit(r"$1")))

    keys = _unescape(F.regexp_extract_all(F.col("tags"), pat, F.lit(1)))
    vals = _unescape(F.regexp_extract_all(F.col("tags"), pat, F.lit(2)))
    refs = F.transform(
        F.filter(
            F.split(F.regexp_replace(F.col("refs"), F.lit(r"[{}\[\]]"), F.lit("")), ","),
            lambda x: F.trim(x) != "",
        ),
        lambda x: F.trim(x).cast("bigint"),
    )
    return df.select(
        F.col("osm_id").cast("bigint").alias("way_id"),
        F.col("version").cast("int").alias("version"),
        F.col("timestamp").cast("timestamp").alias("ts"),
        refs.alias("refs"),
        F.map_from_arrays(keys, vals).alias("tags"),
        F.col("geom_wkt").alias("geom"),
    )
