"""S7 PostGIS/Underpass source (`dbextract.py:44-122`): server-side query
construction, partitioned-reader options, and the hstore/refs/WKT
post-transform (the only parts exercisable without a postgres server)."""

from pyspark.sql import functions as F

from osm_merge_spark.sources import postgis as PG

AOI = "POLYGON((0 0,1 0,1 1,0 1,0 0))"


def test_query_pushdown_shape():
    q = PG.postgis_query(aoi_wkt=AOI, highway_only=True)
    assert q.startswith("(SELECT osm_id, version, timestamp")
    assert "tags->>'highway' IS NOT NULL" in q
    assert f"ST_Contains(ST_GeomFromEWKT('SRID=4326;{AOI}'), geom)" in q
    assert "ST_AsText(geom) AS geom_wkt" in q
    # no AOI → no ST_Contains; no filters at all → TRUE
    assert "ST_Contains" not in PG.postgis_query(highway_only=True)
    assert "WHERE TRUE" in PG.postgis_query(aoi_wkt=None, highway_only=False)


def test_aoi_wkt_injection_rejected():
    import pytest

    for bad in (
        "POLYGON((0 0)); DROP TABLE ways_line; --",
        "POLYGON((0 0,1 0,1 1,0 0))' OR '1'='1",
        "NOT_WKT(0 0)",
        "POLYGON((0 0,1 0,1 1,0 0)) UNION SELECT",
    ):
        with pytest.raises(ValueError):
            PG.postgis_query(aoi_wkt=bad)
    # plain numeric WKT (incl. scientific notation, multipolygons) passes
    assert PG.validate_aoi_wkt("MULTIPOLYGON(((0 0,1e-3 0,1 1,0 0)))")
    assert PG.validate_aoi_wkt(AOI) == AOI


def test_hstore_backslash_unescape(spark):
    df = spark.createDataFrame(
        [(1, 1, None, "{}", r'"path"=>"C:\\temp\\x", "q\"k"=>"a\\b"', "POINT(0 0)")],
        "osm_id long, version int, timestamp string, refs string, tags string, geom_wkt string",
    )
    tags = PG.postgis_to_features(df).first().tags
    assert tags["path"] == "C:\\temp\\x"
    assert tags['q"k'] == "a\\b"


def test_reader_is_partitioned(spark):
    r = PG.postgis_reader(spark, "jdbc:postgresql://db/underpass", aoi_wkt=AOI, num_partitions=32)
    # constructing the reader must not connect; options live on the reader
    opts = r._options if hasattr(r, "_options") else None
    if opts is not None:
        assert opts["numPartitions"] == "32" and opts["partitionColumn"] == "osm_id"
        assert "ways_line" in opts["dbtable"]


def test_post_transform_hstore_refs_wkt(spark):
    rows = [
        (
            101,
            3,
            "2024-01-02 03:04:05",
            "{11,12,13}",
            '"highway"=>"path", "name"=>"Say \\"hi\\""',
            "LINESTRING(0 0,1 1)",
        ),
        (102, 1, None, "{}", "", "LINESTRING(2 2,3 3)"),
    ]
    df = spark.createDataFrame(
        rows, "osm_id long, version int, timestamp string, refs string, tags string, geom_wkt string"
    )
    out = PG.postgis_to_features(df).orderBy("way_id").collect()
    a, b = out
    assert a.way_id == 101 and a.version == 3
    assert a.refs == [11, 12, 13]
    assert a.tags["highway"] == "path"
    assert a.tags["name"] == 'Say "hi"'  # hstore escapes decoded (psycopg2 parity)
    assert a.geom == "LINESTRING(0 0,1 1)"
    assert b.refs == [] and b.tags == {}


def test_feature_shape_joins_engine(spark):
    """The transformed frame drops straight into the conflation input shape
    (way_id, geom, tags, version)."""
    df = spark.createDataFrame(
        [(7, 1, None, "{1,2}", '"highway"=>"track"', "LINESTRING(0 0,0.001 0.001)")],
        "osm_id long, version int, timestamp string, refs string, tags string, geom_wkt string",
    )
    feats = PG.postgis_to_features(df).select("way_id", "geom", "tags", "version")
    assert feats.filter(F.element_at("tags", "highway") == "track").count() == 1


# ---------------------------------------------------------------------------
# Machine-checked SQL: the generated pushdown subquery is validated by a
# parser and an executor that are NOT this repo (DuckDB's
# postgres-compatible frontend), not just string-asserted.
# ---------------------------------------------------------------------------

import json

import duckdb
import pytest


def _parse_ok(sql_fragment: str) -> None:
    full = "SELECT * FROM " + sql_fragment
    esc = full.replace("'", "''")
    con = duckdb.connect()
    out = json.loads(con.execute(f"SELECT json_serialize_sql('{esc}')").fetchone()[0])
    assert not out.get("error"), out.get("error_message")


@pytest.mark.parametrize(
    "aoi,highway_only",
    [
        (None, True),
        (None, False),
        ("POLYGON((0 0,1 0,1 1,0 1,0 0))", True),
        ("MULTIPOLYGON(((0 0,1 0,1 1,0 0)))", False),
    ],
)
def test_generated_sql_parses(aoi, highway_only):
    _parse_ok(PG.postgis_query(aoi, highway_only))


def test_generated_sql_executes_on_mock_schema():
    """Run every variant end-to-end in DuckDB against a mocked ways_line
    (tags as JSON standing in for hstore, macros for the ST_ functions):
    column resolution, operator typing, and the WHERE semantics are
    machine-checked, not eyeballed."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ways_line (osm_id BIGINT, version INT, timestamp TIMESTAMP, "
        "refs BIGINT[], tags JSON, geom VARCHAR)"
    )
    con.execute("CREATE MACRO ST_AsText(g) AS g")
    con.execute("CREATE MACRO ST_GeomFromEWKT(s) AS s")
    con.execute("CREATE MACRO ST_Contains(a, b) AS TRUE")
    con.execute(
        "INSERT INTO ways_line VALUES "
        "(1, 2, '2024-05-01', [11, 12], '{\"highway\": \"path\", \"name\": \"A\"}', 'LINESTRING(0 0,1 1)'), "
        "(2, 1, '2024-05-02', [13], '{\"building\": \"yes\"}', 'LINESTRING(2 2,3 3)')"
    )
    n_hw = con.execute("SELECT count(*) FROM " + PG.postgis_query(None, True)).fetchone()[0]
    assert n_hw == 1  # tags->>'highway' IS NOT NULL filters row 2
    n_all = con.execute("SELECT count(*) FROM " + PG.postgis_query(None, False)).fetchone()[0]
    assert n_all == 2
    rows = con.execute(
        "SELECT osm_id, geom_wkt FROM "
        + PG.postgis_query("POLYGON((0 0,1 0,1 1,0 1,0 0))", True)
    ).fetchall()
    assert rows == [(1, "LINESTRING(0 0,1 1)")]


def test_injection_rejected_before_sql():
    with pytest.raises(ValueError, match="WKT"):
        PG.postgis_query("POLYGON((0 0)); DROP TABLE ways_line; --", True)
