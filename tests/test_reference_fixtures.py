"""End-to-end conflation of the reference's own test fixtures (S3 + J10 +
J1-J7 on real data): `/root/reference/tests/data/{mvum,osm}.osm` — 1.8 MB of
real Colorado OSM XML — through read_osm_xml → build_way_geometries →
conflate.

The two fixtures cover DIFFERENT forests ~200 km apart (mvum.osm ≈ 38.3°N
-108.2°E, osm.osm ≈ 40.9°N -106.9°E — verified from their node bboxes), so
the honest cross-dataset result is zero matches and an all-new output; the
fidelity evidence for matching comes from conflating the real OSM extract
against a 3 m-jittered copy of itself, which exercises real multi-vertex
geometry, names, and `ref:usfs` refs through the full pipeline with a
predictable outcome.
"""

import pytest
from pyspark.sql import functions as F

from osm_merge_spark.operators import conflate as C
from osm_merge_spark.sources import files as FS

MVUM = "/root/reference/tests/data/mvum.osm"
OSM = "/root/reference/tests/data/osm.osm"


@pytest.fixture(scope="module")
def osm_ways(spark):
    return FS.build_way_geometries(FS.read_osm_xml(spark, OSM)).cache()


def test_fixture_ingest_counts(spark, osm_ways):
    mvum = FS.read_osm_xml(spark, MVUM)
    kinds = {r["kind"]: r["count"] for r in mvum.groupBy("kind").count().collect()}
    assert kinds == {"node": 4633, "way": 110}
    assert osm_ways.count() == 87
    # node-deref join produced real polylines (no empty/odd geometries)
    sizes = osm_ways.select(F.size("geom").alias("n")).agg(F.min("n"), F.max("n")).collect()[0]
    assert sizes[0] >= 4 and sizes[0] % 2 == 0
    # tiger junk dropped at ingest (`osmfile.py:152-156`)
    assert osm_ways.filter(
        F.exists(F.map_keys("tags"), lambda k: k.startswith("tiger:"))
    ).count() == 0


def test_cross_dataset_disjoint_aois(spark, osm_ways):
    """mvum.osm × osm.osm: disjoint AOIs → all-new output (and the pipeline
    handles 4.7k-node real files without error)."""
    mvum = FS.build_way_geometries(FS.read_osm_xml(spark, MVUM))
    primary = mvum.select(F.col("osm_id").alias("ext_id"), "geom", "tags")
    secondary = osm_ways.select(F.col("osm_id").alias("way_id"), "geom", "tags", "version")
    conflated, new = C.conflate(primary, secondary)
    assert conflated.count() == 0
    assert new.count() == 110
    assert new.filter(F.element_at("tags", F.lit("informal")) == "yes").count() == 110


def test_jittered_self_conflation(spark, osm_ways):
    """Real geometry fidelity: every way of the real extract must re-find
    itself (or a dist-0 crossing neighbor) when jittered 3 m north."""
    d = 3.0 / 110_540.0
    primary = osm_ways.select(
        (-F.col("osm_id")).alias("ext_id"),
        F.transform("geom", lambda v, i: F.when(i % 2 == 1, v + d).otherwise(v)).alias("geom"),
        "tags",
    )
    secondary = osm_ways.select(F.col("osm_id").alias("way_id"), "geom", "tags", "version")
    conflated, new = C.conflate(primary, secondary)
    c = conflated.cache()
    assert c.count() == 87 and new.count() == 0
    # self-matches dominate; the rest are dist-0 candidates — crossing ways
    # and J3 length-mismatch/hull-contact sentinels (the extract contains a
    # 360 km way, osm_id 834045326, whose hull "contacts" short ways far from
    # the line; the sentinel forces dist=0.0, beating the 3 m self-match).
    # J3 pairs are discoverable only when the polylines share a cover cell,
    # so their count grows as the conflate zoom coarsens: z18 found one,
    # the r6 default z16 finds three — closer to the reference's brute-force
    # all-pairs answer, which would consider every such pair.  79 of 87
    # self-matches still dominates.
    assert c.filter(F.col("way_id") == -F.col("ext_id")).count() >= 79
    assert c.agg(F.max("dist")).collect()[0][0] <= 3.0
    hits = {r["hits"]: r["count"] for r in c.groupBy("hits").count().collect()}
    assert hits.get(3, 0) >= 40  # name + ref + geometry all agree
    # spot check: a named, ref'd way matches itself on all three signals
    duncan = c.filter(F.element_at("tags", F.lit("name")) == "Duncan Road").collect()
    assert len(duncan) == 1
    row = duncan[0]
    assert row["way_id"] == -row["ext_id"]
    assert row["hits"] == 3 and row["ref_ratio"] == 100.0
    assert row["tags"]["ref:usfs"] == "FS 504.1"
