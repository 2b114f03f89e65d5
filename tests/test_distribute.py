"""Range work distribution (longitude strips): the union of executor-local conflations
must equal the single-run result (executor-count invariance — the property
that makes the N→4N scaling protocol valid)."""

from pyspark.sql import functions as F

from osm_merge_spark.operators import conflate as C
from osm_merge_spark.plans import distribute as DST
from osm_merge_spark.sources import synth

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["ext_id"], r["way_id"]) for r in df.select("ext_id", "way_id").collect()}


def test_executor_slices_cover_and_match(spark):
    ext = DST.with_tile_columns(synth.external_ways(spark, SF))
    osm = DST.with_tile_columns(synth.osm_ways(spark, SF))

    single, single_new = C.conflate(
        ext.drop("anchor_x", "anchor_y", "min_x", "max_x"), osm.drop("anchor_x", "anchor_y", "min_x", "max_x")
    )
    expected = _pairs(single)
    expected_new = {r["ext_id"] for r in single_new.select("ext_id").collect()}

    k = 3
    bounds = DST.range_boundaries(ext, k)
    got = set()
    got_new = set()
    n_primary = 0
    for rank in range(k):
        p = DST.primary_slice(ext, bounds, rank).drop("anchor_x", "anchor_y", "min_x", "max_x")
        s = DST.secondary_slice(osm, bounds, rank).drop("anchor_x", "anchor_y", "min_x", "max_x")
        n_primary += p.count()
        conflated, new = C.conflate(p, s)
        got |= _pairs(conflated)
        got_new |= {r["ext_id"] for r in new.select("ext_id").collect()}

    # primary partitioning is exact (each way owned by exactly one range)
    assert n_primary == ext.count()
    assert got == expected
    assert got_new == expected_new


def test_secondary_replication_is_bounded(spark):
    osm = DST.with_tile_columns(synth.osm_ways(spark, SF))
    ext = DST.with_tile_columns(synth.external_ways(spark, SF))
    k = 4
    bounds = DST.range_boundaries(ext, k)
    total = osm.count()
    selected = sum(DST.secondary_slice(osm, bounds, r).count() for r in range(k))
    # replication factor: > 1 (borders) but far below full duplication (k)
    assert total <= selected <= 2.5 * total


def test_exact_slices_match_and_replicate_less(spark):
    """The measured-extent secondary slice is (a) lossless — union of
    executor-local conflations equals the single run — and (b) strictly
    tighter than the blanket-pad slice."""
    ext = DST.with_tile_columns(synth.external_ways(spark, SF))
    osm = DST.with_tile_columns(synth.osm_ways(spark, SF))
    drop = ["anchor_x", "anchor_y", "min_x", "max_x"]
    single, single_new = C.conflate(ext.drop(*drop), osm.drop(*drop))
    expected = _pairs(single)
    expected_new = {r["ext_id"] for r in single_new.select("ext_id").collect()}

    k = 4
    bounds = DST.range_boundaries(ext, k)
    extents = DST.primary_extents(ext, bounds)
    got, got_new = set(), set()
    n_exact, n_padded = 0, 0
    for rank in range(k):
        p = DST.primary_slice(ext, bounds, rank).drop(*drop)
        s = DST.secondary_slice_exact(osm, extents[rank])
        n_exact += s.count()
        n_padded += DST.secondary_slice(osm, bounds, rank).count()
        conflated, new = C.conflate(p, s.drop(*drop))
        got |= _pairs(conflated)
        got_new |= {r["ext_id"] for r in new.select("ext_id").collect()}
    assert got == expected
    assert got_new == expected_new
    assert n_exact <= n_padded
