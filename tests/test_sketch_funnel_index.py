"""Tests for count-min sketch (operators/sketch.py), ordered funnel
(operators/funnel.py), triangle counting (operators/graph.py), and the
inverted-index / merge-pair builders (operators/index.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from osm_merge_spark.operators import funnel as FU
from osm_merge_spark.operators import graph as G
from osm_merge_spark.operators import index as IX
from osm_merge_spark.operators import sketch as SK


# ---------------------------------------------------------------------------
# Count-min
# ---------------------------------------------------------------------------


def _hashed(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    return df.withColumn("kh", SK.kmv_hash(F.col("k")))


def test_cms_never_underestimates(spark):
    keys = [i % 17 for i in range(500)] + [3] * 40
    df = _hashed(spark, keys)
    sk = SK.count_min_build(df, "kh", w=32, d=3)
    items = _hashed(spark, list(set(keys)))
    est = {r["k"]: r["cms_est"] for r in SK.count_min_estimate(sk, items, "kh", w=32, d=3).collect()}
    truth = {k: keys.count(k) for k in set(keys)}
    for k, t in truth.items():
        assert est[k] >= t


def test_cms_exact_without_collisions(spark):
    keys = list(range(10))
    df = _hashed(spark, keys)
    sk = SK.count_min_build(df, "kh", w=4096, d=3)
    est = {r["k"]: r["cms_est"] for r in SK.count_min_estimate(sk, df, "kh", w=4096, d=3).collect()}
    assert est == {k: 1 for k in keys}


def test_cms_sketches_merge_by_addition(spark):
    """CMS(a ∪ b) == CMS(a) + CMS(b) counter-wise — the mergeability that
    makes map-side partials correct."""
    a = _hashed(spark, [1, 2, 3, 2])
    b = _hashed(spark, [2, 3, 4])
    both = _hashed(spark, [1, 2, 3, 2, 2, 3, 4])
    ska = SK.count_min_build(a, "kh", w=16, d=2).withColumnRenamed("cnt", "ca")
    skb = SK.count_min_build(b, "kh", w=16, d=2).withColumnRenamed("cnt", "cb")
    merged = {
        (r["cms_row"], r["cms_bucket"]): r["ca"] + r["cb"]
        for r in ska.join(skb, ["cms_row", "cms_bucket"], "full")
        .fillna(0, ["ca", "cb"])
        .collect()
    }
    direct = {
        (r["cms_row"], r["cms_bucket"]): r["cnt"]
        for r in SK.count_min_build(both, "kh", w=16, d=2).collect()
    }
    assert merged == direct


# ---------------------------------------------------------------------------
# Funnel
# ---------------------------------------------------------------------------


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [(u, t, base + dt.timedelta(seconds=s)) for u, t, s in rows]
    return spark.createDataFrame(data, "user_id bigint, event_type string, ts timestamp")


def test_funnel_full_and_partial_and_absent(spark):
    ev = _ev(
        spark,
        [
            (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
            (2, "view", 10), (2, "purchase", 5),          # purchase BEFORE view
            (3, "click", 10), (3, "purchase", 20),        # never viewed
        ],
    )
    out = {r["user_id"]: r for r in FU.funnel(ev, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2}            # user 3 never entered the funnel
    assert out[1]["steps_completed"] == 3
    assert (out[1]["t1"], out[1]["t2"], out[1]["t3"]) == (
        out[1]["t1"], out[1]["t1"] + 10, out[1]["t1"] + 20
    )
    assert out[2]["steps_completed"] == 1 and out[2]["t2"] is None


def test_funnel_strict_order_excludes_simultaneous(spark):
    ev = _ev(spark, [(1, "view", 10), (1, "click", 10), (1, "click", 40)])
    out = FU.funnel(ev, ["view", "click"]).collect()[0]
    # the t=10 click ties the view and must NOT count; the t=40 one does
    assert out["t2"] == out["t1"] + 30


def test_funnel_first_touch_attribution(spark):
    ev = _ev(spark, [(1, "view", 10), (1, "view", 5), (1, "click", 7), (1, "click", 30)])
    out = FU.funnel(ev, ["view", "click"]).collect()[0]
    assert out["t1"] % 60 == 5   # earliest view
    assert out["t2"] == out["t1"] + 2  # click at 7 > view at 5


# ---------------------------------------------------------------------------
# Triangles
# ---------------------------------------------------------------------------


def test_triangles_k4(spark):
    """K4 has 4 triangles; every node participates in exactly 3."""
    nodes = [0, 1, 2, 3]
    edges = [(a, b) for a in nodes for b in nodes if a < b]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = {r["node"]: r["n_tri"] for r in G.triangles(e).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_path_has_none(spark):
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src bigint, dst bigint")
    assert G.triangles(e).count() == 0


def test_triangles_duplicate_and_reverse_edges_ignored(spark):
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 2), (2, 2)],
        "src bigint, dst bigint",
    )
    out = {r["node"]: r["n_tri"] for r in G.triangles(e).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


# ---------------------------------------------------------------------------
# Inverted index / merge pairs
# ---------------------------------------------------------------------------


def test_inverted_index_postings_sorted_and_banded(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "apple banana apple"),
            ("d2", "banana cherry"),
            ("d3", "banana"),
        ],
        "doc_id string, text string",
    )
    out = {r["token"]: r for r in IX.inverted_index(docs).collect()}
    assert out["banana"]["postings"] == ["d1", "d2", "d3"]
    assert out["banana"]["df"] == 3
    assert out["apple"]["postings"] == ["d1"]  # per-doc distinct: df 1 not 2
    cap = {r["token"] for r in IX.inverted_index(docs, min_df=2).collect()}
    assert cap == {"banana"}
    lo = {r["token"] for r in IX.inverted_index(docs, max_df=2).collect()}
    assert "banana" not in lo


def test_merge_pair_counts(spark):
    docs = spark.createDataFrame(
        [("d1", "a b a b"), ("d2", "a b"), ("d3", "x")],
        "doc_id string, text string",
    )
    out = {r["pair"]: r["cnt"] for r in IX.merge_pair_counts(docs, top_n=10).collect()}
    assert out == {"a b": 3, "b a": 1}


# ---------------------------------------------------------------------------
# Degenerate inputs
# ---------------------------------------------------------------------------


def test_funnel_empty_steps_raises(spark):
    ev = spark.createDataFrame([], "user_id string, event_type string, ts timestamp")
    with pytest.raises(ValueError, match="non-empty"):
        FU.funnel(ev, [])


def test_exact_quantiles_p_zero_is_group_min(spark):
    """percentile_disc(0) semantics: the clamped rank 1 row, i.e. the min —
    not an empty result (ceil(0*n) = 0 matches no row without the clamp)."""
    df = spark.createDataFrame(
        [("g", 5.0), ("g", 1.0), ("g", 3.0)], "grp string, v double"
    )
    out = {r["p"]: r["q"] for r in SK.exact_quantiles(df, "grp", "v", [0.0, 1.0]).collect()}
    assert out == {0.0: 1.0, 1.0: 5.0}
