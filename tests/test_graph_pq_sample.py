"""Tests for the round-5 batch: fixed-point PageRank (operators/graph.py),
IVF-PQ ANN (similarity.pq_encode/pq_topk), and Efraimidis–Spirakis
weighted sampling (curation.weighted_sample_topk)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_merge_spark.operators import curation as CU
from osm_merge_spark.operators import graph as G
from osm_merge_spark.operators import similarity as S


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def test_pagerank_two_node_symmetric(spark):
    """a<->b is the stationary uniform chain: rank stays exactly SCALE/2."""
    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    out = {r["node"]: r["rank_fp"] for r in G.pagerank(e, iters=4).collect()}
    half = G.SCALE // 2
    assert out == {"a": half, "b": half}


def test_pagerank_matches_numpy_fixed_point(spark):
    """The Spark loop reproduces the same integer recurrence computed
    imperatively — including the floor-division loss terms."""
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "b")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank_fp"] for r in G.pagerank(e, iters=3).collect()}

    nodes = sorted({x for p in edges for x in p})
    n = len(nodes)
    outdeg = {v: sum(1 for s, _ in edges if s == v) for v in nodes}
    r = {v: G.SCALE // n for v in nodes}
    base = (15 * G.SCALE) // (100 * n)
    for _ in range(3):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += r[s] // outdeg[s]
        r = {v: base + (85 * inflow[v]) // 100 for v in nodes}
    assert got == r


def test_pagerank_sink_keeps_teleport_only(spark):
    """A pure sink (no out-edges) accumulates inflow but sends nothing;
    with no inflow a source node decays toward the teleport floor."""
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    out = {r["node"]: r["rank_fp"] for r in G.pagerank(e, iters=2).collect()}
    base = (15 * G.SCALE) // (100 * 2)
    # a gets teleport only after iter 1; b gets teleport + 85% of a's mass
    assert out["a"] == base
    assert out["b"] == base + (85 * base) // 100


# ---------------------------------------------------------------------------
# PQ encode + ADC
# ---------------------------------------------------------------------------


def _np_pq_code(vec, s, dsub=8, ksub=8):
    sub = np.asarray(vec[s * dsub : (s + 1) * dsub], dtype=np.float64)
    best_c, best_d = None, None
    for c in range(ksub):
        cent = np.array(S._pq_centroid(s, c, dsub))
        d = float(np.sum(cent * cent)) - 2.0 * float(np.dot(sub, cent))
        if best_d is None or d < best_d:
            best_c, best_d = c, d
    return best_c


def test_pq_encode_matches_numpy_argmin(spark):
    rng = np.random.RandomState(7)
    vecs = [[float(x) for x in rng.uniform(-1, 1, 64)] for _ in range(20)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id int, embedding array<double>"
    )
    out = S.pq_encode(df, "embedding").orderBy("vec_id").collect()
    for row in out:
        for s in range(8):
            assert row[f"code{s}"] == _np_pq_code(vecs[row["vec_id"]], s)


def test_pq_topk_zero_distortion_recovers_exact_dot(spark):
    """Targets that ARE codebook points quantize losslessly, so the ADC
    score equals the exact dot product.  Probe = target vector (distinct
    id) guarantees they share a coarse cell at nprobe=1 — large nprobe is
    out of contract (with_ivf_cells documents the expression-tree
    explosion past nprobe 4)."""
    # target = concatenation of codebook entries (sub s -> code (s+2) % 8)
    t_vec = []
    for s in range(8):
        t_vec += S._pq_centroid(s, (s + 2) % 8, 8)
    probes = spark.createDataFrame([(0, t_vec)], "probe_id int, embedding array<double>")
    targets = spark.createDataFrame(
        [(100, t_vec)], "vec_id int, embedding array<double>"
    )
    out = S.pq_topk(probes, targets, k=1, nprobe=1).collect()
    assert len(out) == 1
    exact = float(np.dot(np.array(t_vec), np.array(t_vec)))
    assert out[0]["adc_dot"] == pytest.approx(exact, abs=1e-6)


def test_pq_topk_candidates_are_cell_bounded(spark, tmp_path):
    """nprobe=1 must yield a subset of the nprobe=2 candidate set (IVF
    monotonicity carries over to the PQ scorer)."""
    rng = np.random.RandomState(11)
    vecs = [(i, [float(x) for x in rng.uniform(-1, 1, 64)]) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<double>")
    probes = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    got1 = {
        (r["probe_id"], r["vec_id"])
        for r in S.pq_topk(probes, df, k=60, nprobe=1).collect()
    }
    got2 = {
        (r["probe_id"], r["vec_id"])
        for r in S.pq_topk(probes, df, k=60, nprobe=2).collect()
    }
    assert got1 <= got2 and len(got2) > len(got1)


# ---------------------------------------------------------------------------
# Weighted sampling
# ---------------------------------------------------------------------------


def test_weighted_sample_es_key_formula(spark):
    df = spark.createDataFrame(
        [("k1", 10.0, "g"), ("k2", 100.0, "g"), ("k3", 0.0, "g")],
        "id string, w double, g string",
    )
    rows = CU.weighted_sample_topk(df, "w", k=3, key_col="id", group_col="g").collect()
    got = {r["id"]: r for r in rows}
    assert "k3" not in got  # zero weight excluded
    for r in rows:
        assert r["es_key"] == pytest.approx(
            round(math.log(r["u"]) / r["w"], 12), abs=1e-12
        )


def test_weighted_sample_group_cap_and_determinism(spark):
    data = [(f"id{i}", float(1 + i % 7), f"g{i % 3}") for i in range(200)]
    df = spark.createDataFrame(data, "id string, w double, g string")
    a = CU.weighted_sample_topk(df, "w", k=4, key_col="id", group_col="g")
    pa = a.toPandas().sort_values(["g", "es_rank"]).reset_index(drop=True)
    assert (pa.groupby("g").size() == 4).all()
    pb = (
        CU.weighted_sample_topk(df, "w", k=4, key_col="id", group_col="g")
        .toPandas()
        .sort_values(["g", "es_rank"])
        .reset_index(drop=True)
    )
    assert pa.equals(pb)


def test_weighted_sample_prefers_heavy_rows_statistically(spark):
    """With weight 50 vs 1, heavy rows should dominate a global top-k
    draw (the ES inclusion-probability property, checked loosely)."""
    data = [(f"h{i}", 50.0) for i in range(50)] + [(f"l{i}", 1.0) for i in range(50)]
    df = spark.createDataFrame(data, "id string, w double")
    top = CU.weighted_sample_topk(df, "w", k=20, key_col="id").collect()
    heavy = sum(1 for r in top if r["id"].startswith("h"))
    assert heavy >= 15


# ---------------------------------------------------------------------------
# Degenerate inputs (an upstream filter can legitimately empty any frame;
# the failure mode must be an empty result or a clear error, never a
# driver-side ZeroDivisionError/IndexError)
# ---------------------------------------------------------------------------


def test_pagerank_empty_edges_returns_empty_frame(spark):
    e = spark.createDataFrame([], "src string, dst string")
    out = G.pagerank(e, iters=3)
    assert out.columns == ["node", "rank_fp", "rank"]
    assert out.count() == 0


def test_triangles_empty_edges(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert G.triangles(e).count() == 0


def test_kmeans_empty_input_raises_value_error(spark):
    emb = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="no rows"):
        S.kmeans_fit(emb, k=4, iters=2)


def test_kmeans_fewer_rows_than_k_clamps(spark):
    """3 rows, k=8: fit with 3 centroids (each row its own centroid after
    convergence) instead of IndexError in the update loop."""
    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [0.0, 10.0])],
        "vec_id bigint, embedding array<float>",
    )
    cents = S.kmeans_fit(emb, k=8, iters=2)
    assert len(cents) == 3
    assert sorted(cents) == [[0.0, 0.0], [0.0, 10.0], [10.0, 0.0]]
