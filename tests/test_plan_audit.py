"""Registry plan audit, high-risk subset (full sweep: scripts/plan_audit.py).

Pins the anti-pattern contract — no CartesianProduct, no BatchEvalPython,
BroadcastNestedLoopJoin only on the documented tiny-broadcast allowlist,
and a formatted-plan size cap — on the queries whose shapes have historically
produced tree bombs or quadratic plans: the ANN family (ivf/pq/kmeans were
the 1.7 MB / 650 kB explosions fixed 2026-08-19), the join-heavy conflation
and dedup paths, and the graph operators."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.plan_audit import (  # noqa: E402
    BAD,
    BNLJ_ALLOWED,
    PLAN_CHAR_CAP,
    plan_of,
)

SF = "/root/testdata/sf0.001"

HIGH_RISK = [
    "q_pq_topk",
    "q_ivf_topk",
    "q_kmeans_clusters",
    "q_semdedup",
    "q_embed_neardup",
    "q_lsh_topk",
    "q_conflate_flagship",
    "q_conflate_new",
    "q_minhash_band_pairs",
    "q_simhash64_pairs",
    "q_triangles",
    "q_pagerank",
    "q_knn_join",
    "q_sq8_topk",
    "q_zorder_buckets",
]


@pytest.fixture(scope="module")
def plans(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    return {name: plan_of(qs[name](spark, SF)) for name in HIGH_RISK}


def test_no_cartesian_or_rowwise_python(plans):
    bad = [(n, b) for n, p in plans.items() for b in BAD if b in p]
    assert bad == []


def test_bnlj_only_on_documented_allowlist(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_ALLOWED
    ]
    assert offenders == []


def test_plan_size_capped(plans):
    oversize = {n: len(p) for n, p in plans.items() if len(p) > PLAN_CHAR_CAP}
    assert oversize == {}, (
        f"{oversize} — expression-tree bomb (the with_ivf_cells masked-CASE "
        "shape compounded to 1.7 MB under projection collapse and OOMed a "
        "default-heap driver; keep argmin/top-n selections in single array "
        "expressions)"
    )
