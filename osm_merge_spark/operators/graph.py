"""Iterative graph analytics over edge DataFrames — PageRank as the model.

Web-corpus curation ranks pages by link structure (the original PageRank
use case; Common-Crawl-scale pipelines still use it as a quality prior).
The Spark shape is the canonical iterative loop: a fixed number of
(join → groupBy-sum) rounds, each one shuffle on the node key, with the
edge table's partitioning REUSED across rounds (partition once on src,
every subsequent join co-locates for free).

Exactness doctrine: ranks are bigint fixed-point (units of 1e-12), all
transfer arithmetic is integer division — so the per-node sum is
order-independent and the result is bitwise reproducible across engines
and across shuffle schedules.  A float PageRank would be nondeterministic
under Spark's unordered aggregation (double addition is not associative);
the integer formulation is what makes an oracle-checkable driver row
possible, and loses at most 1e-12 per edge per round vs the real-valued
recurrence.

r_0(v)   = SCALE // N
r_{k+1}(v) = (15 * SCALE) // (100 * N)
           + (85 * Σ_{(u,v)∈E} (r_k(u) // outdeg(u))) // 100

(damping 0.85 as the exact rational 85/100; dangling mass is not
redistributed — callers wanting an ergodic chain add reverse edges, as
q_pagerank does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration exact-fixed-point PageRank.

    ``edges`` must be distinct (src, dst) pairs.  Returns
    (node, rank_fp bigint, rank double) — ``rank`` is rank_fp/1e12 rounded
    to 12 dp for display; ``rank_fp`` is the exact artifact.

    Plan: nodes/outdeg are one distinct + one groupBy over the edge list;
    each iteration is join(edges, ranks on src) → groupBy(dst).sum —
    ONE shuffle per round on the node key (the join reuses the edges
    partitioning; map-side partial sums combine before the exchange).
    At 100 TB the ranks side is also huge: both sides hash-partition on
    the node key and stay co-located round to round.  The iteration count
    is fixed driver-side (no convergence test — no driver collect)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # driver-side scalar: sizes the teleport term
    if n_nodes == 0:
        # an upstream filter may legitimately empty the edge list; return
        # the empty result frame instead of a driver-side ZeroDivisionError
        # from the teleport term below
        return nodes.select(
            "node",
            F.lit(0).cast("bigint").alias("rank_fp"),
            F.lit(0.0).alias("rank"),
        )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = (15 * SCALE) // (100 * n_nodes) if damping_pct == 85 else (
        (100 - damping_pct) * SCALE
    ) // (100 * n_nodes)

    ranks = nodes.withColumn("rank_fp", F.lit(SCALE // n_nodes).cast("bigint"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_fp div outdeg").alias("share"),
            )
            .groupBy("node")
            .agg(F.sum("share").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("bigint")
                    + F.expr(
                        f"({damping_pct} * coalesce(inflow, 0)) div 100"
                    ).cast("bigint")
                ).alias("rank_fp"),
            )
        )
    return ranks.withColumn(
        "rank", F.round(F.col("rank_fp").cast("double") / SCALE, 12)
    )


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts via degree-ordered wedge
    closure (the standard distributed formulation — e.g. Suri & Vassilvitskii
    "Counting Triangles and the Curse of the Last Reducer", WWW 2011).

    ``edges`` is an undirected edge list (either or both directions, self
    loops ignored).  Each triangle is counted exactly once by orienting
    every edge from its lower-(degree, id) endpoint to the higher one:
    wedges a→b→c with a→c closing.  Orientation bounds the out-degree of
    every node by O(sqrt(|E|)) on skewed graphs — THE trick that makes the
    wedge join survive power-law degree distributions at 100 TB (a hub
    with 10^7 neighbors would otherwise generate 10^14 wedges).

    Plan: canonicalize + distinct (one shuffle), degree groupBy (one),
    wedge self-join on the mid node + closure semi-join on (a, c) — both
    equi-joins on node keys.  Returns (node, n_tri)."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # orient: keep edge (u, v) with (deg, id) of u < of v
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    ranked = e.join(da, "a").join(db, "b")
    fwd = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    o = ranked.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    # wedges u→v, v→w ; closed iff u→w is also an oriented edge
    o1 = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    o2 = o.select(F.col("u").alias("y"), F.col("v").alias("z"))
    wedges = o1.join(o2, "y").filter(F.col("x") != F.col("z"))
    closer = o.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = wedges.join(closer, ["x", "z"])  # each row = one triangle (x,y,z)
    per_node = (
        tri.select(F.col("x").alias("node"))
        .union(tri.select(F.col("y").alias("node")))
        .union(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    return per_node
