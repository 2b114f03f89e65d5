"""Randomized brute-force cross-checks for the late-round-5 operators:
each Spark operator vs an independent pure-Python simulator on seeded
random inputs.  Catches the class of bug a single hand example misses
(wrong tie-break, off-by-one frame, orientation asymmetry)."""

import datetime as dt
import itertools
import math
import random

from pyspark.sql import functions as F

from osm_merge_spark.functions.text import HASH_MOD
from osm_merge_spark.operators import bitmap as BM
from osm_merge_spark.operators import curation as CU
from osm_merge_spark.operators import funnel as FU
from osm_merge_spark.operators import graph as G
from osm_merge_spark.operators import sketch as SK


def _poly_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % HASH_MOD
    return h


def _coin(s: str) -> float:
    h = _poly_hash(s)
    for _ in range(2):
        h = (h * 48271) % HASH_MOD
    return round((h % 1_000_000 + 1) / 1_000_000, 6)


def test_triangles_matches_bruteforce(spark):
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        n = 12
        edges = [(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.35]
        # undirected brute force: count triangles per node
        adj = {v: set() for v in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        want = {}
        for x, y, z in itertools.combinations(range(n), 3):
            if y in adj[x] and z in adj[x] and z in adj[y]:
                for v in (x, y, z):
                    want[v] = want.get(v, 0) + 1
        e = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = {r["node"]: r["n_tri"] for r in G.triangles(e).collect()}
        assert got == want, f"seed {seed}"


def test_pagerank_matches_simulator_on_random_graphs(spark):
    for seed in (3, 11):
        rng = random.Random(seed)
        n = 15
        edges = sorted(
            {(rng.randrange(n), rng.randrange(n)) for _ in range(40)} - {(v, v) for v in range(n)}
        )
        e = spark.createDataFrame(edges, "src int, dst int")
        got = {r["node"]: r["rank_fp"] for r in G.pagerank(e, iters=4).collect()}

        nodes = sorted({x for p in edges for x in p})
        outdeg = {}
        for s, _ in edges:
            outdeg[s] = outdeg.get(s, 0) + 1
        r = {v: G.SCALE // len(nodes) for v in nodes}
        base = (15 * G.SCALE) // (100 * len(nodes))
        for _ in range(4):
            inflow = {v: 0 for v in nodes}
            for s, d in edges:
                inflow[d] += r[s] // outdeg[s]
            r = {v: base + (85 * inflow[v]) // 100 for v in nodes}
        assert got == r, f"seed {seed}"
        # fixed-point mass never exceeds the ideal total
        assert sum(got.values()) <= G.SCALE


def test_cms_dominates_truth_on_random_multisets(spark):
    for seed in (5, 19):
        rng = random.Random(seed)
        keys = [rng.randrange(40) for _ in range(600)]
        df = spark.createDataFrame([(k,) for k in keys], "k bigint").withColumn(
            "kh", SK.kmv_hash(F.col("k"))
        )
        sk = SK.count_min_build(df, "kh", w=64, d=3)
        est = {
            r["k"]: r["cms_est"]
            for r in SK.count_min_estimate(sk, df.distinct(), "kh", w=64, d=3).collect()
        }
        truth = {}
        for k in keys:
            truth[k] = truth.get(k, 0) + 1
        assert all(est[k] >= t for k, t in truth.items())
        # total overcount is bounded by d * N (loose sanity, not the whp bound)
        assert sum(est.values()) <= 3 * len(keys) * len(truth)


def test_weighted_sample_matches_python_es(spark):
    rng = random.Random(9)
    rows = [(f"key{i}", round(rng.uniform(0.5, 200.0), 2), f"g{i % 2}") for i in range(120)]
    df = spark.createDataFrame(rows, "id string, w double, g string")
    got = {
        (r["g"], r["es_rank"]): r["id"]
        for r in CU.weighted_sample_topk(df, "w", k=6, key_col="id", group_col="g").collect()
    }
    for g in ("g0", "g1"):
        scored = [
            (round(math.log(_coin(i)) / w, 12), i)
            for i, w, gg in rows
            if gg == g and w > 0
        ]
        want = [i for _, i in sorted(scored, key=lambda t: (-t[0], t[1]))[:6]]
        for rank, i in enumerate(want, start=1):
            assert got[(g, rank)] == i


def test_funnel_matches_simulator(spark):
    rng = random.Random(21)
    base = dt.datetime(2024, 1, 1)
    steps = ["view", "click", "purchase"]
    rows = []
    for u in range(30):
        for _ in range(rng.randrange(1, 12)):
            rows.append(
                (u, rng.choice(steps + ["noise"]), base + dt.timedelta(seconds=rng.randrange(100000)))
            )
    ev = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
    got = {r["user_id"]: (r["t1"], r["t2"], r["t3"]) for r in FU.funnel(ev, steps).collect()}

    want = {}
    for u in {r[0] for r in rows}:
        evs = [(int(t.timestamp()), s) for (uu, s, t) in rows if uu == u]
        t_prev, ts_out = None, []
        for step in steps:
            cand = [t for t, s in evs if s == step and (t_prev is None or t > t_prev)]
            t_prev = min(cand) if cand else None
            ts_out.append(t_prev)
            if t_prev is None:
                ts_out += [None] * (len(steps) - len(ts_out))
                break
        if ts_out[0] is not None:
            want[u] = tuple(ts_out)
    assert got == want


def test_sessionize_matches_simulator(spark):
    rng = random.Random(33)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(15):
        t = 0
        for _ in range(rng.randrange(1, 20)):
            t += rng.randrange(1, 4000)
            rows.append((u, eid, base + dt.timedelta(seconds=t)))
            eid += 1
    ev = spark.createDataFrame(rows, "user_id bigint, event_id bigint, ts timestamp")
    got = {
        (r["user_id"], r["session_idx"]): (r["start_s"], r["end_s"], r["n_events"])
        for r in FU.sessionize_batch(ev, gap_s=1800).collect()
    }
    want = {}
    for u in {r[0] for r in rows}:
        ts = sorted(int(t.timestamp()) for (uu, _, t) in rows if uu == u)
        sess, cur = [], [ts[0]]
        for a, b in zip(ts, ts[1:]):
            if b - a > 1800:
                sess.append(cur)
                cur = []
            cur.append(b)
        sess.append(cur)
        for i, s in enumerate(sess, start=1):
            want[(u, i)] = (s[0], s[-1], len(s))
    assert got == want


def test_bitmap_pairs_match_set_algebra(spark):
    rng = random.Random(13)
    rows = [(f"k{rng.randrange(4)}", rng.randrange(500)) for _ in range(800)]
    df = spark.createDataFrame(rows, "key string, member bigint")
    got = {
        (r["key_a"], r["key_b"]): r["n_both"]
        for r in BM.bitmap_pair_counts(BM.bitmap_build(df, "key", "member")).collect()
    }
    sets = {}
    for k, m in rows:
        sets.setdefault(k, set()).add(m)
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter:
            assert got[(a, b)] == inter
        else:
            assert (a, b) not in got
