"""Z-order layout, Bloom semi-join, exact quantiles (round-5 additions)."""

import math

from pyspark.sql import functions as F

from osm_merge_spark.operators import bloomjoin as B
from osm_merge_spark.operators import layout as L
from osm_merge_spark.operators import sketch as SK

SF = "/root/testdata/sf0.001"


def _py_zkey(lon: float, lat: float, bits: int = 16) -> int:
    n = 1 << bits
    qx = min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    qy = min(max(int(math.floor((lat + 90.0) / 180.0 * n)), 0), n - 1)
    key = 0
    for i in range(bits):
        key |= ((qx >> i) & 1) << (2 * i + 1)
        key |= ((qy >> i) & 1) << (2 * i)
    return key


def test_zorder_key_matches_python_reference(spark):
    pts = [(-109.0, 37.0), (0.0, 0.0), (179.99, 89.99), (-180.0, -90.0), (12.34, -56.78)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    got = df.select("lon", "lat", L.zorder_key(F.col("lon"), F.col("lat")).alias("z")).collect()
    for r in got:
        assert r["z"] == _py_zkey(r["lon"], r["lat"]), (r["lon"], r["lat"])


def test_zorder_layout_partitions_hold_disjoint_ranges(spark):
    df = spark.range(2000).select(
        (F.col("id") % 360 - 180.0 + 0.5).alias("lon"),
        (F.col("id") % 180 - 90.0 + 0.5).alias("lat"),
    )
    parts = (
        L.zorder_layout(df, n_partitions=8)
        .select(F.spark_partition_id().alias("pid"), "zkey")
        .groupBy("pid")
        .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    # range partitioning => consecutive partitions own disjoint zkey intervals
    for a, b in zip(parts, parts[1:]):
        assert a["hi"] <= b["lo"]


def test_zorder_buckets_cluster_geographically(spark):
    # points on a coarse grid: each fixed-width morton bucket must span a
    # bbox far smaller than the full extent (the locality claim)
    df = spark.range(4096).select(
        (F.col("id") % 64 * 5.6 - 179.0).alias("lon"),
        ((F.col("id") / 64).cast("int") * 2.8 - 89.0).alias("lat"),
    )
    rows = L.zorder_buckets(df, n_buckets=16).collect()
    assert sum(r["n_rows"] for r in rows) == 4096
    # clustering claim: the average bucket bbox is a small fraction of the
    # full extent (buckets straddling a quadtree boundary are wide, but the
    # layout as a whole must cluster — a random layout averages ~full extent)
    areas = [
        (r["max_lon"] - r["min_lon"]) * (r["max_lat"] - r["min_lat"]) for r in rows
    ]
    assert sum(areas) / len(areas) <= (360.0 * 180.0) / 4


def test_bloom_bitmap_has_no_false_negatives(spark):
    keys = spark.range(0, 500, 7).select(F.col("id").alias("k"))
    words = B.bloom_bitmap(keys, "k", m_bits=2048, n_hashes=3)
    probe = spark.range(0, 500).select(
        F.col("id").alias("k"),
        B.bloom_might_contain(F.col("id"), words, 2048, 3).alias("hit"),
    ).collect()
    member = {k for k in range(0, 500, 7)}
    for r in probe:
        if r["k"] in member:
            assert r["hit"], f"false negative for {r['k']}"
    # and the filter actually prunes (false-positive rate well under 1)
    fp = sum(1 for r in probe if r["hit"] and r["k"] not in member)
    assert fp < 100


def test_bloom_semi_join_equals_plain_semi_join(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet").filter(F.col("c_nationkey") == 3)
    got = sorted(
        r["o_orderkey"]
        for r in B.bloom_semi_join(orders, cust, "o_custkey", "c_custkey").collect()
    )
    exact = sorted(
        r["o_orderkey"]
        for r in orders.join(
            cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_semi"
        ).collect()
    )
    assert got == exact and len(got) > 0


def test_exact_quantiles_match_rank_definition(spark):
    import numpy as np

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    got = {
        (r["o_orderpriority"], r["p"]): r["q"]
        for r in SK.exact_quantiles(orders, "o_orderpriority", "o_totalprice", [0.5, 0.9]).collect()
    }
    pdf = orders.select("o_orderpriority", "o_totalprice").toPandas()
    for g, grp in pdf.groupby("o_orderpriority"):
        vals = np.sort(grp["o_totalprice"].to_numpy())
        for p in (0.5, 0.9):
            expect = vals[math.ceil(p * len(vals)) - 1]
            assert got[(g, p)] == expect
