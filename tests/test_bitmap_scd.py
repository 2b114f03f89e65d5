"""Tests for bitmap-index set algebra (operators/bitmap.py), moving
aggregates (rollup.moving_agg), batch sessionization
(funnel.sessionize_batch), table checksums and SCD2 intervals
(operators/diff.py)."""

import datetime as dt

from pyspark.sql import functions as F

from osm_merge_spark.operators import bitmap as BM
from osm_merge_spark.operators import diff as D
from osm_merge_spark.operators import funnel as FU
from osm_merge_spark.operators import rollup as RU


def test_bitmap_and_count_matches_set_intersection(spark):
    rows = [("a", m) for m in [1, 2, 3, 64, 65, 200]] + [
        ("b", m) for m in [2, 3, 65, 300]
    ] + [("a", 2)]  # duplicate membership collapses
    df = spark.createDataFrame(rows, "key string, member bigint")
    idx = BM.bitmap_build(df, "key", "member")
    n = BM.bitmap_and_count(idx, "a", "b").collect()[0]["n_both"]
    assert n == len({1, 2, 3, 64, 65, 200} & {2, 3, 65, 300})


def test_bitmap_pair_counts_all_pairs(spark):
    rows = (
        [("a", m) for m in range(10)]
        + [("b", m) for m in range(5, 15)]
        + [("c", m) for m in range(100, 105)]
    )
    df = spark.createDataFrame(rows, "key string, member bigint")
    out = {
        (r["key_a"], r["key_b"]): r["n_both"]
        for r in BM.bitmap_pair_counts(BM.bitmap_build(df, "key", "member")).collect()
    }
    assert out.get(("a", "b")) == 5
    assert ("a", "c") not in out  # empty intersections produce no row
    assert all(a < b for a, b in out)


def test_moving_agg_trailing_frame(spark):
    df = spark.createDataFrame(
        [("u", i, (i + 1) * 100) for i in range(5)], "u string, i int, c bigint"
    )
    out = {r["i"]: (r["mov_sum_c"], r["mov_n"]) for r in RU.moving_agg(df, "u", ["i"], "c", n=3).collect()}
    assert out[0] == (100, 1)
    assert out[2] == (600, 3)       # 100+200+300
    assert out[4] == (1200, 3)      # 300+400+500


def test_sessionize_batch_gap_rule(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 100, base),
        (1, 101, base + dt.timedelta(seconds=100)),
        (1, 102, base + dt.timedelta(seconds=5000)),  # > 1800 gap -> new session
        (2, 103, base),
    ]
    ev = spark.createDataFrame(rows, "user_id bigint, event_id bigint, ts timestamp")
    out = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["end_s"] - r["start_s"])
        for r in FU.sessionize_batch(ev, gap_s=1800).collect()
    }
    assert out[(1, 1)] == (2, 100)
    assert out[(1, 2)] == (1, 0)
    assert out[(2, 1)] == (1, 0)


def test_table_checksum_order_invariant_and_sensitive(spark):
    rows = [(i, f"s{i % 3}", "g") for i in range(50)]
    a = spark.createDataFrame(rows, "id bigint, s string, g string")
    b = spark.createDataFrame(list(reversed(rows)), "id bigint, s string, g string").repartition(7)
    ca = D.table_checksum(a, ["id", "s"], "g").collect()[0]
    cb = D.table_checksum(b, ["id", "s"], "g").collect()[0]
    assert (ca["n_rows"], ca["checksum"]) == (cb["n_rows"], cb["checksum"])
    mutated = spark.createDataFrame(
        rows[:-1] + [(49, "DIFFERENT", "g")], "id bigint, s string, g string"
    )
    cm = D.table_checksum(mutated, ["id", "s"], "g").collect()[0]
    assert cm["checksum"] != ca["checksum"]


def test_scd2_intervals(spark):
    hist = spark.createDataFrame(
        [
            (1, 1, "A"), (1, 2, "A"), (1, 3, "B"), (1, 4, "B"), (1, 5, "C"),
            (2, 1, "Z"), (2, 2, "Z"),
        ],
        "k bigint, v int, status string",
    )
    out = [
        (r["k"], r["status"], r["valid_from"], r["valid_to"])
        for r in D.scd2_intervals(hist, "k", "v", ["status"])
        .orderBy("k", "valid_from")
        .collect()
    ]
    assert out == [
        (1, "A", 1, 3),
        (1, "B", 3, 5),
        (1, "C", 5, None),
        (2, "Z", 1, None),
    ]
