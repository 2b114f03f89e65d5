"""Plan pins for the late-round-5 operators: broadcast dims in the star
rollup, partial aggregation in the bitmap build, top-k without a global
sort, and zero Python boundaries in the pure-Column ANN/graph paths."""

import re

import pytest
from pyspark.sql import functions as F

from osm_merge_spark.operators import bitmap as BM
from osm_merge_spark.operators import curation as CU
from osm_merge_spark.operators import graph as G
from osm_merge_spark.operators import index as IX
from osm_merge_spark.operators import similarity as S
from osm_merge_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    df.sparkSession.catalog.clearCache()
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_star_revenue_broadcasts_dims(spark):
    plan = plan_of(REGISTRY["q_star_revenue"][0](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_bitmap_build_partial_aggregates(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = plan_of(BM.bitmap_build(ev, "event_type", "user_id"))
    # partial + final HashAggregate around one exchange: words combine
    # map-side before anything crosses the wire
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2
    assert "partial_bit_or" in plan  # words combine BEFORE the exchange
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_topk_uses_take_ordered_not_global_sort(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(IX.merge_pair_counts(docs, top_n=20))
    assert "TakeOrderedAndProject" in plan

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    plan2 = plan_of(
        CU.weighted_sample_topk(orders, "o_totalprice", k=5, key_col="o_orderkey")
    )
    assert "TakeOrderedAndProject" in plan2


def test_pq_topk_stays_jvm_side(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    plan = plan_of(S.pq_topk(probes, emb))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_pagerank_no_python_no_cartesian(spark):
    e = spark.createDataFrame(
        [(i, (i * 3 + 1) % 50) for i in range(50)], "src bigint, dst bigint"
    )
    plan = plan_of(G.pagerank(e, iters=2))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
