"""Document-table seam (sources/doctable.py): table-vs-path resolution,
schema gate, time-travel option plumbing, flat-corpus adapter."""

import pytest
from pyspark.sql import functions as F

from osm_merge_spark.sources import doctable as DT
from osm_merge_spark.sources import synth

SF = "/root/testdata/sf0.001"


def _spans_df(spark):
    return synth.documents_spans(spark, SF)


def test_path_source_reads_parquet(spark, tmp_path):
    p = str(tmp_path / "docs")
    _spans_df(spark).write.parquet(p)
    df = DT.read_documents(spark, p)
    assert df.count() == _spans_df(spark).count()
    assert dict(df.dtypes)["spans"].startswith("array<struct<")


def test_catalog_source_resolves_table(spark, tmp_path):
    _spans_df(spark).limit(10).createOrReplaceTempView("docs_seam_test")
    df = DT.read_documents(spark, "docs_seam_test")
    assert df.count() == 10


def test_time_travel_rejected_on_plain_path(spark, tmp_path):
    p = str(tmp_path / "docs2")
    _spans_df(spark).limit(1).write.parquet(p)
    with pytest.raises(ValueError, match="catalog-backed"):
        DT.read_documents(spark, p, snapshot_id=123)


def test_schema_gate_fails_loudly(spark, tmp_path):
    p = str(tmp_path / "bad")
    spark.range(3).select(F.col("id").alias("doc_id"), F.col("id").alias("spans")).write.parquet(p)
    with pytest.raises(ValueError, match="array<struct<"):
        DT.read_documents(spark, p)
    p2 = str(tmp_path / "bad2")
    spark.range(3).write.parquet(p2)
    with pytest.raises(ValueError, match="missing doc_id"):
        DT.read_documents(spark, p2)


def test_flat_corpus_adapter_round_trips(spark):
    from osm_merge_spark.operators import spans as SP

    flat = spark.createDataFrame([("d1", "hello world"), ("d2", "")], "doc_id string, text string")
    wrapped = DT.documents_from_text(flat)
    rows = {r.doc_id: r.spans for r in wrapped.collect()}
    assert rows["d1"][0].kind == "text" and rows["d1"][0].text == "hello world"
    assert rows["d1"][0].offset == 0 and rows["d1"][0].media_ref is None
    # the wrapped shape is accepted by the seam's schema gate
    DT._check_schema(wrapped)
