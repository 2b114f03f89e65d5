"""Unit tests for the corpus-curation operators (stratified sampling,
sequence packing, DSIR weights, boilerplate-chunk removal) against small
in-memory oracles."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from osm_merge_spark.operators import curation as CU


def _docs(spark, texts, **extra):
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    for k, v in extra.items():
        df[k] = v
    return spark.createDataFrame(df)


def test_stratified_sample_deterministic_and_rate_bounded(spark):
    n = 400
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": np.arange(n),
            "text": ["x"] * n,
            "source": ["a" if i % 2 == 0 else "b" for i in range(n)],
        })
    )
    rates = {"a": 1.0, "b": 0.25}
    got1 = CU.stratified_sample(docs, rates).toPandas()
    got2 = CU.stratified_sample(docs, rates).toPandas()
    # deterministic: identical row sets across invocations
    assert sorted(got1["doc_id"]) == sorted(got2["doc_id"])
    # rate 1.0 keeps everything; rate 0.25 keeps roughly a quarter
    a = got1[got1["source"] == "a"]
    b = got1[got1["source"] == "b"]
    assert len(a) == n // 2
    assert 0.10 * n / 2 < len(b) < 0.45 * n / 2
    # every kept row satisfies the predicate it claims
    assert (got1["u"] < got1["rate"]).all()


def test_stratified_sample_default_rate_for_unknown_strata(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": np.arange(100),
            "text": ["x"] * 100,
            "source": ["zzz"] * 100,
        })
    )
    assert CU.stratified_sample(docs, {"a": 1.0}, default_rate=0.0).count() == 0
    assert CU.stratified_sample(docs, {"a": 0.0}, default_rate=1.0).count() == 100


def test_pack_sequences_matches_bruteforce(spark):
    rng = np.random.RandomState(7)
    lengths = rng.randint(0, 40, 300)
    texts = [" ".join(["w"] * k) for k in lengths]
    docs = _docs(spark, texts)
    got = (
        CU.pack_sequences(docs, seq_len=64, num_partitions=8)
        .orderBy("doc_id")
        .toPandas()
    )
    cum = 0
    for i, k in enumerate(lengths):
        row = got.iloc[i]
        assert row["n_tokens"] == k
        assert row["pack_id"] == cum // 64
        assert row["pack_offset"] == cum % 64
        cum += int(k)


def test_pack_sequences_single_and_empty_partitions(spark):
    docs = _docs(spark, ["a b c", "", "d e"])
    got = CU.pack_sequences(docs, seq_len=4, num_partitions=16).orderBy("doc_id").toPandas()
    assert got["n_tokens"].tolist() == [3, 0, 2]
    assert got["pack_id"].tolist() == [0, 0, 0]
    assert got["pack_offset"].tolist() == [0, 3, 3]


def test_dsir_weights_prefer_target_like_docs(spark):
    # target docs use vocabulary A, raw-only docs vocabulary B; a doc made
    # of A-words must weigh higher than one made of B-words
    texts = (["alpha beta gamma delta"] * 20) + (["omega psi chi phi"] * 20)
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": np.arange(40),
            "text": texts,
            "lang": (["en"] * 20) + (["xx"] * 20),
        })
    )
    got = (
        CU.dsir_weights(docs, F.col("lang") == "en", buckets=64)
        .orderBy("doc_id")
        .toPandas()
    )
    w_target = got.iloc[0]["dsir_weight"]
    w_other = got.iloc[39]["dsir_weight"]
    assert w_target > 0 > w_other
    assert (got["n_toks"] == 4).all()


def test_dsir_weights_empty_doc_zero(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["hello world", ""],
                      "lang": ["en", "en"]})
    )
    got = CU.dsir_weights(docs, F.col("lang") == "en").orderBy("doc_id").toPandas()
    assert got.iloc[1]["n_toks"] == 0
    assert got.iloc[1]["dsir_weight"] == 0.0


def test_boilerplate_chunks_removed_and_reassembled(spark):
    # "the same footer" appears in 5 docs -> boilerplate at min_docs=5;
    # unique bodies survive with order preserved
    texts = [f"body{i} word{i} extra{i} the same footer" for i in range(5)]
    texts.append("unique doc only three more words here")  # 7 tokens -> 3 pieces
    docs = _docs(spark, texts)
    got = (
        CU.drop_boilerplate_chunks(docs, chunk=3, min_docs=5)
        .orderBy("doc_id")
        .toPandas()
    )
    # doc i tokens = [bodyi, wordi, extrai, the, same, footer] -> exactly
    # 2 pieces: "bodyi wordi extrai" (unique) + "the same footer" (in 5 docs)
    for i in range(5):
        row = got.iloc[i]
        assert row["n_chunks"] == 2
        assert row["n_boiler"] == 1
        assert row["text_clean"] == f"body{i} word{i} extra{i}"
    row5 = got.iloc[5]  # 7 tokens -> pieces of 3,3,1, none boilerplate
    assert row5["n_chunks"] == 3
    assert row5["n_boiler"] == 0
    assert row5["text_clean"] == "unique doc only three more words here"


def test_boilerplate_chunks_empty_doc(spark):
    docs = _docs(spark, ["", "a b c"])
    got = CU.drop_boilerplate_chunks(docs, chunk=3, min_docs=2).orderBy("doc_id").toPandas()
    assert got.iloc[0]["n_chunks"] == 0
    assert got.iloc[0]["text_clean"] == ""
    assert got.iloc[1]["text_clean"] == "a b c"


class TestDedupParagraphs:
    def _docs(self, spark, texts):
        import pandas as pd
        import numpy as np
        return spark.createDataFrame(
            pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
        )

    def test_first_occurrence_wins_and_reassembly(self, spark):
        docs = self._docs(
            spark,
            [
                "alpha beta\ngamma delta",      # both paras first occurrences
                "gamma delta\nepsilon zeta",    # first para is a dup of doc0/pos1
                "alpha beta",                   # whole doc is a dup
            ],
        )
        got = (
            CU.dedup_paragraphs(docs, delim="\n")
            .orderBy("doc_id")
            .toPandas()
        )
        assert got["n_paras"].tolist() == [2, 2, 1]
        assert got["n_kept"].tolist() == [2, 1, 0]
        assert got["text_kept"].tolist() == [
            "alpha beta\ngamma delta",
            "epsilon zeta",
            "",
        ]

    def test_within_doc_repeat_keeps_first(self, spark):
        docs = self._docs(spark, ["same para\nsame para\nother one"])
        got = CU.dedup_paragraphs(docs, delim="\n").toPandas()
        assert got["n_kept"][0] == 2
        assert got["text_kept"][0] == "same para\nother one"

    def test_empty_doc(self, spark):
        docs = self._docs(spark, ["", "real text"])
        got = CU.dedup_paragraphs(docs, delim="\n").orderBy("doc_id").toPandas()
        assert got["n_paras"].tolist() == [0, 1]
        assert got["text_kept"].tolist() == ["", "real text"]


class TestSemDedup:
    def test_near_duplicates_drop_keep_lowest_id(self, spark):
        import pandas as pd
        from osm_merge_spark.operators import dedup as D

        dim = 8
        base = [1.0] + [0.0] * (dim - 1)
        near = [0.999] + [0.04] + [0.0] * (dim - 2)   # cosine ~0.9992 to base
        ortho = [0.0, 0.0, 1.0] + [0.0] * (dim - 3)
        df = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": [1, 2, 3], "embedding": [base, near, ortho]}
            )
        )
        got = D.semdedup(df, dim=dim, threshold=0.95, n_cells=4).orderBy("vec_id").toPandas()
        by_id = {int(r.vec_id): r for r in got.itertuples()}
        # 1 and 2 share a cell and cosine > .95: the higher id drops
        assert not by_id[1].dropped
        assert by_id[2].dropped and by_id[2].near_id == 1
        assert by_id[2].max_sim > 0.95
        # the orthogonal vector survives regardless of cell
        assert not by_id[3].dropped

    def test_different_cells_never_compared(self, spark):
        import pandas as pd
        from osm_merge_spark.operators import dedup as D

        dim = 4
        # identical vectors -> same cell, cosine 1.0 -> id 20 drops
        df = spark.createDataFrame(
            pd.DataFrame({"vec_id": [10, 20], "embedding": [[1.0, 0, 0, 0]] * 2})
        )
        got = D.semdedup(df, dim=dim, threshold=0.99, n_cells=2).orderBy("vec_id").toPandas()
        assert got["dropped"].tolist() == [False, True]
        assert got["near_id"].tolist()[1] == 10
