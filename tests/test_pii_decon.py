"""Unit tests for the PII scrub (functions/pii.py) and benchmark
decontamination (operators/curation.py:decontaminate) against small
in-memory oracles."""

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from osm_merge_spark.functions import pii as PII
from osm_merge_spark.functions import text as TX
from osm_merge_spark.operators import curation as CU


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    )


PII_SAMPLES = [
    # (text, expected counts by kind, expected redacted)
    (
        "mail me at jo.doe+x@sub.example.org today",
        {"email": 1, "ipv4": 0, "phone": 0, "id_number": 0},
        "mail me at <EMAIL> today",
    ),
    (
        "server 192.168.001.1 and 10.0.0.255 up",
        {"email": 0, "ipv4": 2, "phone": 0, "id_number": 0},
        "server <IPV4> and <IPV4> up",
    ),
    (
        "call 415-555-0042 or 415.555.9999 now",
        {"email": 0, "ipv4": 0, "phone": 2, "id_number": 0},
        "call <PHONE> or <PHONE> now",
    ),
    (
        "ssn 078-05-1120 on file",
        {"email": 0, "ipv4": 0, "phone": 0, "id_number": 1},
        "ssn <ID_NUMBER> on file",
    ),
    # email wins over the numeric patterns inside its local part
    (
        "reach 078-05-1120@example.com ok",
        {"email": 1, "ipv4": 0, "phone": 0, "id_number": 1},
        "reach <EMAIL> ok",
    ),
    ("plain prose with no identifiers at all", {"email": 0, "ipv4": 0, "phone": 0, "id_number": 0}, "plain prose with no identifiers at all"),
    ("", {"email": 0, "ipv4": 0, "phone": 0, "id_number": 0}, ""),
]


def test_pii_counts_and_redact_truth_table(spark):
    texts = [t for t, _, _ in PII_SAMPLES]
    d = _docs(spark, texts)
    counts = PII.pii_counts(F.col("text"))
    got = (
        d.select(
            "doc_id",
            *[c.alias(f"n_{k}") for k, c in counts.items()],
            PII.pii_redact(F.col("text")).alias("red"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    for i, (_, exp_counts, exp_red) in enumerate(PII_SAMPLES):
        for k, v in exp_counts.items():
            assert got[f"n_{k}"][i] == v, (i, k)
        assert got["red"][i] == exp_red, i


def test_pii_patterns_are_re2_safe():
    """The DuckDB twin runs on RE2: no backreferences or lookaround may
    appear (they'd parse in Java but not RE2)."""
    for pat in PII_PATTERNS_VALUES():
        assert "(?=" not in pat and "(?!" not in pat and "\\1" not in pat
        re.compile(pat)  # and it is a valid Python/Java-style pattern


def PII_PATTERNS_VALUES():
    return list(PII.PII_PATTERNS.values())


def test_token_shingle_hashes_short_and_exact(spark):
    d = _docs(spark, ["a b c d e", "a b c", "", "x"])
    got = (
        d.select("doc_id", TX.token_shingle_hashes(F.col("text"), 4).alias("sh"))
        .orderBy("doc_id")
        .toPandas()
    )
    assert len(got["sh"][0]) == 2  # "a b c d", "b c d e"
    assert len(got["sh"][1]) == 0  # shorter than n
    assert len(got["sh"][2]) == 0
    assert len(got["sh"][3]) == 0


def test_decontaminate_flags_only_overlapping_docs(spark):
    bench = _docs(spark, ["the quick brown fox jumps over the lazy dog"])
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 11, 12],
                "text": [
                    "we saw the quick brown fox yesterday",  # shares "the quick brown fox"
                    "entirely different words here today friend",  # clean
                    "short doc",  # < n tokens -> no shingles, clean
                ],
            }
        )
    )
    got = CU.decontaminate(corpus, bench, n=4).orderBy("doc_id").toPandas()
    assert got["contaminated"].tolist() == [True, False, False]
    assert got["n_contaminated"].tolist()[0] >= 1
    assert got["n_shingles"].tolist() == [4, 3, 0]


def test_decontaminate_self_overlap_counts_distinct_shingles(spark):
    # a doc repeating one shingle counts it once (distinct semantics)
    bench = _docs(spark, ["p q r s"])
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["p q r s p q r s p q r s"]})
    )
    got = CU.decontaminate(corpus, bench, n=4).toPandas()
    assert got["n_contaminated"][0] == 1
    assert bool(got["contaminated"][0])


def test_hashed_linear_scorer_bounds_and_empty(spark):
    d = _docs(spark, ["some words here", "", "a a a a"])
    got = (
        d.select(
            "doc_id",
            TX.hashed_linear_logit(F.col("text")).alias("z"),
            TX.hashed_linear_prob(F.col("text")).alias("p"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    # logit is a mean of weights in [-1, 1]
    assert (got["z"].abs() <= 1.0).all()
    assert ((got["p"] > 0) & (got["p"] < 1)).all()
    # empty doc: logit 0 -> prob exactly 0.5
    assert got["z"][1] == 0.0 and got["p"][1] == 0.5


def test_hashed_linear_scorer_repeated_token_mean(spark):
    d = _docs(spark, ["spark", "spark spark spark"])
    got = (
        d.select(TX.hashed_linear_logit(F.col("text")).alias("z"))
        .toPandas()
    )
    assert abs(got["z"][0] - got["z"][1]) < 1e-12
