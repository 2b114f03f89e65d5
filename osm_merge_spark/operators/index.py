"""Inverted-index construction — the IR/retrieval side of a corpus engine.

``inverted_index`` turns a document table into posting lists: one row per
token with the sorted list of containing doc ids and the document
frequency.  This is the batch-build shape every sharded search index
(Lucene segment build, sparse-retrieval preprocessing for training-data
attribution) runs over a corpus.

Scale posture: explode → distinct (doc, token) → groupBy token is two
shuffles, both map-side-combinable; posting lists are materialized with
``sort_array(collect_list(...))`` so the list order is deterministic (a
bare collect_list order depends on task schedule).  Hot tokens (stopword
df ~ corpus size) are the classic skew key — the ``min_df``/``max_df``
band drops them (the same reason search engines stopword their postings),
and a production build would additionally range-partition by token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """(token, df, postings) — postings sorted ascending, df = list length.

    ``min_df``/``max_df`` bound the posting-list size: tokens outside the
    band never materialize their lists (the filter runs on the counted
    aggregate BEFORE collect_list, so stopword-scale lists are never
    built)."""
    pairs = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(TX.tokens(F.col(text_col))).alias("token"))
        .distinct()
    )
    counted = pairs.groupBy("token").agg(F.count("*").alias("df"))
    if max_df is not None:
        counted = counted.filter(F.col("df") <= max_df)
    counted = counted.filter(F.col("df") >= min_df)
    return (
        pairs.join(counted, "token")
        .groupBy("token", "df")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("postings"))
        .select("token", F.col("df").cast("bigint").alias("df"), "postings")
    )


def merge_pair_counts(
    docs: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """Most frequent ADJACENT token pairs — the counting pass of one BPE
    merge round (token-inventory induction runs this repeatedly, merging
    the winner).  Explode the zipped (tok_i, tok_i+1) stream, one
    map-side-combined count, global top-n via orderBy+limit
    (TakeOrderedAndProject — no full sort)."""
    toks = TX.tokens(F.col(text_col))
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(top_n)
        .select("pair", F.col("cnt").cast("bigint").alias("cnt"))
    )
