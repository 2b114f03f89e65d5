"""KMV (k-minimum-values) distinct-count sketch — deterministic, mergeable.

The sketch behind approx_count_distinct-style estimators, in a form whose
every bit is reproducible in ANSI SQL (Spark's own HLL++ has opaque
internal state no oracle can re-derive): hash each value with a fixed
multiplicative hash into [0, M), keep the k smallest DISTINCT hashes per
group; the estimate is ``(k-1) · M / h_k`` (the classic KMV estimator,
Bar-Yossef et al. 2002).  Groups with fewer than k distinct values report
their exact count.

Why it matters at 100 TB: the per-group state is k integers regardless of
cardinality, and two sketches MERGE by unioning their hash sets and
re-taking the k smallest — so per-partition sketches combine map-side and
distinct-counts stream through one tiny shuffle, where an exact distinct
needs the full key set to cross the wire.  Relative error ~ 1/sqrt(k-2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_MOD = 2147483647  # 2^31 - 1 (the engine-wide poly-hash modulus)
KNUTH = 2654435761  # multiplicative hash constant


def kmv_hash(col: Column) -> Column:
    """Deterministic hash of a bigint id into [0, HASH_MOD)."""
    return F.pmod(col.cast("bigint") * F.lit(KNUTH), F.lit(HASH_MOD))


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``id_col``.

    Plan: dedup (group, hash) — one partial-agg shuffle on the pair key —
    then a per-group rank window takes h_k.  Output: group, n_kept (min(k,
    distinct)), kmv_estimate (double; exact when the group has < k distinct
    values).
    """
    hashed = df.select(
        F.col(group_col), kmv_hash(F.col(id_col)).alias("h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    ranked = hashed.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    agg = ranked.groupBy(group_col).agg(
        F.count("*").alias("n_kept"), F.max("h").alias("h_k")
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(HASH_MOD)) / F.col("h_k").cast("double")
    )
    return agg.select(group_col, "n_kept", est.alias("kmv_estimate"))
