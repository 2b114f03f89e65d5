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


def exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: list[float],
) -> DataFrame:
    """Exact per-group quantiles (percentile_disc semantics: the value at
    rank ``ceil(p·n)`` in sort order) for every p in ``ps``.

    Plan: one window pass per group (row_number + count over the group
    key — a single shuffle on ``group_col``), cross-joined against the
    tiny literal p-list (broadcast, |ps| rows) and filtered to the target
    ranks.  Scale posture: exact quantiles need a per-group sort, which
    the group-key window gives for free when groups are many and modest;
    for ONE giant group the scale path is ``F.percentile_approx`` (KLL-ish
    sketch, mergeable map-side) — this operator is the exact twin whose
    results an oracle can re-derive bit-for-bit.
    """
    spark = df.sparkSession
    ps_df = spark.createDataFrame([(float(p),) for p in ps], "p double")
    w = Window.partitionBy(group_col).orderBy(value_col)
    ranked = df.select(group_col, value_col).withColumn(
        "rn", F.row_number().over(w)
    ).withColumn("n", F.count("*").over(Window.partitionBy(group_col)))
    return (
        ranked.join(F.broadcast(ps_df))
        # clamp the target rank to >= 1 so p=0.0 returns the group min
        # (percentile_disc(0) semantics) instead of matching no row
        .filter(
            F.col("rn")
            == F.greatest(F.ceil(F.col("p") * F.col("n")).cast("bigint"), F.lit(1))
        )
        .select(group_col, "p", F.col(value_col).alias("q"))
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — frequency estimation
# with d×w integer counters.  Deterministic row hashes (affine maps over
# the engine-wide 2^31-1 field) make every counter, and therefore every
# estimate, oracle-reproducible — unlike opaque library sketches.
#
# 100 TB posture: the BUILD is a map-side-combined groupBy over (row,
# bucket) — the shuffled state is at most d·w counters per partition
# regardless of input size, and sketches merge by counter addition.  The
# ESTIMATE for a batch of items is an equi-join against the d·w-row
# sketch (broadcast — it is tiny by construction) + a min over the d rows.
# CMS never underestimates: est >= true count, with overestimate bounded
# by (N/w) per row whp.
# ---------------------------------------------------------------------------


def cms_bucket(key_hash: Column, row: int, w: int) -> Column:
    """Bucket of pre-hashed key in sketch row ``row``: an affine map over
    the 2^31-1 field then mod w (distinct odd multipliers per row)."""
    a = 2 * row + 31
    b = row * 97 + 7
    return F.pmod(key_hash * F.lit(a) + F.lit(b), F.lit(HASH_MOD)) % F.lit(w)


def count_min_build(
    df: DataFrame, key_hash_col: str, w: int = 256, d: int = 3
) -> DataFrame:
    """Build the d×w sketch: (row, bucket, cnt) — one groupBy, counters
    combine map-side."""
    rows = None
    for r in range(d):
        part = df.select(
            F.lit(r).alias("cms_row"),
            cms_bucket(F.col(key_hash_col), r, w).alias("cms_bucket"),
        )
        rows = part if rows is None else rows.union(part)
    return rows.groupBy("cms_row", "cms_bucket").agg(F.count("*").alias("cnt"))


def count_min_estimate(
    sketch: DataFrame, items: DataFrame, key_hash_col: str, w: int = 256, d: int = 3
) -> DataFrame:
    """Point-query the sketch for each item: explode the d (row, bucket)
    probes, broadcast-join the sketch, min over rows.  Missing buckets
    count 0 (never happens for items that were inserted)."""
    probes = items.withColumn(
        "cms_probe",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("cms_row"),
                        cms_bucket(F.col(key_hash_col), r, w).alias("cms_bucket"),
                    )
                    for r in range(d)
                ]
            )
        ),
    ).select(*items.columns, "cms_probe.cms_row", "cms_probe.cms_bucket")
    joined = probes.join(F.broadcast(sketch), ["cms_row", "cms_bucket"], "left")
    return (
        joined.groupBy(*items.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
