"""Bitmap-index segments over integer member ids — the roaring-bitmap
architecture reduced to its Spark-expressible core.

A segment bitmap index stores, per (key, block), one word (``BITS`` low
bits of a bigint) whose set bits mark the members ``block*bits + bit``
belonging to the key.  Set
algebra (who did A AND B / A OR B / A MINUS B) becomes per-block bitwise
ops + popcount — no distinct, no row-level set materialization.  This is
how OLAP engines (Druid, Pinot, ClickHouse's roaring sets) execute
segment filters, and how audience-intersection queries stay sub-linear in
the member count.

100 TB posture: the build is ONE groupBy over (key, block) with
``bit_or`` partial aggregation (map-side combine collapses each
partition's members into words before the shuffle — the wire carries at
most |keys|·|blocks| words per partition, independent of row count).
Set ops join on the block id — an equi-join between two already-tiny
word tables."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BITS = 32  # members per block word; 32 keeps every shift far from the
# int64 sign bit so Spark and any ANSI engine agree without unsigned tricks


def bitmap_build(
    df: DataFrame, key_col: str, member_col: str, bits: int = BITS
) -> DataFrame:
    """(key, block, bm): one word per (key, member-block), bm's set bits
    are the members present.  Duplicate memberships collapse for free
    (bit_or is idempotent).

    ``member_col`` must be NONNEGATIVE: ``div`` truncates toward zero
    while ``pmod`` is always positive, so a negative member id (-1) would
    silently collide with a positive one (31) in block 0 rather than
    error.  The engine's member ids (vec_id/order ids) satisfy this."""
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.expr(f"{member_col} div {bits}").alias("block"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({member_col}, {bits}) AS INT))"
            ).alias("w"),
        )
        .groupBy("key", "block")
        .agg(F.bit_or("w").alias("bm"))
    )


def bitmap_and_count(index: DataFrame, key_a, key_b) -> DataFrame:
    """|members(key_a) ∩ members(key_b)| via per-block AND + popcount —
    the audience-intersection query.  Returns one row (n_both bigint)."""
    a = index.filter(F.col("key") == key_a).select("block", F.col("bm").alias("bma"))
    b = index.filter(F.col("key") == key_b).select("block", F.col("bm").alias("bmb"))
    return (
        a.join(b, "block")
        .select(F.bit_count(F.col("bma").bitwiseAND(F.col("bmb"))).alias("pc"))
        .agg(F.coalesce(F.sum("pc"), F.lit(0)).cast("bigint").alias("n_both"))
    )


def bitmap_pair_counts(index: DataFrame) -> DataFrame:
    """All-pairs intersection cardinalities (key_a < key_b): self-join on
    block, AND + popcount, one groupBy.  For k keys this is k²/2 pairs of
    word-tables — the whole point is that the joined relation is words,
    not members."""
    a = index.select(F.col("key").alias("key_a"), "block", F.col("bm").alias("bma"))
    b = index.select(F.col("key").alias("key_b"), "block", F.col("bm").alias("bmb"))
    return (
        a.join(b, "block")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(
            F.sum(F.bit_count(F.col("bma").bitwiseAND(F.col("bmb"))))
            .cast("bigint")
            .alias("n_both")
        )
    )
