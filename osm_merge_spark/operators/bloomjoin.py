"""Bloom-prefiltered semi-join — shuffle-free pruning of the big side.

The reference's conflation keeps "features that match something on the
other side" by brute-force scanning (``osm-merge.py`` candidate loops); the
Spark-native exact twin is a shuffle semi-join.  At 100 TB the shuffle of
the BIG side is the cost, and most of its rows don't survive the join — so
this operator builds a Bloom bitmap of the small side's keys (one tiny
aggregation), ships it to every task as a literal (broadcast-equivalent,
~KB), prunes the big side with pure JVM bit tests BEFORE any shuffle, and
only then runs the exact semi-join on the survivors to strike the Bloom
false positives.  The result is bit-identical to the plain semi-join; the
shuffle moves only rows that probably match.

This is the same runtime-filter idea Spark 3.3+'s
``spark.sql.optimizer.runtime.bloomFilter.enabled`` applies inside the
optimizer; building it from first principles keeps the pruning explicit,
tunable (m_bits, n_hashes), and available on join shapes the optimizer
won't rewrite (e.g. after a UDF boundary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 64


def _positions(key: Column, m_bits: int, n_hashes: int) -> list[Column]:
    """n_hashes deterministic bit positions in [0, m_bits) for a key —
    xxhash64 re-seeded by hash index (JVM-side, codegen-able)."""
    return [
        F.pmod(F.xxhash64(F.lit(j), key), F.lit(m_bits)) for j in range(n_hashes)
    ]


def bloom_bitmap(
    df: DataFrame, key_col: str, m_bits: int = 4096, n_hashes: int = 3
) -> list[int]:
    """Aggregate the Bloom bitmap of ``df[key_col]`` and return it as
    ``m_bits / 64`` Python ints (driver-side METADATA, like the range
    boundaries in plans/distribute.py — a 4096-bit filter is 64 longs).

    Plan: explode each key to its n_hashes positions, one partial-agg
    ``bit_or`` shuffle on the 64-word bucket index (≤ m_bits/64 groups).
    """
    if m_bits % WORD_BITS:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, n_hashes))).alias(
        "pos"
    )
    words = (
        df.select(pos)
        .select(
            (F.col("pos") / WORD_BITS).cast("int").alias("bucket"),
            # shift-by-column needs the SQL form (the python wrapper only
            # takes a literal shift)
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))"
            ).alias("bit"),
        )
        .groupBy("bucket")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    out = [0] * (m_bits // WORD_BITS)
    for r in words:
        out[r["bucket"]] = r["word"]
    return out


def bloom_might_contain(
    key: Column, words: list[int], m_bits: int, n_hashes: int = 3
) -> Column:
    """Membership test against a literal bitmap: AND over n_hashes bit
    probes, each an element_at + shift + mask — whole-stage-codegen JVM
    math, evaluated before any exchange."""
    arr = F.array(*[F.lit(int(w)).cast("bigint") for w in words])
    cond = F.lit(True)
    for p in _positions(key, m_bits, n_hashes):
        word = F.element_at(arr, (p / WORD_BITS).cast("int") + 1)
        cond = cond & (
            F.bit_get(word, F.pmod(p, F.lit(WORD_BITS)).cast("int")) == 1
        )
    return cond


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    m_bits: int = 4096,
    n_hashes: int = 3,
) -> DataFrame:
    """EXACT semi-join of ``big`` against ``small``'s keys, Bloom-pruned.

    1. one small-side aggregation builds the bitmap (driver metadata);
    2. ``big`` is filtered by the literal bitmap — no shuffle, false
       positives only;
    3. a broadcast ``left_semi`` join against the distinct small keys
       removes the false positives, so the output equals the plain
       semi-join bit-for-bit (the oracle's ``WHERE key IN (...)``).
    """
    small_key = small_key or big_key
    words = bloom_bitmap(small, small_key, m_bits, n_hashes)
    pruned = big.filter(
        bloom_might_contain(F.col(big_key), words, m_bits, n_hashes)
    )
    keys = small.select(F.col(small_key).alias(big_key)).distinct()
    return pruned.join(F.broadcast(keys), big_key, "left_semi")
