"""Z-order (Morton) spatial data layout — locality-preserving keys for
range-partitioned storage and pruning.

The reference's tiling layer (``tm-splitter``, reference
``tm-splitter/tm-splitter.py``) lays features out by XYZ tile so per-tile
extracts read one file; this module is the columnar-table twin of that
idea: quantize (lon, lat) to a 2^bits grid, interleave the bits into one
bigint Morton key, and ``repartitionByRange`` on it so rows that are close
on the map land in the same parquet files.  A bbox scan then prunes to the
O(1) Morton ranges covering the box instead of the whole table — the same
trick Delta/Iceberg Z-ORDER clustering uses, built here from plain Column
bit math (JVM-side, whole-stage-codegen; no UDF).

Why it matters at 100 TB: spatial joins and bbox filters are the engine's
hot path, and min/max file statistics only prune when the layout is
spatially clustered.  A z-ordered table turns "scan the planet" into "scan
the ~k files whose zkey range intersects the query box".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a coordinate in [lo, hi] to an integer cell in [0, 2^bits)."""
    n = 1 << bits
    cell = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(n)).cast("bigint")
    return F.least(F.greatest(cell, F.lit(0)), F.lit(n - 1))


def zorder_key(lon: Column, lat: Column, bits: int = 16) -> Column:
    """Morton key of a WGS84 point: ``bits`` bits per axis interleaved
    (lon bits at odd positions, lat at even), a bigint in [0, 4^bits).

    Pure Column bit math — ``2·bits`` shift/mask/or terms that codegen into
    one JVM expression; no UDF, no shuffle.
    """
    qx = _quantize(lon, -180.0, 180.0, bits)
    qy = _quantize(lat, -90.0, 90.0, bits)
    key: Column = F.lit(0).cast("bigint")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(F.shiftleft(F.shiftright(qy, i).bitwiseAND(F.lit(1)), 2 * i))
    return key


def zorder_key_sql(lon_expr: str, lat_expr: str, bits: int = 16) -> str:
    """ANSI-SQL twin of :func:`zorder_key` (DuckDB-runnable), generated with
    the same quantization and interleave so oracles can check the key
    bit-for-bit."""
    n = 1 << bits
    qx = (
        f"least(greatest(CAST(floor(({lon_expr} + 180.0) / 360.0 * {n}) "
        f"AS BIGINT), 0), {n - 1})"
    )
    qy = (
        f"least(greatest(CAST(floor(({lat_expr} + 90.0) / 180.0 * {n}) "
        f"AS BIGINT), 0), {n - 1})"
    )
    terms = []
    for i in range(bits):
        terms.append(f"((({qx} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({qy} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


def zorder_layout(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    n_partitions: int = 32,
    bits: int = 16,
) -> DataFrame:
    """Attach ``zkey`` and range-partition the frame on it: one range
    shuffle (sampled boundaries, Spark's RangePartitioner) after which every
    output partition holds one contiguous Morton interval — write this and
    parquet min/max stats prune bbox scans to the touched files."""
    keyed = df.withColumn("zkey", zorder_key(F.col(lon_col), F.col(lat_col), bits))
    return keyed.repartitionByRange(n_partitions, "zkey")


def zorder_buckets(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    n_buckets: int = 16,
    bits: int = 16,
) -> DataFrame:
    """Locality audit: equal-width zkey buckets over the OBSERVED key range
    with their row count and geographic extent.  Clustered layout ⇒ each
    bucket's bbox is small relative to the data extent; this is the
    measurable claim behind the layout.  The range normalization is one
    2-value global agg broadcast back (same driver-metadata class as the
    range boundaries in plans/distribute.py); the bucket itself is pure
    column math — no global window."""
    keyed = df.withColumn("zkey", zorder_key(F.col(lon_col), F.col(lat_col), bits))
    stats = keyed.agg(
        F.min("zkey").alias("z_lo"), (F.max("zkey") + 1).alias("z_hi")
    )
    keyed = keyed.join(F.broadcast(stats))
    b = F.least(
        F.floor(
            (F.col("zkey") - F.col("z_lo")) * n_buckets / (F.col("z_hi") - F.col("z_lo"))
        ).cast("bigint"),
        F.lit(n_buckets - 1),
    )
    return (
        keyed.groupBy(b.alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min(lon_col).alias("min_lon"),
            F.max(lon_col).alias("max_lon"),
            F.min(lat_col).alias("min_lat"),
            F.max(lat_col).alias("max_lat"),
        )
        .orderBy("bucket")
    )
