"""Hypertable-style continuous aggregates + temporal range join.

Timescale's hypertable pattern on Spark: the raw event stream materializes
a FINE-grain rollup once (minute level), and every coarser grain (hour,
day) re-aggregates the fine rollup instead of rescanning raw data — valid
because count and sum are commutative monoids (re-aggregation property).
At 100 TB the fine rollup is 3-6 orders of magnitude smaller than raw, so
dashboards and coarse analytics never touch the raw table;
``tests/test_operators.py`` + the ``q_hypertable_rollup`` oracle pin that
the two-level path equals the direct aggregation exactly (sums accumulate
in DECIMAL so the result is order-independent and bitwise reproducible —
a float sum would drift with partitioning).

The temporal range join manufactures an equi-key from time exactly the way
the conflation join manufactures one from space (grid cells): intervals
explode to the fixed-width epoch buckets they overlap, events carry their
single bucket, and the bucket equi-join + an exact refine predicate
replaces the unbounded theta join — never all-pairs, skew bounded by
bucket width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


def rollup_time(
    df: DataFrame,
    grain: str,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """One rollup level: (epoch-truncated window, keys) → count + exact
    DECIMAL sum.  ``grain`` ∈ minute|hour|day (date_trunc units)."""
    return (
        df.groupBy(
            F.unix_timestamp(F.date_trunc(grain, F.col(ts_col))).alias("ws"),
            *[F.col(k) for k in keys],
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast(DEC)).alias("total_value"),
        )
    )


def reaggregate(
    fine: DataFrame,
    grain_s: int,
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Coarser level FROM the fine rollup (never from raw): counts and
    DECIMAL sums re-sum exactly.  The coarse window is pure integer
    arithmetic on the fine epoch (``ws - ws % grain_s``) — engine-neutral,
    no timestamp round-trip."""
    return (
        fine.groupBy(
            (F.col("ws") - F.pmod(F.col("ws"), F.lit(grain_s))).alias("ws"),
            *[F.col(k) for k in keys],
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").cast(DEC).alias("total_value"),
        )
    )


def range_join_temporal(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_epoch",
    end_col: str = "end_epoch",
    bucket_s: int = 3600,
) -> DataFrame:
    """Join events to the intervals containing them (start ≤ ts < end)
    via epoch-bucket equi-join + exact refine.

    Each interval explodes to ``ceil(len/bucket_s)+1`` bucket rows; each
    event carries exactly one bucket, so no dedup is needed.  Bucket width
    trades replication (long intervals → many buckets) against bucket
    population (short width → fewer events per bucket); size it near the
    median interval length, as the conflation grid sizes cells near the
    distance threshold."""
    ev = events.withColumn("__epoch", F.unix_timestamp(F.col(ts_col))).withColumn(
        "__bucket", F.floor(F.col("__epoch") / bucket_s)
    )
    # half-open [start, end): an interval with end <= start contains no
    # events, and feeding it to sequence() would generate a DESCENDING
    # bucket list (Spark's default step is -1 when start > stop) — for a
    # badly inverted interval that is thousands of spurious replica rows
    # the refine filter then discards.  Drop them exactly instead.
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_s),
                F.floor((F.col(end_col) - 1) / bucket_s),
            )
        ),
    )
    return (
        ev.join(iv, "__bucket")
        .filter((F.col("__epoch") >= F.col(start_col)) & (F.col("__epoch") < F.col(end_col)))
        .drop("__bucket", "__epoch")
    )


def moving_agg(
    df: DataFrame,
    part_col: str,
    order_cols: list[str],
    value_c_col: str,
    n: int = 7,
) -> DataFrame:
    """Trailing n-row moving sum/count over an EXACT integer measure
    column (``value_c_col`` — the caller pre-scales floats into bigint
    units, e.g. cents, so the windowed sum is order-independent and
    engine-exact; the float average is derived by ONE division at the
    end, never accumulated).

    One window shuffle on ``part_col``; the frame is ROWS BETWEEN n-1
    PRECEDING AND CURRENT ROW — bounded state per row, the 100 TB shape
    (a RANGE frame over a skewed key would be the trap)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(*order_cols)
        .rowsBetween(-(n - 1), 0)
    )
    return df.withColumn("mov_sum_c", F.sum(value_c_col).over(w).cast("bigint")).withColumn(
        "mov_n", F.count("*").over(w).cast("bigint")
    )
