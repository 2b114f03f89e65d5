"""Ordered-funnel analysis over event streams.

The product-analytics staple: of the users who did step 1, how many went
on to do step 2 AFTER it, then step 3 after that — strictly ordered
timestamps, one row per user with per-step first-completion times.

Spark shape: one map-side-combined min-aggregate per step — step k is
``min(ts) WHERE type = step_k AND ts > t_{k-1}`` — expressed as a chain of
groupBy-min passes joined back on the user key.  Every pass shuffles on
user_id with partial aggregation, and AQE coalesces the small outputs;
nothing is windowed over the full event history, so the state per user is
one timestamp per step regardless of event volume (the 100 TB property —
a sessionization-style window over all events per user would sort the
whole table instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user strict-order funnel: returns one row per user who
    completed step 1, with ``t1..tn`` (epoch-second bigints; NULL once the
    funnel breaks) and ``steps_completed``.

    Each step joins the events of that type against the per-user previous
    step time and takes the min of the qualifying timestamps — first-touch
    attribution, strictly increasing (``ts > t_prev``, so a simultaneous
    event does not count as progression)."""
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    ts_sec = F.unix_timestamp(F.col(ts_col)).cast("bigint")
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("event_type"),
        ts_sec.alias("ts_s"),
    )
    out = (
        ev.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("event_type") == step)
            .join(out.select("user_id", F.col(f"t{i - 1}").alias("t_prev")), "user_id")
            .filter(F.col("ts_s") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts_s").alias(f"t{i}"))
        )
        out = out.join(nxt, "user_id", "left")
    completed = F.lit(1)
    for i in range(2, len(steps) + 1):
        completed = completed + F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
    return out.withColumn("steps_completed", completed.cast("int"))


def sessionize_batch(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """Gap-based batch sessionization (the batch twin of the streaming
    applyInPandasWithState sessionizer): a new session starts when the
    gap to the previous event of the same user exceeds ``gap_s``.

    Classic two-window composition, ONE shuffle on user_id reused by both
    windows (same partition key): lag → new-session flag → running sum =
    session ordinal; then a groupBy rolls sessions up to
    (user_id, session_idx, start_s, end_s, n_events).  All epoch-second
    bigint arithmetic — exact."""
    from pyspark.sql.window import Window

    ts_s = F.unix_timestamp(F.col(ts_col)).cast("bigint")
    w = Window.partitionBy(user_col).orderBy("ts_s", "ts_tie")
    # tie-break by the caller's unique event id — NEVER a synthetic
    # monotonically_increasing_id, which depends on the physical partition
    # layout and would make the window order nondeterministic
    ev = events.select(
        F.col(user_col).alias("user_id"),
        ts_s.alias("ts_s"),
        F.col(tie_col).alias("ts_tie"),
    )
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("ts_s").over(w).isNull()
            | (F.col("ts_s") - F.lag("ts_s").over(w) > gap_s),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_idx", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts_s").alias("start_s"),
            F.max("ts_s").alias("end_s"),
            F.count("*").cast("bigint").alias("n_events"),
        )
    )
