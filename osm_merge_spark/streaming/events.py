"""Structured-streaming ingest of the events feed.

The reference has no streaming (SURVEY.md §2.9) — its closest analog is
chunked incremental file processing (`osm_merge/readjson.py:52-241`).  This
module provides the engine's incremental-ingest surface as Structured
Streaming: parquet-directory source → watermarked windowed aggregation →
``foreachBatch`` parquet sink, runnable with ``availableNow`` for
batch-equivalent tests and continuously on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def windowed_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Late-data-tolerant windowed aggregation per event type."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_available_now(
    spark: SparkSession, src_path: str, out_path: str, checkpoint_path: str
) -> None:
    """Drain everything currently in src_path exactly once (checkpointed —
    a rerun with the same checkpoint ingests nothing new)."""
    stream = read_events_stream(spark, src_path)
    agg = windowed_counts(stream)
    q = (
        agg.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(lambda df, _id: df.write.mode("append").parquet(out_path))
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming deduplication: keep the first row seen per key, with
    per-key state expired past the event-time watermark
    (``dropDuplicatesWithinWatermark`` — state is bounded by the watermark
    horizon instead of growing forever like plain ``dropDuplicates`` on an
    unbounded stream, which is what makes this runnable continuously on a
    cluster).

    Which representative ROW survives depends on arrival order, so exact-
    match consumers should project to the key columns (the distinct key
    SET is deterministic); the engine keeps the full row for pipelines
    that don't need determinism.
    """
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def interval_join_streams(
    purchases: DataFrame,
    clicks: DataFrame,
    gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: every purchase paired with
    the same user's clicks inside ``[p.ts - gap, p.ts]`` (both bounds
    inclusive).

    Both sides carry a watermark and the join condition bounds event time
    in both directions, so Spark can size the join state and expire rows —
    the state-bounded shape a continuous deployment needs (an unbounded
    stream-stream join would accumulate forever).  With ``availableNow``
    the drained result equals the batch interval join, which is what the
    oracle compares against."""
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return p.join(
        c,
        F.expr(
            f"user_id = c_user AND c_ts >= p_ts - interval {gap} AND c_ts <= p_ts"
        ),
        "inner",
    ).select("p_id", "user_id", "p_ts", "click_id", "c_ts")
