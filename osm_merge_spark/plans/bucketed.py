"""Bucketed table layout: shuffle-free cell equi-joins from on-disk layout.

At 100 TB the conflation join's dominant cost is shuffling both sides by the
cell key on EVERY run.  A deployment that owns its table layout pays that
shuffle once, at write time: both sides are written bucketed (and sorted)
by the cell column — Iceberg's ``bucket(N, cell)`` partition transform, or
Spark's ``bucketBy`` on a catalog table — and every subsequent cell
equi-join reads co-located buckets with NO Exchange on either side (Spark
plans a SortMergeJoin straight over the bucketed scans when both bucket
counts match the join key).  Reruns, incremental conflation against a
changed secondary, and multi-query sessions all amortize the one-time
shuffle; ``tests/test_plan_quality.py`` pins the exchange-free plan.

Reference analog: the reference re-sorts its SQLite/PostGIS tables by tile
id once and reuses the index across queries (`osm_merge/fieldwork/
basemapper.py` tile store; `utilities/conflation.py` per-boundary DB);
bucketing is the distributed expression of the same precompute-the-layout
idea.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "cell",
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Materialize ``df`` as a catalog table bucketed + sorted by
    ``bucket_col``.

    ``n_buckets`` is the deployment's parallelism anchor: at cluster scale
    pick O(total shuffle partitions) so one bucket ≈ one task.  On Iceberg
    the equivalent DDL is ``PARTITIONED BY (bucket(N, cell))`` — the writer
    here uses the session catalog so the local tests and a warehouse-backed
    cluster run the same code path.
    """
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:  # external table (tests keep files out of the cwd)
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str = "cell",
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket column.

    When both tables were written with :func:`write_bucketed` (same
    ``n_buckets``, same ``bucket_col`` = join key), Catalyst plans this with
    zero Exchange operators — the join is executed bucket-by-bucket where
    the data already lives.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the plan contains a SHUFFLE Exchange (``Exchange
    hashpartitioning/rangepartitioning/...``) — the plan-quality predicate
    the bucketing pin asserts against.  BroadcastExchange does not count:
    it moves a dim table, not the fact table."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return bool(re.search(r"(?<!Broadcast)Exchange ", plan))
