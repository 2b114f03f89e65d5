"""Document-table entry point: catalog table (Iceberg et al.) or path.

The north-rule input is an Iceberg table of interleaved text+media documents
``(doc_id string, spans array<struct<kind,text,media_ref,offset:int>>)``.
On a cluster an Iceberg catalog serves that table through the session
catalog (``spark.table("cat.db.docs")``) with snapshot isolation, hidden
partitioning, and data-file pruning — all invisible to this engine, which
only ever sees the DataFrame.  This module is the single seam: every
pipeline takes ``read_documents(spark, source)`` and the source can be a
catalog table name, a parquet directory/file, or an already-staged path —
so the local test environment (plain parquet, no Iceberg jar is shipped in
this container) and the cluster (catalog table) run identical code above
this line.

Time travel (``snapshot_id`` / ``as_of``) is passed through as DataFrame
reader options exactly as Iceberg's Spark runtime consumes them
(`option("snapshot-id", ...)` / `option("as-of-timestamp", ...)` — public
Iceberg docs); on a non-Iceberg source they are rejected loudly rather than
silently ignored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)


def is_catalog_table(spark: SparkSession, source: str) -> bool:
    """True if ``source`` resolves in the session catalog (Iceberg/hive/
    temp view) rather than on the filesystem."""
    if "/" in source or source.endswith(".parquet"):
        return False
    try:
        return spark.catalog.tableExists(source)
    except Exception:
        return False


def read_documents(
    spark: SparkSession,
    source: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
) -> DataFrame:
    """Load the interleaved document table from a catalog table or a path.

    Catalog path: ``spark.read.table`` with Iceberg's time-travel options
    when requested.  File path: parquet (the local stand-in).  The returned
    frame is schema-checked so a drifted upstream fails here, at the seam,
    not deep inside an operator.
    """
    if is_catalog_table(spark, source):
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_ms is not None:
            reader = reader.option("as-of-timestamp", str(as_of_ms))
        df = reader.table(source)
    else:
        if snapshot_id is not None or as_of_ms is not None:
            raise ValueError(
                "time travel (snapshot_id/as_of_ms) needs a catalog-backed "
                f"table; {source!r} is a plain path"
            )
        df = spark.read.parquet(source)
    return _check_schema(df)


def _check_schema(df: DataFrame) -> DataFrame:
    cols = dict(df.dtypes)
    if "doc_id" not in cols:
        raise ValueError(f"document table missing doc_id; has {sorted(cols)}")
    if "spans" not in cols:
        raise ValueError(f"document table missing spans; has {sorted(cols)}")
    if not cols["spans"].startswith("array<struct<"):
        raise ValueError(f"spans must be array<struct<...>>, got {cols['spans']}")
    return df


def documents_from_text(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap a flat (doc_id, text) frame into the interleaved span shape —
    one text span at offset 0 (the ingest adapter for plain corpora)."""
    span = F.struct(
        F.lit("text").alias("kind"),
        F.col(text_col).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    )
    return docs.select(F.col(id_col).alias("doc_id"), F.array(span).alias("spans"))
