"""Corpus-curation operators for the training-data pipeline layer:
hash-stratified sampling, sequence packing, hashed-n-gram importance
weighting (DSIR-style), and cross-document boilerplate-chunk removal.

These sit downstream of the dedup/quality operators (operators/dedup.py,
functions/text.py) and upstream of a tokenizer: together they turn a raw
document table into a mixed, packed training corpus.  Every operator is
pure Column math or a manufactured-equi-key shuffle — no per-row Python,
no driver-side data loops (the one ``collect`` below is P rows of
partition metadata, the same pattern as plans/distribute.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as TX

# uniform-in-[0,1) from the portable polynomial hash: u = (h(s) % M) / M.
# M is a power of ten so the oracle's arithmetic is exactly reproducible.
_U_MOD = 1_000_000


def hash_uniform(s: Column) -> Column:
    """Deterministic pseudo-uniform in [0, 1) from a string key — the
    sampling coin.  Portable: the DuckDB twin is the same poly-hash +
    mix mod 1e6 over the same key, so Spark and the oracle flip identical
    coins.  Never use ``rand()`` for corpus sampling: resumption, retries,
    and AQE re-execution would each resample differently.

    The raw polynomial hash has NO avalanche on trailing characters
    (consecutive ids hash to consecutive-ish values, so ``% 1e6`` clusters
    badly); two rounds of the MINSTD multiplicative LCG (x48271 over the
    same 2^31-1 modulus, full-period, Park-Miller) decorrelate small key
    deltas before the mod."""
    h = TX.string_poly_hash(s)
    for _ in range(2):
        h = (h * 48271) % TX.HASH_MOD
    return (h % _U_MOD).cast("double") / _U_MOD


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    stratum_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling: keep a row iff
    ``hash_uniform(stratum || ':' || key) < rate(stratum)``.

    This is the domain-mixing primitive (e.g. "keep 100% of wiki, 25% of
    web, 5% of forums").  The rates table is driver-side config compiled
    into a broadcast join — at 100 TB the fact table streams map-side
    through the tiny rates dim with zero shuffle, and the decision is
    embarrassingly parallel per row.  Rows from strata absent from
    ``rates`` use ``default_rate``.
    """
    spark = docs.sparkSession
    rates_df = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(rates.items())],
        f"{stratum_col} string, rate double",
    )
    u = hash_uniform(
        F.concat(F.col(stratum_col), F.lit(":"), F.col(key_col).cast("string"))
    )
    return (
        docs.join(F.broadcast(rates_df), stratum_col, "left")
        .withColumn("rate", F.coalesce(F.col("rate"), F.lit(float(default_rate))))
        .withColumn("u", F.round(u, 6))
        .filter(F.col("u") < F.col("rate"))
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    order_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end in
    ``order_col`` order and cut into fixed ``seq_len``-token training
    sequences; each doc gets the pack it STARTS in plus its token offset
    within that pack (a doc longer than the remaining space simply spans
    into the next packs — standard causal-LM packing).

    Scale path — a distributed exclusive prefix sum, NOT a global window
    (a single ``Window.orderBy`` with no partitioning collapses the whole
    corpus into one task):

    1. ``repartitionByRange(order_col)`` → globally range-sorted partitions;
    2. per-partition token totals → ``collect`` (P rows of metadata, the
       plans/distribute.py pattern) → exclusive prefix offsets on the
       driver;
    3. within-partition running sum via a window PARTITIONED by the
       physical partition id — P independent window groups, so parallelism
       stays P and no task sees more than one partition's rows.

    Total cost: one range shuffle + one pid-keyed window shuffle + a
    P-row driver exchange.  The oracle twin is the plain global-window
    cumulative sum, which DuckDB can afford at test scale.
    """
    n = docs.sparkSession.sparkContext.defaultParallelism
    parts = num_partitions or n
    base = docs.select(
        order_col, TX.token_count(F.col(text_col)).cast("long").alias("n_tokens")
    ).repartitionByRange(parts, order_col)
    with_pid = base.withColumn("_pid", F.spark_partition_id())

    totals = {
        r["_pid"]: r["tot"]
        for r in with_pid.groupBy("_pid").agg(F.sum("n_tokens").alias("tot")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid]
    # offsets ride a broadcast join, not a create_map literal: at 10k+
    # partitions a 2P-node map expression bloats the Catalyst tree/codegen,
    # while a P-row broadcast dim stays O(1) in plan size
    off_df = docs.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _poff long"
    )
    with_off = with_pid.join(F.broadcast(off_df), "_pid", "left")

    w = Window.partitionBy("_pid").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum_before = (
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        + F.coalesce(F.col("_poff"), F.lit(0))
    )
    return (
        with_off.select(
            order_col,
            "n_tokens",
            F.floor(cum_before / seq_len).cast("long").alias("pack_id"),
            (cum_before % seq_len).cast("long").alias("pack_offset"),
        )
    )


def dsir_weights(
    docs: DataFrame,
    target: Column,
    buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    smooth: float = 0.5,
) -> DataFrame:
    """Hashed-unigram importance weights (DSIR, Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score each
    document by how much its hashed token distribution looks like a target
    subset vs the raw corpus.

    ``weight = mean over token occurrences of
               ln( p_target(bucket) / p_raw(bucket) )``
    with add-``smooth`` Laplace smoothing over ``buckets`` hash buckets;
    ``target`` is any boolean Column over the docs table (e.g.
    ``col('lang') == 'en'``).

    Scale path: two passes over an exploded (doc, bucket) stream — bucket
    histograms are a ``buckets``-row aggregate (map-side partial, tiny
    result) broadcast back onto the stream; the per-doc mean is one more
    map-side-partial groupBy.  Nothing quadratic, no driver data loop.
    """
    toks = docs.select(
        F.col(id_col),
        target.alias("_is_target"),
        F.explode_outer(TX.tokens(F.col(text_col))).alias("tok"),
    ).withColumn(
        "bucket",
        F.when(
            F.col("tok").isNull(), F.lit(None)
        ).otherwise(TX.string_poly_hash(F.col("tok")) % buckets),
    )

    hist = (
        toks.filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(
            F.count("*").alias("raw_cnt"),
            F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("tgt_cnt"),
        )
    )
    tot = hist.agg(
        F.sum("raw_cnt").alias("raw_tot"), F.sum("tgt_cnt").alias("tgt_tot")
    )
    probs = hist.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.log(
            ((F.col("tgt_cnt") + smooth) / (F.col("tgt_tot") + smooth * buckets))
            / ((F.col("raw_cnt") + smooth) / (F.col("raw_tot") + smooth * buckets))
        ).alias("log_ratio"),
    )

    return (
        toks.join(F.broadcast(probs), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("bucket")).cast("long").alias("n_toks"),
            F.round(F.coalesce(F.avg("log_ratio"), F.lit(0.0)), 6).alias("dsir_weight"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination (the eval-overlap scrub every public
    pretraining pipeline runs — PaLM/GPT-3/Llama reports all document an
    n-gram overlap filter): flag each corpus document that shares at least
    one ``n``-token shingle with the benchmark set.

    Returns (id, n_shingles, n_contaminated, contaminated) — callers drop
    or downweight flagged docs.

    Scale path: both sides reduce to DISTINCT shingle-hash streams
    (``text.token_shingle_hashes`` — text never travels through the join);
    the benchmark side is tiny by construction (eval sets are thousands of
    docs against a 10^12-doc corpus), so its distinct hash set broadcasts
    and the corpus stream is probed map-side with ZERO shuffle of corpus
    data.  Set ``broadcast_benchmark=False`` for an unusually large
    benchmark — the join degrades to a hash-key shuffle, still never
    quadratic.  Per-doc rollup is one map-side-partial groupBy.
    """
    # projection barrier + persist (r6, guide §2.3): the shingle fold is a
    # per-character HOF chain; referencing it from both the size and the
    # value, from both consumers below, evaluated it up to 4x per row
    sh = TX.token_shingle_hashes(F.col(text_col), n)
    doc_sh = (
        docs.select(F.col(id_col), sh.alias("_sh"))
        .select(F.col(id_col), F.size("_sh").alias("n_shingles"), F.col("_sh"))
        .persist()
    )
    bench = benchmark.select(F.explode(TX.token_shingle_hashes(F.col(text_col), n)).alias("h")).distinct()
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    hits = (
        doc_sh.select(id_col, F.explode("_sh").alias("h"))
        .join(bench, "h", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_contaminated"))
    )
    return (
        doc_sh.select(id_col, F.col("n_shingles").cast("long"))
        .join(hits, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def drop_boilerplate_chunks(
    docs: DataFrame,
    chunk: int = 3,
    min_docs: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document boilerplate removal (the line-dedup stage of
    CCNet/RefinedWeb-style pipelines, adapted to unstructured text):
    segment each document into consecutive ``chunk``-token pieces, drop
    every piece whose exact content occurs in ≥ ``min_docs`` DISTINCT
    documents, and reassemble the survivors in order.

    Returns (id, n_chunks, n_boiler, text_clean).  Scale path: piece keys
    are hashes, the boilerplate decision is one groupBy on the piece hash
    with a distinct-doc count (map-side partial via the (hash, doc) dedup
    first), and the verdict joins back on the same manufactured key —
    never text-to-text comparison.  Reassembly is an array_sort over
    (pos, piece) structs, per-doc local work.
    """
    t = TX.tokens(F.col(text_col))
    n_chunks = F.ceil(F.size(t) / chunk).cast("int")
    pieces = docs.select(
        F.col(id_col),
        F.posexplode_outer(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(t, i * chunk + 1, chunk)),
            )
        ).alias("pos", "piece"),
    ).filter(F.col("piece") != "")
    keyed = pieces.withColumn("pkey", TX.string_poly_hash(F.col("piece")))

    boiler = (
        keyed.select("pkey", id_col)
        .distinct()
        .groupBy("pkey")
        .agg(F.count("*").alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("pkey", F.lit(True).alias("is_boiler"))
    )

    flagged = keyed.join(boiler, "pkey", "left").withColumn(
        "is_boiler", F.coalesce(F.col("is_boiler"), F.lit(False))
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("is_boiler"), 1).otherwise(0)).cast("long").alias("n_boiler"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("is_boiler"),
                            F.struct(F.col("pos"), F.col("piece")),
                        )
                    )
                ),
                lambda s: s["piece"],
            ),
        ).alias("text_clean"),
    )
    # empty docs produce no pieces; re-attach them with zero counts
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def dedup_paragraphs(
    docs: DataFrame,
    delim: str = r"\n+",
    text_col: str = "text",
    id_col: str = "doc_id",
    out_delim: str = "\n",
) -> DataFrame:
    """Paragraph-level global exact dedup (the Dolma / CCNet paragraph
    stage): split each document on ``delim``, keep only the FIRST
    occurrence of each distinct paragraph corpus-wide — ordered by
    (``id_col``, position), so reruns are deterministic — and reassemble
    each document's surviving paragraphs in original order.

    Differs from :func:`drop_boilerplate_chunks` in policy: boilerplate
    removal drops a frequent piece EVERYWHERE; paragraph dedup keeps
    exactly one copy (the first) and drops the rest.

    Returns (id, n_paras, n_kept, text_kept).  Scale path: the global
    first-occurrence vote is one groupBy on the paragraph HASH with a
    ``min(struct(id, pos))`` partial agg — paragraph text never rides the
    vote shuffle; the verdict joins back on the same manufactured key (AQE
    reuses the exchange), and reassembly is the per-doc array_sort pattern.
    Hash collisions conflate paragraphs at ~n²/2^31 odds — at true corpus
    scale swap ``string_poly_hash`` for ``F.xxhash64`` (the oracle twin is
    what pins the portable hash here).
    """
    paras = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delim)).alias("pos", "para"),
    ).filter(F.col("para") != "")
    keyed = paras.withColumn("pkey", TX.string_poly_hash(F.col("para")))
    first = keyed.groupBy("pkey").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first")
    )
    kept = keyed.join(first, "pkey").where(
        (F.col(id_col) == F.col(f"_first.{id_col}")) & (F.col("pos") == F.col("_first.pos"))
    )
    per_doc = kept.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.concat_ws(
            out_delim,
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("para")))),
                lambda s: s["para"],
            ),
        ).alias("text_kept"),
    )
    n_paras = paras.groupBy(id_col).agg(F.count("*").cast("long").alias("n_paras"))
    return (
        docs.select(id_col)
        .join(n_paras, id_col, "left")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_paras", F.lit(0)).alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_kept", F.lit("")).alias("text_kept"),
        )
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-ES): each row draws its coin u from the portable hash of
    its key (never rand() — resumption/retry/AQE-safe, same doctrine as
    stratified_sample), forms the ES key, and the k largest keys are the
    sample.  Inclusion probability is proportional to weight, and the
    whole draw is reproducible from the key column alone.

    The key is kept in the LOG domain: ``es_key = ln(u)/w`` is order-
    equivalent to the textbook ``u^(1/w)`` (ln is monotone; both sides
    negative-to-zero) but numerically far better conditioned — u^(1/w)
    clusters all keys within ~1e-5 of 1.0 for large weights, where a
    cross-engine pow() ulp can flip the shared rounding, while ln(u)/w
    spreads them over ~1e-5-magnitude values whose 12-dp rounding is
    ~1e9 ulps wide.

    u is shifted to (0, 1] (``(h%M + 1)/M``) so zero-coin rows can't hit
    ln(0); rows with weight <= 0 are excluded (ES is defined for positive
    weights).

    Plan: per-group it's one window shuffle on ``group_col``; global
    (group_col=None) it's orderBy+limit, which Catalyst executes as
    TakeOrderedAndProject — per-partition top-k then a k-row driver merge,
    no global sort materialization.  Both scale: the 100 TB cost is one
    pass + one k-sized (or per-group) selection.
    """
    u = (
        (
            _mixed_hash(F.col(key_col).cast("string")) % _U_MOD + F.lit(1)
        ).cast("double")
        / _U_MOD
    )
    keyed = (
        df.filter(F.col(weight_col) > 0)
        .withColumn("u", F.round(u, 6))
        .withColumn(
            "es_key",
            F.round(F.log(F.col("u")) / F.col(weight_col).cast("double"), 12),
        )
    )
    if group_col is None:
        return keyed.orderBy(F.desc("es_key"), F.col(key_col)).limit(k)
    w = Window.partitionBy(group_col).orderBy(F.desc("es_key"), F.col(key_col))
    return (
        keyed.withColumn("es_rank", F.row_number().over(w))
        .filter(F.col("es_rank") <= k)
    )


def _mixed_hash(s: Column) -> Column:
    """The poly-hash + two MINSTD mix rounds used by hash_uniform, exposed
    as the raw bigint (weighted_sample_topk needs the +1 shift before the
    mod-to-unit-interval step)."""
    h = TX.string_poly_hash(s)
    for _ in range(2):
        h = (h * 48271) % TX.HASH_MOD
    return h
