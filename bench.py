#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], printing ONE JSON line:

  {"metric": "conflated features/sec", "value": N, "unit": "sec"-per-query
   map in "queries", "sf": ..., "rate_n8"/"rate_n32"/"scaling_efficiency"}

The scaling section evidences the north rule (≥0.8 efficiency from N→4N
executors) via the multi-executor fleet protocol (scripts/scaling_bench.py;
analysis in BENCH/BASELINE.md).  Set SPARK_GRAFT_SKIP_SCALING=1 to skip it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# default sized to this box's measured effective parallelism for sustained
# JVM+Arrow work (BENCH/BASELINE.md): beyond ~16 task slots one local JVM
# anti-scales here; override with SPARK_GRAFT_CPUS
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
# corpus scale-up so the conflation job is compute-bound (not
# scheduler-overhead-bound) — the regime a 100 TB cluster run lives in
REPLICAS = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICAS", "4"))
N_PTS = int(os.environ.get("SPARK_GRAFT_BENCH_NPTS", "5"))


def build_spark(cores: int):
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("osm-merge-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


WORKDIR = os.environ.get("SPARK_GRAFT_WORKDIR", "/tmp/oms_bench")


def warmup(spark) -> None:
    """Spin up Python workers / Arrow / codegen on the tiny corpus so the
    measured run reflects steady-state throughput, not JVM+worker cold
    start (~15 s of fixed overhead otherwise)."""
    from osm_merge_spark.operators import conflate as C
    from osm_merge_spark.sources import synth

    sf = "/root/testdata/sf0.001"
    conflated, new = C.conflate(synth.external_ways(spark, sf), synth.osm_ways(spark, sf))
    conflated.count()
    new.count()


def prepare_corpus(spark, sf_dir: str) -> tuple[str, str]:
    """Materialize the synthetic corpus to parquet once.  The measured job
    then reads plain tables — matching the real deployment (input is an
    Iceberg/parquet table, not an in-flight expression tree) and keeping
    driver-side plan optimization out of the measured window."""
    tag = f"{os.path.basename(sf_dir)}_r{REPLICAS}_p{N_PTS}"
    ext_path = f"{WORKDIR}/ext_{tag}"
    osm_path = f"{WORKDIR}/osm_{tag}"
    from osm_merge_spark.sources import synth

    if not os.path.exists(ext_path + "/_SUCCESS"):
        synth.external_ways(spark, sf_dir, replicas=REPLICAS, n_pts=N_PTS).write.mode(
            "overwrite"
        ).parquet(ext_path)
    if not os.path.exists(osm_path + "/_SUCCESS"):
        synth.osm_ways(spark, sf_dir, replicas=REPLICAS, n_pts=N_PTS).write.mode(
            "overwrite"
        ).parquet(osm_path)
    return ext_path, osm_path


def run_conflation(spark, sf_dir: str) -> tuple[int, float]:
    """The headline job: full conflation over the materialized corpus,
    returns (conflated rows, seconds)."""
    from osm_merge_spark.operators import conflate as C

    warmup(spark)
    ext_path, osm_path = prepare_corpus(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism * 2
    ext = spark.read.parquet(ext_path).repartition(par, "ext_id")
    osm = spark.read.parquet(osm_path).repartition(par, "way_id")
    t0 = time.time()
    conflated, new = C.conflate(
        ext, osm, salt_hot_threshold=2000  # the engine's hot-cell split
    )
    n = conflated.count() + new.count()
    return n, time.time() - t0


def run_scaling() -> dict:
    """N→4N executor scaling via the multi-executor fleet protocol
    (scripts/scaling_bench.py, isolated mode — each executor measured on
    dedicated hardware as real cluster nodes would be; see BENCH/BASELINE.md
    for the saturation analysis that motivates the protocol)."""
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts", "scaling_bench.py")],
        # headroom above the sweep loop's own wall budget
        # (SPARK_GRAFT_SCALE_BUDGET_S, default 2700 s + the in-flight sweep)
        capture_output=True, text=True, timeout=5400,
        env={**os.environ, "SPARK_GRAFT_SKIP_SCALING": "1"},
    )
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    fleet = json.loads(line)
    out = {
        "scaling_protocol": fleet["protocol"],
        "n_executors": fleet["n_executors"],
        "rate_n": fleet["rate_n"],
        "rate_4n": fleet["rate_4n"],
        "wall_n": fleet["wall_n"],
        "wall_4n": fleet["wall_4n"],
        "per_exec_4n": fleet["per_exec_4n"],
        "scaling_efficiency": fleet["scaling_efficiency"],
    }
    for k in ("balance_4n", "balance_gate", "balance_gate_met", "sweeps_run",
              "scaling_efficiency_rejected", "scaling_rejection"):
        if k in fleet:
            out[k] = fleet[k]
    return out


HEADLINE = [
    "q_conflate_flagship",
    "q_knn_join",
    "q_tile_assign",
    "q_minhash_band_pairs",
    "q_cosine_topk",
    "q_text_stats",
    "q_span_signature",
    "q_building_overlap",
    "q_dedup_exact",
    "q_cell_histogram",
]


def main() -> None:
    from osm_merge_spark.queries import REGISTRY

    spark = build_spark(CPUS)
    timings: dict[str, float] = {}

    n_conflated, conflate_secs = run_conflation(spark, SF_DIR)
    timings["q_conflate_flagship"] = round(conflate_secs, 3)

    for name in HEADLINE:
        if name == "q_conflate_flagship":
            continue
        fn, _sql = REGISTRY[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    spark.stop()

    result = {
        "metric": "conflated features/sec on synthetic OSM+external merge corpus",
        "value": round(n_conflated / conflate_secs, 1),
        "unit": "features/sec",
        "queries": timings,
        "sf": SF_DIR,
        "conflated_rows": n_conflated,
    }
    if not os.environ.get("SPARK_GRAFT_SKIP_SCALING"):
        try:
            result.update(run_scaling())
        except Exception as e:  # scaling evidence is additive, never fatal
            result["scaling_error"] = str(e)[:200]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
