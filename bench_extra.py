#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is FROZEN for the
driver's measurement; this file exists so the optimization work can isolate
and time individual operators with the noop sink per the optimization guide
§1.4 without touching the measured artifact).

Usage:
  python bench_extra.py [--queries q1,q2,...] [--reps N] [--flagship]
                        [--plans-dir plans/r06 --plans-suffix before]

- times each selected headline query with df.write.format("noop") (computes
  every column, unlike count());
- optionally times the composed flagship conflation exactly as bench.py's
  run_conflation does (same corpus materialization, same salt threshold);
- optionally dumps .explain("formatted") per query for the plan evidence.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32 — the driver's setting), SPARK_GRAFT_BENCH_REPLICAS (default 4),
SPARK_GRAFT_BENCH_NPTS (default 5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

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


def build_spark():
    import bench

    return bench.build_spark(CPUS)


def plan_of(df) -> str:
    df.sparkSession.catalog.clearCache()
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--flagship", action="store_true",
                    help="also time bench.run_conflation (composed corpus)")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plans-suffix", default="before")
    ap.add_argument("--skip-warmup", action="store_true")
    args = ap.parse_args()

    import bench
    from osm_merge_spark.queries import REGISTRY

    spark = build_spark()
    if not args.skip_warmup:
        t0 = time.time()
        bench.warmup(spark)
        print(f"# warmup {time.time()-t0:.1f}s", flush=True)

    out: dict = {"sf": SF_DIR, "cpus": CPUS, "queries": {}, "samples": {}}

    names = [n for n in args.queries.split(",") if n]
    if args.flagship:
        bench.prepare_corpus(spark, SF_DIR)
        walls, rows = [], 0
        for _ in range(args.reps):
            rows, secs = bench.run_conflation(spark, SF_DIR)
            walls.append(round(secs, 3))
            print(f"# flagship_composed {secs:.2f}s rows={rows}", flush=True)
        out["samples"]["flagship_composed"] = walls
        out["queries"]["flagship_composed"] = min(walls)
        out["conflated_rows"] = rows
        out["rate"] = round(rows / min(walls), 1)

    for name in names:
        fn, _sql = REGISTRY[name]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            with open(os.path.join(args.plans_dir, f"{name}_{args.plans_suffix}.txt"), "w") as f:
                f.write(plan_of(fn(spark, SF_DIR)))
        walls = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            print(f"# {name} {walls[-1]:.2f}s", flush=True)
        out["samples"][name] = walls
        out["queries"][name] = min(walls)
    spark.sparkContext.setJobDescription(None)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
