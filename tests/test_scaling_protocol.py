"""Protocol logic of scripts/scaling_bench.py (no Spark: _run_once stubbed).

The measurement rules themselves are load-bearing — the recorded N→4N
artifact is the north-rule claim of record — so the sweep shape (N bookends
around a twice-run 4N block; every task's wall = min of its two in-sweep
samples, the one-sided-noise floor estimator applied identically to both
fleet sizes), per-sweep consistency selection (per-rank-min 4N balance AND
N-pair agreement), and the balance gate + budget are pinned here against
simulated drift traces."""

import importlib.util

import pytest
import os
import sys

spec = importlib.util.spec_from_file_location(
    "scaling_bench", os.path.join(os.path.dirname(__file__), "..", "scripts", "scaling_bench.py")
)
SB = importlib.util.module_from_spec(spec)
spec.loader.exec_module(SB)


class DriftBox:
    """Simulated machine: per-call walls = true_wall × drift(call index)."""

    def __init__(self, drift):
        self.drift = drift
        self.calls = []
        self.true = {(1, 0): 60.0, (4, 0): 15.0, (4, 1): 15.5, (4, 2): 15.2, (4, 3): 15.8}

    def __call__(self, rank, k):
        i = len(self.calls)
        self.calls.append((k, rank))
        return {"rank": rank, "k": k, "rows": 100_000 if k == 1 else 25_000, "secs": round(self.true[(k, rank)] * self.drift(i), 2)}


def _run(monkeypatch, drift, **env):
    box = DriftBox(drift)
    monkeypatch.setattr(SB, "_run_once", box)
    for k, v in env.items():
        monkeypatch.setenv(k, str(v))
    a, b, gate = SB.run_scaling_interleaved(1)
    return box, a, b, gate


def test_interleaving_order(monkeypatch):
    box, a, b, gate = _run(monkeypatch, lambda i: 1.0)
    # each sweep bookends a TWICE-run 4N block with two N samples; every
    # task's wall is the min of its two samples (one-sided-noise floor)
    assert box.calls[:10] == [
        (1, 0),
        (4, 0), (4, 1), (4, 2), (4, 3),
        (4, 0), (4, 1), (4, 2), (4, 3),
        (1, 0),
    ]
    assert box.calls[10:20] == box.calls[:10]
    assert a["executors"] == 1 and b["executors"] == 4
    assert a["rows"] == 100_000 and b["rows"] == 100_000
    assert gate["balance_gate_met"] is True and gate["sweeps_run"] == 3
    assert gate["n_bookend_secs"] == [[60.0, 60.0]]
    assert gate["per_exec_4n_samples"] == [[15.0, 15.0], [15.5, 15.5], [15.2, 15.2], [15.8, 15.8]]


def test_stops_after_repeats_when_stable(monkeypatch):
    box, a, b, gate = _run(monkeypatch, lambda i: 1.0, SPARK_GRAFT_SCALE_REPEATS=3)
    assert len(box.calls) == 30  # 3 sweeps × 10 tasks, no extras
    assert b["per_executor_secs"] == [15.0, 15.5, 15.2, 15.8]


def test_slow_sweep_not_selected(monkeypatch):
    # sweep 2 (calls 10..19) lands in a 2x-slow phase: balances tie (uniform
    # drift cancels), the lowest-total-wall sweep is recorded
    box, a, b, gate = _run(monkeypatch, lambda i: 2.0 if 10 <= i < 20 else 1.0)
    assert a["wall_secs"] == 60.0
    assert b["wall_secs"] == 15.8


def test_uniform_storm_preserves_ratio(monkeypatch):
    # the whole protocol inside a 1.7x-slow phase: every sweep is uniformly
    # slow, so the recorded RATIO is unaffected — the defense against
    # hours-long degraded periods
    box, a, b, gate = _run(monkeypatch, lambda i: 1.7)
    eff = (b["rate"] / a["rate"]) / 4
    assert abs(eff - (100_000 / (15.8 * 1.7)) / (100_000 / (60.0 * 1.7)) / 4) < 1e-3


def test_extra_sweep_until_balanced(monkeypatch):
    # 4N rank 2 runs 1.5x slow in BOTH its samples for the first three
    # sweeps (a persistent within-sweep imbalance the min cannot absorb)
    # → extra sweep runs; the clean sweep 4 is the one recorded
    box, a, b, gate = _run(
        monkeypatch, lambda i: 1.5 if (i % 10 in (3, 7) and i < 30) else 1.0
    )
    assert len(box.calls) == 40
    assert b["per_executor_secs"] == [15.0, 15.5, 15.2, 15.8]
    assert gate["balance_gate_met"] is True


def test_n_bookend_disagreement_rejects_sweep(monkeypatch):
    # the 4N walls are perfectly balanced, but the machine phase flips
    # before the trailing N bookend in the first three sweeps — the N-pair
    # gate must reject those sweeps and keep sweeping until a clean one
    box, a, b, gate = _run(monkeypatch, lambda i: 1.6 if (i % 10 == 9 and i < 30) else 1.0)
    assert len(box.calls) == 40
    assert gate["balance_gate_met"] is True
    assert a["per_executor_secs"] == [60.0]  # clean sweep: min of 60/60


def test_n_wall_is_bookend_min(monkeypatch):
    # a linear within-sweep ramp: every call k% slower than the previous —
    # the N estimate is the bookend MIN (the same floor estimator as the
    # 4N ranks, so a ramp biases both sides identically)
    box, a, b, gate = _run(monkeypatch, lambda i: 1.0 + 0.01 * (i % 10))
    assert a["per_executor_secs"] == [60.0]  # lead bookend: drift(0) == 1.0


def test_single_sample_noise_absorbed_by_min(monkeypatch):
    # THE r5 amendment case: one of each 4N rank's two samples takes a
    # 1.4x noise hit (the slow rank moving run to run, as measured on this
    # box) — the per-rank min recovers the true walls and the balance gate
    # passes without burning extra sweeps
    box, a, b, gate = _run(
        monkeypatch, lambda i: 1.4 if i % 10 in (1, 3, 6, 8) else 1.0
    )
    assert gate["balance_gate_met"] is True and gate["sweeps_run"] == 3
    assert b["per_executor_secs"] == [15.0, 15.5, 15.2, 15.8]


def test_sweep_cap_bounds_runs(monkeypatch):
    # a persistent genuine imbalance never satisfies the balance gate — the
    # sweep cap must stop it, recording the least-bad sweep with the gate
    # marked unmet (the recorded JSON refuses to present it as balanced)
    box, a, b, gate = _run(
        monkeypatch, lambda i: 1.5 if i % 10 in (3, 7) else 1.0, SPARK_GRAFT_SCALE_MAX_SWEEPS=6
    )
    assert len(box.calls) == 60
    assert b["per_executor_secs"][2] == pytest.approx(15.2 * 1.5)
    assert gate["balance_gate_met"] is False
    assert gate["balance_4n"] == pytest.approx(1.5 * 15.2 / 15.0, abs=0.01)


def test_unbalanced_runs_to_full_budget(monkeypatch):
    # while no sweep balances, the loop keeps buying sweeps all the way to
    # the (default, generous) cap — r2 stopped at R+3 with budget to spare
    box, a, b, gate = _run(monkeypatch, lambda i: 1.5 if i % 10 in (3, 7) else 1.0)
    assert len(box.calls) == 24 * 10
    assert gate["sweeps_run"] == 24 and gate["balance_gate_met"] is False


def test_efficiency_computation_matches_main_formula(monkeypatch):
    box, a, b, gate = _run(monkeypatch, lambda i: 1.0)
    eff = (b["rate"] / a["rate"]) / 4
    # true walls: N 60s/100k rows; 4N wall 15.8s/100k rows
    assert abs(eff - (100_000 / 15.8) / (100_000 / 60.0) / 4) < 1e-3


def test_wall_budget_zero_storm_aborts(monkeypatch):
    # r4: budget enforcement is tiered and applies INSIDE every sweep — a
    # zero budget can't even finish one sweep, so the loop returns the
    # explicit storm-abort refusal instead of dying on the caller's
    # subprocess timeout (which is how the first r4 two-corpus run lost
    # its replicas-8 artifact entirely)
    box, a, b, gate = _run(
        monkeypatch, lambda i: 1.5 if i % 6 == 3 else 1.0, SPARK_GRAFT_SCALE_BUDGET_S=0
    )
    assert a is None and b is None
    assert gate["storm_abort"] is True and gate["sweeps_run"] == 0


class _Clock:
    def __init__(self, t0=1000.0):
        self.t = t0

    def time(self):
        return self.t


def _run_timed(monkeypatch, budget, drift=lambda i: 1.0):
    """DriftBox whose task walls ADVANCE a fake clock, so the wall-budget
    tiers are exercised with realistic elapsed times."""
    import types

    clock = _Clock()
    box = DriftBox(drift)
    real = box.__call__

    def timed(rank, k):
        out = real(rank, k)
        clock.t += out["secs"]
        return out

    monkeypatch.setattr(SB, "_run_once", timed)
    monkeypatch.setattr(SB, "time", types.SimpleNamespace(time=clock.time))
    monkeypatch.setenv("SPARK_GRAFT_SCALE_BUDGET_S", str(budget))
    a, b, gate = SB.run_scaling_interleaved(1)
    return box, a, b, gate


def test_budget_break_after_one_sweep(monkeypatch):
    # sweep 0 (243 s) fits inside 1.5x a 250 s budget; sweep 1's first task
    # crosses the budget -> the loop stops with the one complete sweep in
    # hand (its own balance gate still decides whether the claim is refused)
    box, a, b, gate = _run_timed(monkeypatch, budget=250)
    assert gate["sweeps_run"] == 1
    assert len(box.calls) == 11  # 10 tasks of sweep 0 + the aborted task
    assert a is not None


def test_storm_abort_mid_first_sweep(monkeypatch):
    # 1.5x a 100 s budget lands inside sweep 0 -> storm abort, no claim
    box, a, b, gate = _run_timed(monkeypatch, budget=100)
    assert a is None
    assert gate["storm_abort"] is True
    assert len(box.calls) == 7  # aborted mid second 4N pass (elapsed 152 s)


def test_claim_refuses_unbalanced_sweep(monkeypatch):
    # the recorded JSON must not CLAIM an efficiency from a sweep that
    # failed the internal-consistency gate — the number moves to
    # scaling_efficiency_rejected and the claim field reads null
    box, a, b, gate = _run(monkeypatch, lambda i: 1.5 if i % 10 in (3, 7) else 1.0)
    assert gate["balance_gate_met"] is False
    out = SB.claim(a, b, gate, "isolated", 1)
    assert out["scaling_efficiency"] is None
    assert out["scaling_efficiency_rejected"] == pytest.approx(
        (b["rate"] / a["rate"]) / 4, abs=1e-3
    )
    assert "scaling_rejection" in out


def test_claim_records_balanced_sweep(monkeypatch):
    box, a, b, gate = _run(monkeypatch, lambda i: 1.0)
    assert gate["balance_gate_met"] is True
    out = SB.claim(a, b, gate, "isolated", 1)
    assert out["scaling_efficiency"] == pytest.approx(
        (b["rate"] / a["rate"]) / 4, abs=1e-3
    )
    assert "scaling_rejection" not in out
