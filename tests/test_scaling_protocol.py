"""Protocol logic of scripts/scaling_bench.py (no Spark: _run_once stubbed).

The measurement rules themselves are load-bearing — the recorded N→4N
artifact is the north-rule claim of record — so the sweep interleaving,
per-task best-of, and the balance+convergence gate are pinned here against
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
    a, b = SB.run_scaling_interleaved(1)
    return box, a, b


def test_interleaving_order(monkeypatch):
    box, a, b = _run(monkeypatch, lambda i: 1.0)
    # each sweep visits the N rank then all 4N ranks, in order
    assert box.calls[:5] == [(1, 0), (4, 0), (4, 1), (4, 2), (4, 3)]
    assert box.calls[5:10] == box.calls[:5]
    assert a["executors"] == 1 and b["executors"] == 4
    assert a["rows"] == 100_000 and b["rows"] == 100_000


def test_stops_after_repeats_when_stable(monkeypatch):
    box, a, b = _run(monkeypatch, lambda i: 1.0, SPARK_GRAFT_SCALE_REPEATS=3)
    assert len(box.calls) == 15  # 3 sweeps × 5 tasks, no extras
    assert b["per_executor_secs"] == [15.0, 15.5, 15.2, 15.8]


def test_slow_sweep_not_selected(monkeypatch):
    # sweep 2 (calls 5..9) lands in a 2x-slow phase: balances tie (uniform
    # drift cancels), the lowest-total-wall sweep is recorded
    box, a, b = _run(monkeypatch, lambda i: 2.0 if 5 <= i < 10 else 1.0)
    assert a["wall_secs"] == 60.0
    assert b["wall_secs"] == 15.8


def test_uniform_storm_preserves_ratio(monkeypatch):
    # the whole protocol inside a 1.7x-slow phase: every sweep is uniformly
    # slow, so the recorded RATIO is unaffected — the defense against
    # hours-long degraded periods
    box, a, b = _run(monkeypatch, lambda i: 1.7)
    eff = (b["rate"] / a["rate"]) / 4
    assert abs(eff - (100_000 / (15.8 * 1.7)) / (100_000 / (60.0 * 1.7)) / 4) < 1e-3


def test_extra_sweep_until_balanced(monkeypatch):
    # rank 2 alone runs 1.5x slow for the first three sweeps (unbalanced
    # walls = internal drift) → extra sweep runs; the clean sweep 4 is the
    # one recorded
    box, a, b = _run(monkeypatch, lambda i: 1.5 if (i % 5 == 3 and i < 15) else 1.0)
    assert len(box.calls) == 20
    assert b["per_executor_secs"] == [15.0, 15.5, 15.2, 15.8]


def test_sweep_cap_bounds_runs(monkeypatch):
    # a persistent genuine imbalance never satisfies the balance gate — the
    # cap (repeats+3 = 6 sweeps) must stop it, recording the least-bad sweep
    box, a, b = _run(monkeypatch, lambda i: 1.5 if i % 5 == 3 else 1.0)
    assert len(box.calls) == 30
    assert b["per_executor_secs"][2] == pytest.approx(15.2 * 1.5)


def test_efficiency_computation_matches_main_formula(monkeypatch):
    box, a, b = _run(monkeypatch, lambda i: 1.0)
    eff = (b["rate"] / a["rate"]) / 4
    # true walls: N 60s/100k rows; 4N wall 15.8s/100k rows
    assert abs(eff - (100_000 / 15.8) / (100_000 / 60.0) / 4) < 1e-3


def test_wall_budget_bounds_sweeps(monkeypatch):
    # a persistent imbalance would run to the 6-sweep cap; an exhausted
    # wall budget stops after the 2-sweep floor with the sweeps in hand
    box, a, b = _run(
        monkeypatch, lambda i: 1.5 if i % 5 == 3 else 1.0, SPARK_GRAFT_SCALE_BUDGET_S=0
    )
    assert len(box.calls) == 10
