"""Headline-bench drift discipline (bench.run_headline, round 4): the
probe-bookended sweep shape, consistency-then-fastest selection, the
balance-driven extra sweeps, and the refusal note are pinned here against
simulated drift traces (no Spark: every measured call is stubbed)."""

import importlib.util
import os
import sys

import pytest

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
BN = importlib.util.module_from_spec(spec)
spec.loader.exec_module(BN)


class DriftBox:
    """probe walls come from `probes` in call order; the flagship wall
    from `conflates` per sweep."""

    def __init__(self, probes, conflates):
        self.probes = list(probes)
        self.conflates = list(conflates)
        self.p_i = 0
        self.c_i = 0

    def probe(self, spark):
        v = self.probes[self.p_i]
        self.p_i += 1
        return v

    def conflate(self, spark, sf_dir):
        v = self.conflates[self.c_i]
        self.c_i += 1
        return 100_000, v


@pytest.fixture
def run(monkeypatch):
    def go(probes, conflates, **env):
        box = DriftBox(probes, conflates)
        monkeypatch.setattr(BN, "probe", box.probe)
        monkeypatch.setattr(BN, "run_conflation", box.conflate)
        monkeypatch.setattr(BN, "warmup", lambda spark: None)
        monkeypatch.setattr(BN, "prepare_corpus", lambda spark, sf: ("", ""))
        monkeypatch.setattr(BN, "HEADLINE", ["q_conflate_flagship"])
        for k, v in env.items():
            monkeypatch.setenv(k, str(v))

        class _Cat:
            def clearCache(self):
                pass

        class _Spark:
            catalog = _Cat()

        return BN.run_headline(_Spark(), "/nowhere")

    return go


def test_selects_consistent_then_fastest(run):
    # sweep 0: probes 5/10 (ratio 2.0, storm) but FASTEST flagship;
    # sweeps 1-2 consistent; sweep 2 slower than sweep 1
    chosen, gate = run(
        probes=[5.0, 7.0, 10.0, 5.0, 5.05, 5.1, 6.0, 6.05, 6.1],
        conflates=[10.0, 20.0, 25.0],
        SPARK_GRAFT_HEAD_SWEEPS=3,
    )
    assert gate["headline_gate_met"] is True
    assert gate["headline_sweeps_run"] == 3
    # NOT the storm sweep's tempting 10 s wall: consistency, then fastest
    assert chosen["timings"]["q_conflate_flagship"] == 20.0
    assert gate["headline_probe_ratio"] == pytest.approx(5.1 / 5.0, abs=0.01)
    assert "headline_note" not in gate


def test_refuses_when_no_sweep_consistent(run):
    chosen, gate = run(
        probes=[5.0, 6.0, 10.0, 5.0, 6.0, 9.0, 5.0, 6.0, 8.0],
        conflates=[10.0, 11.0, 12.0],
        SPARK_GRAFT_HEAD_SWEEPS=3,
        SPARK_GRAFT_HEAD_MAX_SWEEPS=3,
    )
    assert gate["headline_gate_met"] is False
    assert "headline_note" in gate
    # most-consistent sweep (ratio 1.6) is recorded, not the fastest
    assert chosen["timings"]["q_conflate_flagship"] == 12.0


def test_storm_buys_extra_sweeps(run):
    # first 3 sweeps inconsistent -> a 4th runs and is chosen
    chosen, gate = run(
        probes=[5.0, 7.0, 10.0] * 3 + [5.0, 5.1, 5.2],
        conflates=[10.0, 11.0, 12.0, 13.0],
        SPARK_GRAFT_HEAD_SWEEPS=3,
    )
    assert gate["headline_sweeps_run"] == 4
    assert gate["headline_gate_met"] is True
    assert chosen["timings"]["q_conflate_flagship"] == 13.0


def test_spread_reported_across_sweeps(run):
    _chosen, gate = run(
        probes=[5.0] * 9,
        conflates=[10.0, 15.0, 12.0],
        SPARK_GRAFT_HEAD_SWEEPS=3,
    )
    assert gate["headline_query_spread"]["q_conflate_flagship"] == pytest.approx(1.5)


def test_mid_sweep_storm_caught_by_third_probe(run):
    # bookends 5.0/5.1 agree but the probe right after the flagship reads
    # 20 -> the sweep is inconsistent (rehearsal 3's failure mode)
    chosen, gate = run(
        probes=[5.0, 20.0, 5.1, 5.0, 5.2, 5.1],
        conflates=[10.0, 30.0],
        SPARK_GRAFT_HEAD_SWEEPS=2,
    )
    assert gate["headline_gate_met"] is True
    assert chosen["timings"]["q_conflate_flagship"] == 30.0  # sweep 2
