"""Round-5 bench composition discipline (VERDICT r4 item 1): ONE total wall
budget allocated across phases, incremental artifact emission, in-sweep
headline breaks, and wall-clamped scaling waits — pinned here without Spark
(every measured call stubbed, the clock simulated)."""

import importlib.util
import json
import os
import sys
import types

import pytest

_here = os.path.dirname(__file__)

spec = importlib.util.spec_from_file_location("bench", os.path.join(_here, "..", "bench.py"))
BN = importlib.util.module_from_spec(spec)
spec.loader.exec_module(BN)

spec2 = importlib.util.spec_from_file_location(
    "scaling_bench", os.path.join(_here, "..", "scripts", "scaling_bench.py")
)
SB = importlib.util.module_from_spec(spec2)
spec2.loader.exec_module(SB)


# ---------------------------------------------------------------------------
# _phase_budget: allocation from the remaining total wall
# ---------------------------------------------------------------------------


def test_phase_budget_skips_when_wall_nearly_spent(monkeypatch):
    import time as _t

    monkeypatch.setattr(BN, "_DEADLINE", _t.time() + 300)
    assert BN._phase_budget(prep_allow_s=600, cap_s=1500) is None


def test_phase_budget_caps_and_fits_inside_remaining(monkeypatch):
    import time as _t

    monkeypatch.setattr(BN, "_DEADLINE", _t.time() + 10_000)
    budget, wall = BN._phase_budget(prep_allow_s=600, cap_s=1500)
    assert budget == 1500  # capped, not (10000-90-600)/1.5
    assert wall == pytest.approx(600 + 1.5 * 1500)
    # the wall the child gets always fits inside what remains minus reserve
    assert wall <= 10_000 - 90


def test_phase_budget_floor_is_240s_of_sweep_budget(monkeypatch):
    import time as _t

    # remaining 90 (reserve) + 240*1.5 + prep 100 = 550 → exactly feasible
    monkeypatch.setattr(BN, "_DEADLINE", _t.time() + 551)
    alloc = BN._phase_budget(prep_allow_s=100, cap_s=900)
    assert alloc is not None
    monkeypatch.setattr(BN, "_DEADLINE", _t.time() + 500)
    assert BN._phase_budget(prep_allow_s=100, cap_s=900) is None


# ---------------------------------------------------------------------------
# run_scaling env wiring (r4 ADVICE: budget env must always match the value
# the timeouts derive from)
# ---------------------------------------------------------------------------


class _FakeRun:
    def __init__(self):
        self.calls = []

    def __call__(self, argv, capture_output, text, timeout, env):
        self.calls.append({"timeout": timeout, "env": env})
        return types.SimpleNamespace(stdout='{"n_executors": 1, "scaling_efficiency": 0.9}\n')


def test_run_scaling_sets_budget_and_wall_env_consistently(monkeypatch):
    fake = _FakeRun()
    monkeypatch.setattr(BN.subprocess, "run", fake)
    BN.run_scaling(replicas=8, budget_s=700, wall_s=1650)
    c = fake.calls[0]
    assert c["env"]["SPARK_GRAFT_SCALE_BUDGET_S"] == "700"
    assert c["env"]["SPARK_GRAFT_SCALE_WALL_S"] == "1650"
    assert c["timeout"] == pytest.approx(1650 + 120)


def test_run_scaling_default_path_still_arms_the_env(monkeypatch):
    # the r4 default-arg hole: budget_s=None used to leave the child on its
    # own 3600 s default while the caller timed out earlier
    fake = _FakeRun()
    monkeypatch.setattr(BN.subprocess, "run", fake)
    BN.run_scaling()
    c = fake.calls[0]
    budget = float(c["env"]["SPARK_GRAFT_SCALE_BUDGET_S"])
    wall = float(c["env"]["SPARK_GRAFT_SCALE_WALL_S"])
    assert wall >= 1.5 * budget  # child's own hard break fits inside its wall
    assert c["timeout"] > wall  # caller backstop strictly above the child wall


# ---------------------------------------------------------------------------
# headline in-sweep break (simulated clock)
# ---------------------------------------------------------------------------


class Clock:
    def __init__(self):
        self.t = 0.0

    def time(self):
        return self.t

    def advance(self, dt):
        self.t += dt
        return self.t


class _NoopDF:
    class _W:
        def format(self, *_):
            return self

        def mode(self, *_):
            return self

        def save(self):
            pass

    @property
    def write(self):
        return self._W()


def _fake_query(clock, secs):
    def fn(spark, sf_dir):
        clock.advance(secs)
        return _NoopDF()

    return fn


class _Spark:
    class _Cat:
        def clearCache(self):
            pass

    catalog = _Cat()


def _headline_env(monkeypatch, clock, probes, conflates, extra_secs):
    """Wire run_headline to a simulated clock: probes/conflates/extra query
    each advance it by their wall."""
    from osm_merge_spark.queries import REGISTRY

    monkeypatch.setattr(BN, "time", types.SimpleNamespace(time=clock.time))
    p_iter = iter(probes)
    c_iter = iter(conflates)

    def probe(spark):
        v = next(p_iter)
        clock.advance(v)
        return v

    def conflate(spark, sf_dir):
        v = next(c_iter)
        clock.advance(v)
        return 100_000, v

    monkeypatch.setattr(BN, "probe", probe)
    monkeypatch.setattr(BN, "run_conflation", conflate)
    monkeypatch.setattr(BN, "warmup", lambda spark: None)
    monkeypatch.setattr(BN, "prepare_corpus", lambda spark, sf: ("", ""))
    monkeypatch.setattr(BN, "HEADLINE", ["q_conflate_flagship", "q_bb_extra"])
    monkeypatch.setitem(REGISTRY, "q_bb_extra", (_fake_query(clock, extra_secs), None))


def test_insweep_abort_keeps_banked_sweeps(monkeypatch):
    clock = Clock()
    monkeypatch.setenv("SPARK_GRAFT_HEAD_BUDGET_S", "100")
    monkeypatch.setenv("SPARK_GRAFT_HEAD_SWEEPS", "3")
    # sweep 0 completes fast (total ~18 s); sweep 1's flagship storms to
    # 150 s so the in-sweep check (elapsed > 1.25×100) fires before the
    # extra query — the banked sweep stands, the partial one is discarded
    _headline_env(
        monkeypatch,
        clock,
        probes=[1.0, 1.0, 1.0, 1.0, 1.0],
        conflates=[10.0, 150.0],
        extra_secs=5.0,
    )
    chosen, gate = BN.run_headline(_Spark(), "/nowhere")
    assert gate["headline_insweep_abort"] is True
    assert gate["headline_sweeps_run"] == 1
    assert chosen["timings"]["q_conflate_flagship"] == 10.0
    assert "q_bb_extra" in chosen["timings"]


def test_first_sweep_storm_recorded_partial_with_refusal(monkeypatch):
    clock = Clock()
    monkeypatch.setenv("SPARK_GRAFT_HEAD_BUDGET_S", "50")
    # the very first flagship storms to 200 s (> 1.6×50): the sweep is cut
    # before the extra query, recorded partial with two probes, and the
    # refusal semantics apply (gate not met, note present)
    _headline_env(
        monkeypatch,
        clock,
        probes=[1.0, 1.0],
        conflates=[200.0],
        extra_secs=5.0,
    )
    chosen, gate = BN.run_headline(_Spark(), "/nowhere")
    assert gate["headline_gate_met"] is False
    assert "headline_note" in gate
    assert gate["headline_insweep_abort"] is True
    assert chosen["timings"] == {"q_conflate_flagship": 200.0}
    assert len(chosen["probes"]) == 2
    assert chosen.get("partial") is True


def test_select_headline_never_claims_a_partial_sweep():
    full = {"timings": {"q": 10.0}, "rows": 1, "rate": 1.0, "probes": [5.0, 5.0, 5.0],
            "ratio": 1.0, "total": 10.0}
    part = {"timings": {"q": 2.0}, "rows": 1, "rate": 5.0, "probes": [5.0, 5.0],
            "ratio": 1.0, "partial": True, "total": 2.0}
    chosen, gate = BN._select_headline([full, part], gate=1.2)
    assert chosen is full  # the tempting 2 s partial sweep is not claimable
    assert gate["headline_gate_met"] is True


# ---------------------------------------------------------------------------
# SIGTERM artifact flush
# ---------------------------------------------------------------------------


def _capture_sigterm(monkeypatch, capsys):
    codes = []
    monkeypatch.setattr(BN.os, "_exit", lambda c: codes.append(c))
    BN._on_sigterm(15, None)
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    return json.loads(out[-1]), codes


def test_sigterm_replays_completed_result(monkeypatch, capsys):
    monkeypatch.setattr(BN, "RESULT", {"value": 123.0, "queries": {"q": 1.0}})
    got, codes = _capture_sigterm(monkeypatch, capsys)
    assert got["value"] == 123.0
    assert got["terminated_early"] is True
    assert codes == [143]


def test_sigterm_mid_headline_reconstructs_from_sweeps(monkeypatch, capsys):
    sweep = {"timings": {"q_conflate_flagship": 9.0}, "rows": 1000, "rate": 111.1,
             "probes": [5.0, 5.0, 5.0], "ratio": 1.0, "total": 9.0}
    monkeypatch.setattr(BN, "RESULT", {})
    monkeypatch.setattr(BN, "PARTIAL", {"sweeps": [sweep], "gate": 1.2})
    got, _ = _capture_sigterm(monkeypatch, capsys)
    assert got["value"] == 111.1
    assert got["headline_gate_met"] is False
    assert got["terminated_early"] is True


def test_sigterm_before_any_sweep_emits_stub(monkeypatch, capsys):
    monkeypatch.setattr(BN, "RESULT", {})
    monkeypatch.setattr(BN, "PARTIAL", {})
    got, _ = _capture_sigterm(monkeypatch, capsys)
    assert got["value"] is None
    assert got["headline_gate_met"] is False


# ---------------------------------------------------------------------------
# scaling_bench wall-deadline clamps (r4 ADVICE medium)
# ---------------------------------------------------------------------------


def test_clamp_wait_respects_wall_deadline(monkeypatch):
    import time as _t

    monkeypatch.setattr(SB, "_WALL_DEADLINE", _t.time() + 100)
    assert SB._clamp_wait(1800) == pytest.approx(70, abs=2)  # 100 - 30 s refusal slack
    monkeypatch.setattr(SB, "_WALL_DEADLINE", None)
    assert SB._clamp_wait(1800) == 1800  # unarmed (tests / standalone import)


def test_run_once_refuses_respawn_when_wall_spent(monkeypatch):
    import time as _t

    class _Dead:
        def run(self, timeout=1800):
            raise TimeoutError("daemon hung")

        class p:
            @staticmethod
            def kill():
                pass

    monkeypatch.setattr(SB, "_WALL_DEADLINE", _t.time() + 60)  # < 180 s left
    calls = []
    monkeypatch.setattr(SB, "_pool_daemon", lambda r, k: calls.append(1) or _Dead())
    SB._POOL[(4, 0)] = _Dead()
    with pytest.raises(TimeoutError, match="wall budget exhausted"):
        SB._run_once(0, 4)
    # only the initial attempt ran; the expensive respawn (warmup + rerun)
    # was refused with the wall nearly spent
    assert calls == [1]
    SB._POOL.clear()


def test_arm_wall_deadline_from_env(monkeypatch):
    import time as _t

    monkeypatch.setenv("SPARK_GRAFT_SCALE_WALL_S", "500")
    SB._arm_wall_deadline()
    assert SB._WALL_DEADLINE == pytest.approx(_t.time() + 500, abs=5)
    SB._WALL_DEADLINE = None


# ---------------------------------------------------------------------------
# scaling_bench budget reclaim after prepare/prewarm (r5)
# ---------------------------------------------------------------------------


def test_reclaimed_budget_grows_with_actual_wall_left(monkeypatch):
    import time as _t

    # caller promised 1120 s of sweeps assuming a 600 s prepare; prepare was
    # warm and 2000 s of wall remain → the child may sweep (2000-60)/1.3
    monkeypatch.setattr(SB, "_WALL_DEADLINE", _t.time() + 2000)
    assert SB._reclaimed_budget(1120) == pytest.approx((2000 - 60) / 1.3, rel=0.01)
    SB._WALL_DEADLINE = None


def test_reclaimed_budget_never_shrinks_below_env(monkeypatch):
    import time as _t

    # a slow (cold) prepare ate the wall: the env budget stands — the wall
    # clamps (_clamp_wait / the in-sweep _wall_left tier) are the guard
    monkeypatch.setattr(SB, "_WALL_DEADLINE", _t.time() + 1000)
    assert SB._reclaimed_budget(1120) == 1120
    SB._WALL_DEADLINE = None


def test_reclaimed_budget_unarmed_keeps_env_verbatim(monkeypatch):
    monkeypatch.setattr(SB, "_WALL_DEADLINE", None)
    assert SB._reclaimed_budget(1800) == 1800
