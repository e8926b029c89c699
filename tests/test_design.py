"""Closed-loop design policy (circuitmap_tpu/design.py).

The designer is pure host-side numpy, so most tests drive it with
synthetic posteriors; the end-to-end test streams a small simulated
experiment through ``closed_loop_map`` and checks the loop actually
narrows the pool and recovers the circuit.
"""

import numpy as np
import pytest

import circuitmap_tpu as cm
from circuitmap_tpu.design import AdaptiveDesigner, closed_loop_map, pool_design
from circuitmap_tpu.utils.metrics import r2_score

POWERS = [45.0, 55.0, 65.0]


class TestPoolDesign:
    def test_shape_and_levels(self):
        np.random.seed(0)
        stim = pool_design(np.arange(10), N=40, H=5, trials=90,
                           powers=POWERS)
        assert stim.shape == (40, 90)
        assert set(np.unique(stim)) <= set(POWERS) | {0.0}

    def test_large_pool_holograms_come_from_pool(self):
        """While the pool is >= 3H, holograms are drawn wholly from it."""
        np.random.seed(0)
        pool = np.arange(5, 35)
        stim = pool_design(pool, N=100, H=5, trials=60, powers=POWERS)
        stimulated = np.flatnonzero((stim > 0).any(axis=1))
        assert np.all(np.isin(stimulated, pool))

    def test_small_pool_gets_incoherent_fillers(self):
        """A small pool takes <= H//2 spots per hologram, topped up with
        out-of-pool fillers so the optical dose stays comparable."""
        np.random.seed(0)
        pool = np.array([3, 7])
        H = 6
        stim = pool_design(pool, N=50, H=H, trials=30, powers=POWERS)
        per_trial_pool = (stim[pool] > 0).sum(axis=0)
        assert per_trial_pool.max() <= max(1, H // 2)
        rest = np.setdiff1d(np.arange(50), pool)
        assert (stim[rest] > 0).any(), "no fillers drawn"

    def test_pool_coverage_per_sweep(self):
        """Blockwise: every pool neuron is hit at max power given a
        full sweep's worth of trials."""
        np.random.seed(1)
        pool = np.arange(12)
        stim = pool_design(pool, N=24, H=4, trials=120, powers=POWERS)
        assert ((stim[pool] == max(POWERS)).sum(axis=1) > 0).all()

    def test_validation(self):
        with pytest.raises(ValueError):
            pool_design(np.array([], dtype=int), N=10, H=2, trials=5,
                        powers=POWERS)
        with pytest.raises(ValueError):
            pool_design(np.array([11]), N=10, H=2, trials=5, powers=POWERS)


class TestAdaptiveDesigner:
    def _block(self, d, neurons, trials=6):
        """A block stimulating ``neurons`` at max power every trial."""
        stim = np.zeros((d.N, trials))
        stim[np.asarray(neurons)] = max(POWERS)
        return stim

    def test_round0_is_full_blockwise(self):
        np.random.seed(0)
        d = AdaptiveDesigner(20, 4, POWERS)
        stim = d.next_design(trials=60)
        assert stim.shape == (20, 60)
        # blockwise over ALL neurons: everyone stimulated
        assert ((stim > 0).any(axis=1)).all()

    def test_null_resolution_needs_two_quiet_readouts(self):
        """Detection flicker: a neuron detected last round keeps the
        conn_trials bar even if undetected this round."""
        d = AdaptiveDesigner(4, 2, POWERS, null_trials=6, conn_trials=12)
        mu_on = np.array([1.0, 0, 0, 0])
        mu_off = np.zeros(4)
        # round 1: neuron 0 detected, 6 max-power hits on everyone
        d.observe(self._block(d, [0, 1, 2, 3], 6), {"mu": mu_on})
        # neurons 1-3 hit the null bar and resolve; 0 is detected
        assert set(d.pool) == {0}
        # round 2: neuron 0 goes quiet but was detected LAST round —
        # still held to conn_trials (12 total hits reached -> resolves)
        d.observe(self._block(d, [0], 6), {"mu": mu_off})
        assert d.resolved

    def test_observe_counts_f32_roundtripped_stim(self):
        """Rigs/HTTP clients ship stim as f32 (DEPLOY.md advice); a
        non-f32-representable power (45.7) must still count as a
        max-power hit or resolution freezes forever."""
        d = AdaptiveDesigner(3, 2, [30.1, 45.7], null_trials=4,
                             conn_trials=8)
        stim = np.zeros((3, 4))
        stim[:] = 45.7
        d.observe(stim.astype(np.float32), {"mu": np.zeros(3)})
        assert d.resolved  # 4 max-power hits each, all quiet nulls

    def test_save_load_round_trip(self, tmp_path):
        d = AdaptiveDesigner(4, 2, POWERS, null_trials=6, conn_trials=12)
        d.observe(self._block(d, [0, 1, 2, 3], 6),
                  {"mu": np.array([1.0, 0, 0, 0])})
        path = str(tmp_path / "designer.npz")
        d.save(path)
        d2 = AdaptiveDesigner.load(path)
        assert set(d2.pool) == set(d.pool)
        assert d2.rounds == d.rounds
        assert (d2.null_trials, d2.conn_trials) == (6, 12)
        np.testing.assert_array_equal(d2.maxpow_count, d.maxpow_count)
        # the restored policy continues identically
        d.observe(self._block(d, [0], 6), {"mu": np.zeros(4)})
        d2.observe(self._block(d2, [0], 6), {"mu": np.zeros(4)})
        assert d.resolved and d2.resolved

    def test_quiet_null_resolves_at_null_trials(self):
        d = AdaptiveDesigner(3, 2, POWERS, null_trials=6, conn_trials=30)
        mu_off = np.zeros(3)
        d.observe(self._block(d, [0, 1, 2], 3), {"mu": mu_off})
        assert set(d.pool) == {0, 1, 2}  # 3 < 6 hits: still open
        d.observe(self._block(d, [0, 1, 2], 3), {"mu": mu_off})
        assert d.resolved

    def test_connection_needs_conn_trials(self):
        d = AdaptiveDesigner(2, 1, POWERS, null_trials=4, conn_trials=10)
        mu = np.array([2.0, 0.0])
        d.observe(self._block(d, [0, 1], 4), {"mu": mu})
        assert set(d.pool) == {0}  # null resolved, connection not yet
        d.observe(self._block(d, [0], 6), {"mu": mu})
        assert d.resolved

    def test_next_design_after_resolution_raises(self):
        d = AdaptiveDesigner(2, 1, POWERS, null_trials=1, conn_trials=1)
        d.observe(self._block(d, [0, 1], 2), {"mu": np.zeros(2)})
        assert d.resolved
        with pytest.raises(ValueError):
            d.next_design(10)

    def test_resolution_is_sticky_under_detection_flicker(self):
        """A resolved null must NOT re-enter the pool if the detection
        gate flickers on in a later round (ADVICE r3: resolved could
        oscillate False after True and crash a loop keyed on it)."""
        d = AdaptiveDesigner(2, 1, POWERS, null_trials=4, conn_trials=20)
        # round 1: both quiet, 4 hits each -> neuron 1 & 0 resolve null
        d.observe(self._block(d, [0, 1], 4), {"mu": np.zeros(2)})
        assert d.resolved
        # round 2: gate flickers on for neuron 1 — with only 4 < 20
        # max-power hits it would re-enter a non-sticky pool
        d.observe(np.zeros((2, 3)), {"mu": np.array([0.0, 1.0])})
        assert d.resolved
        assert d.pool.size == 0
        with pytest.raises(ValueError):
            d.next_design(10)

    def test_validation(self):
        with pytest.raises(ValueError):
            AdaptiveDesigner(0, 2, POWERS)
        with pytest.raises(ValueError):
            AdaptiveDesigner(5, 2, [])
        with pytest.raises(ValueError):
            AdaptiveDesigner(5, 2, POWERS, null_trials=10, conn_trials=5)
        d = AdaptiveDesigner(5, 2, POWERS)
        with pytest.raises(ValueError):
            d.observe(np.zeros((4, 3)), {"mu": np.zeros(5)})
        with pytest.raises(ValueError):
            d.observe(np.zeros((5, 3)), {"mu": np.zeros(4)})


class TestClosedLoopMap:
    def test_end_to_end_stream(self):
        """A full closed loop on a fixed simulated circuit: the pool
        narrows, the loop stops by itself or at max_rounds, and the
        final posterior recovers the weights."""
        np.random.seed(3)
        N = 40
        pilot = cm.simulate(N=N, trials=120, H=5, connection_prob=0.1,
                            powers=POWERS, verbose=False)
        truth = {k: pilot[k] for k in
                 ("weights", "phi_0", "phi_1", "tau_r", "tau_d")}

        def acquire(stim):
            return cm.simulate(
                N=N, stim_matrix=stim, weights=truth["weights"],
                phi_0=truth["phi_0"], phi_1=truth["phi_1"],
                kernel=(truth["tau_r"], truth["tau_d"]),
                powers=POWERS, verbose=False)["psc"]

        rounds_seen = []
        post, designer, solver = closed_loop_map(
            acquire, N=N, H=5, powers=POWERS, block_trials=120,
            max_rounds=4, iters_per_round=8,
            callback=lambda r, d, p: rounds_seen.append(
                (r, int(d.pool.size))))

        assert designer.rounds == len(rounds_seen) >= 1
        assert solver.trial_count == 120 * designer.rounds
        pools = [p for _, p in rounds_seen]
        assert pools[-1] <= pools[0] <= N
        assert r2_score(truth["weights"], post["mu"]) > 0.8

    def test_demixer_path(self):
        """closed_loop_map routes raw traces through the demixer before
        the solver sees them (the rig use case)."""
        from circuitmap_tpu.demix import NeuralDemixer

        np.random.seed(5)
        N = 20
        pilot = cm.simulate(N=N, trials=60, H=4, connection_prob=0.1,
                            powers=POWERS, verbose=False)
        truth = {k: pilot[k] for k in
                 ("weights", "phi_0", "phi_1", "tau_r", "tau_d")}

        def acquire(stim):
            return cm.simulate(
                N=N, stim_matrix=stim, weights=truth["weights"],
                phi_0=truth["phi_0"], phi_1=truth["phi_1"],
                kernel=(truth["tau_r"], truth["tau_d"]),
                powers=POWERS, verbose=False)["psc"]

        inner = NeuralDemixer(path="demixers/nwd_ie_ChroME2f.npz")
        calls = []

        class CountingDemixer:
            def __call__(self, psc, **kw):
                calls.append(np.asarray(psc).shape)
                return inner(psc, **kw)

        seen = []
        post, designer, solver = closed_loop_map(
            acquire, N=N, H=4, powers=POWERS, block_trials=60,
            max_rounds=2, iters_per_round=5, demixer=CountingDemixer(),
            callback=lambda r, d, p: seen.append(r))
        assert len(seen) >= 1
        assert len(calls) == len(seen) and calls[0] == (60, 900)
        assert post["mu"].shape == (N,)

    def test_solver_kwargs_conflict(self):
        oc = cm.OnlineCaviar(10, powers=POWERS)
        with pytest.raises(ValueError):
            closed_loop_map(lambda s: np.zeros((s.shape[1], 900)), 10, 2,
                            POWERS, 10, 1, solver=oc, msrmp=0.5)

    def test_bad_acquire_shape_raises(self):
        with pytest.raises(ValueError):
            closed_loop_map(lambda s: np.zeros((3, 900)), N=10, H=2,
                            powers=POWERS, block_trials=20, max_rounds=1)


class TestDesignStudyScript:
    """scripts_tpu/design_study.py — the adaptive-vs-static policy study
    behind DESIGN_STUDY.json (and `python -m circuitmap_tpu design-study`)."""

    def test_tiny_study_end_to_end(self, tmp_path):
        import sys
        sys.path.insert(0, "/root/repo/scripts_tpu")
        import json

        import design_study

        out = tmp_path / "study.json"
        design_study.main(["--N", "24", "--H", "4", "--block", "72",
                           "--rounds", "2", "--seeds", "1",
                           "--out", str(out)])
        res = json.loads(out.read_text())
        assert res["per_seed"][0]["adaptive_rounds"] >= 1
        # the adaptive arm never spends MORE trials than the static one
        assert (res["mean_adaptive_trials"] <= res["mean_static_trials"])
        final = res["per_seed"][0]["adaptive_final"]
        assert set(final) == {"trials", "r2", "precision", "recall",
                              "unresolved"}
