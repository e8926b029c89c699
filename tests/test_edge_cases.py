"""Robustness: degenerate experiment shapes the field actually produces."""

import numpy as np
import pytest

from circuitmap_tpu.model import Model, default_priors
from circuitmap_tpu.simulation import simulate
from circuitmap_tpu.solvers import caviar


class TestSinglePower:
    def test_one_power_level(self):
        """Single-power experiments (common in quick mapping): P=1 makes
        the PAVA gate a single-bucket mean."""
        np.random.seed(1)
        sim = simulate(N=20, trials=150, H=3, powers=[50], spont_prob=0.0,
                       gp_scale=1e-3, connection_prob=0.2, verbose=False)
        model = Model(20)
        model.fit(sim["psc"], sim["stim_matrix"], method="caviar",
                  fit_options={"iters": 10, "verbose": False})
        assert model.state["lam"].shape == (20, 150)
        assert np.all(np.isfinite(model.state["mu"]))
        # with one power the opsin curve is weakly identified, so weak
        # cells can gate off; the strong connections must still be found
        true = np.flatnonzero(sim["weights"])
        strong = true[np.argsort(sim["weights"][true])[-2:]]
        est = set(np.flatnonzero(model.state["mu"]))
        assert set(strong) <= est


class TestTinyProblems:
    def test_fewer_trials_than_neurons(self):
        np.random.seed(2)
        sim = simulate(N=30, trials=20, H=3, spont_prob=0.0, verbose=False)
        model = Model(30)
        model.fit(sim["psc"], sim["stim_matrix"], method="caviar",
                  fit_options={"iters": 5, "verbose": False, "fn_scan": False})
        assert np.all(np.isfinite(model.state["mu"]))

    def test_single_neuron(self):
        np.random.seed(3)
        sim = simulate(N=1, trials=60, H=1, connection_prob=1.0,
                       weights=np.array([15.0]), spont_prob=0.0, verbose=False)
        model = Model(1)
        model.fit(sim["psc"], sim["stim_matrix"], method="caviar",
                  fit_options={"iters": 10, "verbose": False})
        assert model.state["mu"].shape == (1,)
        assert model.state["mu"][0] > 0


class TestDegenerateTraces:
    def test_all_zero_traces(self):
        """No signal at all: everything should gate off, nothing nan."""
        N, K = 10, 80
        np.random.seed(4)
        stim = (np.random.rand(N, K) > 0.8) * 45.0
        psc = np.zeros((K, 900))
        p = default_priors(N)
        out = caviar(psc, stim, p["mu"], p["beta"], p["shape"], p["rate"],
                     p["phi"], p["phi_cov"], iters=5, verbose=False,
                     fn_scan=False)
        mu = np.asarray(out[0])
        assert np.all(np.isfinite(mu))
        assert np.all(np.asarray(out[2]) == 0.0)  # activity mask kills all

    def test_untargeted_trials_mixed_in(self):
        """Trials where nothing was stimulated must not break anything."""
        np.random.seed(5)
        sim = simulate(N=15, trials=100, H=3, spont_prob=0.0, verbose=False)
        stim = np.asarray(sim["stim_matrix"]).copy()
        stim[:, ::7] = 0.0  # blank out every 7th trial
        model = Model(15)
        model.fit(sim["psc"], stim, method="caviar",
                  fit_options={"iters": 5, "verbose": False, "fn_scan": False})
        lam = model.state["lam"]
        assert np.all(lam[:, ::7] == 0.0)
        assert np.all(np.isfinite(model.state["mu"]))


class TestSingleChipEnvelopeWarning:
    """warn_single_chip_envelope routes oversized single-chip fits to
    the sharded path before XLA's opaque 45-second RESOURCE_EXHAUSTED
    (MEMORY_CLIFF.json measured the ~6.8e8-element ceiling)."""

    def test_warns_past_cliff_on_accelerator_backends(self, monkeypatch):
        from circuitmap_tpu.solvers import _common

        monkeypatch.setattr(_common.jax, "default_backend", lambda: "tpu")
        with pytest.warns(ResourceWarning, match="single-chip envelope"):
            _common.warn_single_chip_envelope(10000, 100000, what="caviar()")

    def test_silent_below_cliff_and_on_cpu(self, monkeypatch):
        import warnings

        from circuitmap_tpu.solvers import _common

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            # CPU backend: host RAM bounds these fits, never warn
            _common.warn_single_chip_envelope(10000, 100000)
            # accelerator, bench shape: 30x under the cliff
            monkeypatch.setattr(_common.jax, "default_backend",
                                lambda: "tpu")
            _common.warn_single_chip_envelope(1000, 20000)

    def test_cliff_scales_with_fit_dtype(self, monkeypatch):
        """The cliff is a BYTE budget measured with f32 arrays: an f64
        fit must warn at half the element count (round-4 review
        finding: the preflight was dtype-blind)."""
        import warnings

        import numpy as np

        from circuitmap_tpu.solvers import _common

        monkeypatch.setattr(_common.jax, "default_backend", lambda: "tpu")
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            # 5000 x 70016 = 3.5e8 elements: fine in f32
            _common.warn_single_chip_envelope(5000, 70000,
                                              dtype=np.float32)
        with pytest.warns(ResourceWarning, match="single-chip envelope"):
            # same shape in f64 = 7e8 f32-equivalent elements
            _common.warn_single_chip_envelope(5000, 70000,
                                              dtype=np.float64)


class TestDataThinDesignWarning:
    """warn_data_thin_design flags large-N designs whose per-neuron
    stimulation count is under the measured identifiability floor
    (SCALING.json: N=5000 at 40 stims/neuron recovers 0.95, at 240 it
    recovers 0.995) — recovery bounded by the design, not the solver."""

    @staticmethod
    def _counts(n, stims_per_neuron, p=3):
        import numpy as np

        return np.full((n, p), stims_per_neuron / p, dtype=np.float64)

    def test_warns_on_thin_large_n_design(self):
        from circuitmap_tpu.solvers import _common

        with pytest.warns(_common.DataThinDesignWarning,
                          match="raise the trial count"):
            _common.warn_data_thin_design(self._counts(5000, 40), 20000,
                                          what="caviar()")

    def test_silent_on_adequate_small_or_unknown(self):
        import warnings

        from circuitmap_tpu.solvers import _common

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            # adequate large-N design (the 0.995 row)
            _common.warn_data_thin_design(self._counts(5000, 240), 60000)
            # small maps recover fine on thin designs — never nag a
            # pilot experiment (N=50/H=5 at 40 stims/neuron: R2 0.99)
            _common.warn_data_thin_design(self._counts(50, 40), 400)
            # dense upload paths have no free counts: skip, don't scan
            _common.warn_data_thin_design(None, 20000)

    def test_dense_variant_covers_prep_paths_without_counts(self,
                                                            monkeypatch):
        """warn_data_thin_design_dense serves the entries whose prep
        keeps the dense design (sharded/SnS/MBCS — review finding:
        the floor is a large-N phenomenon and large N is exactly what
        routes to the sharded path). Scaled down via the arming
        threshold so the test needs no big matrix."""
        import numpy as np

        from circuitmap_tpu.solvers import _common

        monkeypatch.setattr(_common, "_DATA_THIN_MIN_N", 20)
        stim = np.zeros((30, 600))
        stim[0, :50] = 45.0  # ~1.7 stims/neuron on average
        with pytest.warns(_common.DataThinDesignWarning):
            _common.warn_data_thin_design_dense(stim, what="caviar_sharded()")
        # k_true excludes padding columns from the report, not the mean
        with pytest.warns(_common.DataThinDesignWarning, match="512 trials"):
            _common.warn_data_thin_design_dense(stim, k_true=512,
                                                what="mbcs_sharded()")
        # adequate designs stay silent
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            dense = np.full((30, 600), 45.0)
            _common.warn_data_thin_design_dense(dense)
            _common.warn_data_thin_design_dense(stim[:10])  # small N

    def test_caviar_entry_fires_it(self):
        """The flagship entry preflights the design (thin large-N sim
        -> one DataThinDesignWarning before the fit)."""
        import numpy as np

        from circuitmap_tpu.model import default_priors
        from circuitmap_tpu.solvers import _common, caviar

        n, k = 2500, 512
        rng = np.random.default_rng(0)
        stim = np.zeros((n, k))
        tgt = rng.integers(0, n, size=(5, k))
        for h in range(5):
            stim[tgt[h], np.arange(k)] = 45.0
        psc = 0.01 * rng.standard_normal((k, 900)).astype(np.float32)
        pri = default_priors(n)
        with pytest.warns(_common.DataThinDesignWarning):
            caviar(psc, stim, pri["mu"], pri["beta"], pri["shape"],
                   pri["rate"], pri["phi"], pri["phi_cov"], iters=1,
                   verbose=False)


class TestNonUniformPowerSets:
    """A per-trial ANALOG power column (thousands of distinct levels)
    makes every per-power spike-rate estimate single-trial — the
    isotonic gate's statistics are meaningless and the [N, P] level
    machinery scales with it. The level scan rejects it actionably
    (round-5 adversarial-fixture item); a supplied powers= table or a
    realistically discrete set is untouched."""

    def test_analog_power_column_rejected(self):
        import numpy as np

        from circuitmap_tpu.solvers import _common

        rng = np.random.default_rng(0)
        stim = np.zeros((20, 3000))
        stim[0] = 40.0 + 30.0 * rng.random(3000)  # analog commands
        with pytest.raises(ValueError, match="powers="):
            _common._levels(stim)
        # the named fix works: an explicit discrete table is accepted
        ph, lv = _common._levels(stim, powers=[45.0, 55.0, 65.0])
        assert lv.size == 4
        # and a discrete derived set of any realistic size is fine
        stim_q = np.round(stim / 5.0) * 5.0
        ph, lv = _common._levels(stim_q)
        assert lv.size <= 16


class TestResumableDistributedValidation:
    def test_checkpoint_every_validated_before_cluster_setup(self):
        """checkpoint_every < 1 must raise up front — a zero segment
        would spin the whole pod in an infinite gather/save loop
        (round-4 review finding)."""
        import numpy as np

        from circuitmap_tpu.parallel.distributed import (
            caviar_resumable_distributed)

        psc = np.zeros((8, 900), np.float32)
        stim = np.zeros((4, 8), np.float32)
        z = np.zeros(4)
        with pytest.raises(ValueError, match="checkpoint_every"):
            caviar_resumable_distributed(
                psc, stim, z, z, 1.0, 0.1, np.zeros((4, 2)),
                np.tile(np.eye(2), (4, 1, 1)), "ck.npz",
                iters=4, checkpoint_every=0)
