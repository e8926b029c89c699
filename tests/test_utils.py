"""Tests for IO, checkpointing, metrics, profiling, and viz."""

import json

import numpy as np
import pytest
import matplotlib

matplotlib.use("Agg")

from circuitmap_tpu.utils.io import load_experiment, export_state
from circuitmap_tpu.utils.checkpoint import save_state, load_state
from circuitmap_tpu.utils.metrics import (
    r2_score,
    correlation,
    precision_recall_connections,
)
from circuitmap_tpu.utils.profiling import Metrics
from circuitmap_tpu.viz import (
    plot_checkerboard,
    cell_order_from_weights,
    plot_spike_inference_comparison,
)


class TestMetrics:
    def test_r2_perfect_and_mean(self, rng):
        y = rng.normal(size=50)
        assert r2_score(y, y) == 1.0
        assert abs(r2_score(y, np.full_like(y, y.mean()))) < 1e-12

    def test_r2_2d_matches_sklearn_uniform_average(self, rng):
        """sklearn's default multioutput='uniform_average' averages
        per-column R2; pooling residuals differs whenever columns have
        unequal variance (round-4 review finding — the docstring
        claimed sklearn semantics while pooling)."""
        y = np.column_stack([rng.normal(size=40),
                             100.0 * rng.normal(size=40)])
        pred = y + np.column_stack([np.full(40, 0.5), np.zeros(40)])
        per_col = [
            1 - np.sum((y[:, j] - pred[:, j]) ** 2)
            / np.sum((y[:, j] - y[:, j].mean()) ** 2)
            for j in range(2)
        ]
        assert abs(r2_score(y, pred) - np.mean(per_col)) < 1e-12
        # pooled would be ~1.0 here (column 1 dominates the variance);
        # the uniform average must feel column 0's error
        assert r2_score(y, pred) < 0.999

    def test_correlation(self, rng):
        a = rng.normal(size=100)
        assert abs(correlation(a, 2 * a + 1) - 1.0) < 1e-9
        assert correlation(a, np.zeros(100)) == 0.0

    def test_precision_recall(self):
        w_true = np.array([0, 1.0, 2.0, 0])
        w_est = np.array([0, 1.1, 0, 3.0])
        p, r = precision_recall_connections(w_true, w_est)
        assert p == 0.5 and r == 0.5


class TestIO:
    def test_npz_roundtrip(self, tmp_path, rng):
        psc = rng.normal(size=(20, 900))
        stim = rng.normal(size=(10, 20))
        path = tmp_path / "expt.npz"
        np.savez(path, psc=psc, stimulus_matrix=stim)
        p2, s2 = load_experiment(path)
        np.testing.assert_allclose(p2, psc)
        np.testing.assert_allclose(s2, stim)

    def test_mat_roundtrip(self, tmp_path, rng):
        from scipy.io import savemat

        psc = rng.normal(size=(5, 30))
        stim = rng.normal(size=(4, 5))
        path = str(tmp_path / "expt.mat")
        savemat(path, {"psc": psc, "stimulus_matrix": stim})
        p2, s2 = load_experiment(path)
        np.testing.assert_allclose(p2, psc)

    def test_mat_v73_hdf5_matlab_layout(self, tmp_path, rng):
        """MATLAB v7.3 .mat files are HDF5 containers storing arrays
        column-major (transposed from h5py's view); load_experiment
        must detect them by magic bytes — scipy.loadmat cannot read
        them — and undo the transpose (VERDICT r3 missing item #1,
        reference run_circuitmap_main.py:22-32)."""
        import h5py

        psc = rng.normal(size=(40, 900))
        stim = rng.normal(size=(7, 40))
        path = str(tmp_path / "expt_v73.mat")
        with h5py.File(path, "w") as f:  # MATLAB writes the transpose
            f["psc"] = psc.T
            f["stimulus_matrix"] = stim.T
        from scipy.io import loadmat

        # proves this file NEEDS the h5py path (scipy raises
        # NotImplementedError on true v7.3 headers, ValueError on a
        # bare-HDF5 container — either way it cannot read it)
        with pytest.raises((NotImplementedError, ValueError)):
            loadmat(path)
        p2, s2 = load_experiment(path)
        np.testing.assert_allclose(p2, psc)
        np.testing.assert_allclose(s2, stim)

    def test_hdf5_row_major_and_h5_extension(self, tmp_path, rng):
        """A file written by h5py itself (row-major, .h5 extension)
        must load un-transposed — orientation is reconciled from the
        shared trial axis, not assumed."""
        import h5py

        psc = rng.normal(size=(40, 900))
        stim = rng.normal(size=(7, 40))
        path = str(tmp_path / "expt.h5")
        with h5py.File(path, "w") as f:
            f["psc"] = psc
            f["stimulus_matrix"] = stim
        p2, s2 = load_experiment(path)
        np.testing.assert_allclose(p2, psc)
        np.testing.assert_allclose(s2, stim)

    def test_hdf5_missing_key_and_bad_axes(self, tmp_path, rng):
        import h5py

        path = str(tmp_path / "bad.h5")
        with h5py.File(path, "w") as f:
            f["psc"] = rng.normal(size=(10, 900))
        with pytest.raises(KeyError, match="stimulus_matrix"):
            load_experiment(path)
        path2 = str(tmp_path / "bad2.h5")
        with h5py.File(path2, "w") as f:
            f["psc"] = rng.normal(size=(10, 900))
            f["stimulus_matrix"] = rng.normal(size=(7, 13))
        with pytest.raises(ValueError, match="trial"):
            load_experiment(path2)

    def test_genuine_matlab_v73_userblock_layout(self, tmp_path, rng):
        """A file MATLAB ITSELF writes is not bare HDF5: -v7.3 puts a
        512-byte text userblock first and the HDF5 superblock at
        offset 512. The magic-byte probe must scan the spec's legal
        offsets — probing only offset 0 routed genuine MATLAB exports
        to scipy.loadmat, which raises NotImplementedError on them
        (round-5 adversarial-fixture finding)."""
        import h5py

        psc = rng.normal(size=(40, 900))
        stim = rng.normal(size=(7, 40))
        path = str(tmp_path / "genuine_v73.mat")
        with h5py.File(path, "w", userblock_size=512) as f:
            d1 = f.create_dataset("psc", data=psc.T)  # column-major
            d2 = f.create_dataset("stimulus_matrix", data=stim.T)
            for d in (d1, d2):  # the attrs MATLAB stamps
                d.attrs["MATLAB_class"] = np.bytes_(b"double")
        header = (b"MATLAB 7.3 MAT-file, Platform: GLNXA64, Created "
                  b"on: Thu Aug 20 12:00:00 2026 HDF5 schema 1.00 .")
        with open(path, "r+b") as fh:  # the textual userblock
            fh.write(header.ljust(116, b" ")
                     + b"\x00" * 9 + b"IM" + b"\x00" * (512 - 127))
        with open(path, "rb") as fh:  # layout sanity: magic NOT at 0
            assert fh.read(8) != b"\x89HDF\r\n\x1a\n"
        p2, s2 = load_experiment(path)
        np.testing.assert_allclose(p2, psc)
        np.testing.assert_allclose(s2, stim)

    def test_integer_adc_traces_cast(self, tmp_path, rng):
        """int16/uint16 raw rig traces (ADC counts) load and cast to
        float — pinned so a future dtype-strict refactor can't break
        real acquisition exports."""
        psc = (rng.normal(size=(20, 900)) * 1000).astype(np.int16)
        stim = np.zeros((5, 20), dtype=np.uint16)
        stim[0, :] = 45
        path = tmp_path / "adc.npz"
        np.savez(path, psc=psc, stimulus_matrix=stim)
        p2, s2 = load_experiment(path)
        assert p2.dtype == np.float64 and s2.dtype == np.float64
        np.testing.assert_allclose(p2, psc.astype(float))
        np.testing.assert_allclose(s2, stim.astype(float))

    def test_nonfinite_psc_raise_drop_zero(self, tmp_path, rng):
        psc = rng.normal(size=(20, 50))
        psc[3, 10] = np.nan
        psc[7, :] = np.inf
        stim = rng.random((5, 20))
        path = tmp_path / "nan.npz"
        np.savez(path, psc=psc, stimulus_matrix=stim)
        with pytest.raises(ValueError, match="on_nonfinite"):
            load_experiment(path)
        with pytest.warns(UserWarning, match="dropping 2 trials"):
            p2, s2 = load_experiment(path, on_nonfinite="drop")
        assert p2.shape == (18, 50) and s2.shape == (5, 18)
        assert np.isfinite(p2).all()
        with pytest.warns(UserWarning, match="zeroing"):
            p3, s3 = load_experiment(path, on_nonfinite="zero")
        assert p3.shape == (20, 50)
        assert p3[3, 10] == 0.0 and (p3[7] == 0.0).all()
        assert np.isfinite(p3).all()

    def test_nonfinite_stim_always_raises(self, tmp_path, rng):
        """A NaN power level is file corruption, not recording noise —
        no repair mode applies."""
        psc = rng.normal(size=(20, 50))
        stim = rng.random((5, 20))
        stim[2, 4] = np.nan
        path = tmp_path / "nanstim.npz"
        np.savez(path, psc=psc, stimulus_matrix=stim)
        for mode in ("raise", "drop", "zero"):
            with pytest.raises(ValueError, match="corrupt"):
                load_experiment(path, on_nonfinite=mode)

    def test_trailing_partial_trials(self, tmp_path, rng):
        """An interrupted acquisition records the design for the full
        protocol but traces only up to the stop: small trial-count
        mismatches raise naming trim_trailing=True, which keeps the
        common prefix (with a warning)."""
        psc = rng.normal(size=(197, 60))  # stopped 3 trials short
        stim = rng.random((5, 200))
        path = tmp_path / "partial.npz"
        np.savez(path, psc=psc, stimulus_matrix=stim)
        with pytest.raises(ValueError, match="trim_trailing"):
            load_experiment(path)
        with pytest.warns(UserWarning, match="common first 197"):
            p2, s2 = load_experiment(path, trim_trailing=True)
        assert p2.shape == (197, 60) and s2.shape == (5, 197)
        np.testing.assert_allclose(s2, stim[:, :197])
        # a LARGE mismatch is a wrong file pairing, never a trim
        np.savez(tmp_path / "wrong.npz", psc=psc[:100],
                 stimulus_matrix=stim)
        with pytest.raises(ValueError, match="no common trial count"):
            load_experiment(tmp_path / "wrong.npz", trim_trailing=True)
        # AMBIGUOUS near-matches refuse like the exact path (review
        # finding): psc [100, 10] / stim [5, 104] nearly matches both
        # as-stored (100~104) and transposed (10~5) — never guess
        np.savez(tmp_path / "ambig.npz",
                 psc=rng.normal(size=(100, 10)),
                 stimulus_matrix=rng.random((5, 104)))
        with pytest.raises(ValueError, match="ambiguous orientation"):
            load_experiment(tmp_path / "ambig.npz", trim_trailing=True)

    def test_export_state(self, tmp_path, rng):
        state = {
            "mu": rng.normal(size=8),
            "beta": rng.random(8),
            "lam": rng.random((8, 20)),
        }
        written = export_state(tmp_path, "expt1", state)
        assert len(written) == 2
        loaded = np.load(written[1])
        np.testing.assert_allclose(loaded["weights"], state["mu"])
        from scipy.io import loadmat

        m = loadmat(written[0])
        np.testing.assert_allclose(m["spikes"], state["lam"])


class TestCheckpoint:
    def test_nested_roundtrip(self, tmp_path, rng):
        tree = {
            "solver": {"mu": rng.normal(size=5), "lam": rng.random((5, 9))},
            "iter": np.asarray(7),
            "histories": None,
        }
        path = tmp_path / "ckpt.npz"
        save_state(path, tree)
        back = load_state(path)
        np.testing.assert_allclose(back["solver"]["mu"], tree["solver"]["mu"])
        np.testing.assert_allclose(back["solver"]["lam"], tree["solver"]["lam"])
        assert back["iter"] == 7
        assert back["histories"] is None

    def test_namedtuple_state(self, tmp_path):
        from circuitmap_tpu.solvers.caviar import CaviarState
        import jax.numpy as jnp
        import jax

        st = CaviarState(
            mu=jnp.zeros(3), beta=jnp.ones(3), lam=jnp.zeros((3, 4)),
            shape=jnp.asarray(1.0), rate=jnp.asarray(0.1),
            phi=jnp.zeros((3, 2)), phi_cov=jnp.zeros((3, 2, 2)),
            z=jnp.zeros(4), spont_rate=jnp.zeros(()),
            key=jax.random.PRNGKey(0),
        )
        path = tmp_path / "solver.npz"
        save_state(path, st)
        back = load_state(path)
        assert back["lam"].shape == (3, 4)
        assert back["key"].shape == (2,)


class TestProfiling:
    def test_metrics_spans(self, tmp_path):
        m = Metrics()
        with m.span("fit", method="caviar"):
            pass
        m.log("r2", value=0.99)
        lines = m.dump(tmp_path / "metrics.jsonl")
        assert len(lines) == 2
        rec = json.loads(lines[0])
        assert rec["name"] == "fit" and rec["seconds"] >= 0
        assert (tmp_path / "metrics.jsonl").exists()


class TestViz:
    def _fake_state(self, rng, N=6, K=40):
        stim = np.zeros((N, K))
        for k in range(K):
            stim[rng.choice(N, 2, replace=False), k] = rng.choice([45.0, 65.0])
        return stim, {
            "mu": rng.random(N) * (rng.random(N) > 0.5),
            "lam": rng.random((N, K)) * (stim > 0),
            "z": (rng.random(K) > 0.9) * rng.random(K),
        }

    def test_cell_order(self):
        order = cell_order_from_weights([np.array([0, 3.0, 1.0, 0.0])])
        assert list(order[:2]) == [1, 2]
        assert sorted(order) == [0, 1, 2, 3]


    def test_cell_order_reference_keyword(self):
        """get_cell_order(weights=...) — the reference spelling."""
        from circuitmap_tpu.viz import get_cell_order

        order = get_cell_order(weights=[np.array([0.0, -4.0, -1.5])])
        # reference viz.py:183-191 sorts by RAW value descending
        assert list(order) == [2, 1, 0]

    def test_small_circuit_default_rows(self, tmp_path, rng):
        """n_plots defaults past N: clamp instead of the reference's
        order[m] IndexError (reference viz.py:62)."""
        stim, state = self._fake_state(rng)  # N=6 < default n_plots=15
        psc = np.abs(rng.normal(size=(40, 900)))
        fig = plot_checkerboard(
            psc, stim, state, max_trials_to_show=6, fig_width=8,
            save=str(tmp_path / "cb_small.png"),
        )
        assert (tmp_path / "cb_small.png").exists()
        fig2 = plot_spike_inference_comparison(
            [psc], [stim], [state], max_trials_to_show=4,
            save=str(tmp_path / "cmp_small.png"),
        )
        assert (tmp_path / "cmp_small.png").exists()
        import matplotlib.pyplot as plt

        plt.close(fig)
        plt.close(fig2)

    def test_checkerboard_renders(self, tmp_path, rng):
        stim, state = self._fake_state(rng)
        psc = np.abs(rng.normal(size=(40, 900)))
        fig = plot_checkerboard(
            psc, stim, state, n_plots=4, max_trials_to_show=6,
            save=str(tmp_path / "cb.png"), fig_width=8,
        )
        assert (tmp_path / "cb.png").exists()
        import matplotlib.pyplot as plt

        plt.close(fig)

    def test_checkerboard_reference_kwargs(self, tmp_path, rng):
        """The reference-parity kwargs (annotate_spikes, sdevs, labels,
        append_last_row, facecol/edgecol — reference viz.py:4-7) render."""
        stim, state = self._fake_state(rng)
        psc = np.abs(rng.normal(size=(40, 900)))
        true_spikes = (rng.random((6, 40)) > 0.7).astype(float) * (stim > 0)
        fig = plot_checkerboard(
            psc, stim, state, n_plots=4, max_trials_to_show=6, fig_width=8,
            annotate_spikes=True, true_spikes=true_spikes,
            true_weights=state["mu"], sdevs=rng.random(40),
            labels=np.arange(4), append_last_row=True,
            facecol="salmon", edgecol="k", hspace=0.4, ylabelpad=0.02,
            save=str(tmp_path / "cb_kwargs.png"),
        )
        assert (tmp_path / "cb_kwargs.png").exists()
        # 4 rows + spacer + appended reference row
        assert len(fig.axes) == 6
        import matplotlib.pyplot as plt

        plt.close(fig)

    def test_comparison_renders(self, tmp_path, rng):
        stim, state = self._fake_state(rng)
        psc = np.abs(rng.normal(size=(40, 900)))
        fig = plot_spike_inference_comparison(
            [psc, psc], [stim, stim], [state, state], titles=["a", "b"],
            n_plots=3, max_trials_to_show=4, save=str(tmp_path / "cmp.png"),
            col_widths=[7.5, 5.0], row_height=0.5, lp_cell=1,
        )
        assert (tmp_path / "cmp.png").exists()
        import matplotlib.pyplot as plt

        plt.close(fig)

    def test_checkerboard_trial_subset_without_z(self, rng):
        """trials= with a state lacking z/lam (cavi_sns has no z; cosamp
        has neither) must render — regression: the z default was built
        from the already-subset psc and re-indexed with trials."""
        stim, state = self._fake_state(rng)
        state.pop("z", None)
        state.pop("lam", None)
        psc = np.abs(rng.normal(size=(40, 900)))
        trials = np.arange(25, 40)  # indices above len(trials): the trap
        fig = plot_checkerboard(psc, stim, state, n_plots=3,
                                max_trials_to_show=4, fig_width=8,
                                trials=trials, wspace=0.02,
                                spike_thresh=0.05)
        import matplotlib.pyplot as plt

        plt.close(fig)


class TestOrientationAmbiguity:
    def test_square_coincidence_raises(self):
        """N == T (e.g. 900 neurons, 900 samples): a MATLAB-transposed
        pair ALSO satisfies the as-stored shape check — undecidable
        from shapes, so load must refuse rather than feed a time axis
        to the fit as trials."""
        import pytest
        from circuitmap_tpu.utils.io import _reconcile_orientation

        psc_t = np.zeros((900, 40))   # [T, K] (transposed)
        stim_t = np.zeros((40, 900))  # [K, N] (transposed), N == T
        with pytest.raises(ValueError, match="ambiguous"):
            _reconcile_orientation(psc_t, stim_t)

    def test_unambiguous_layouts_still_resolve(self):
        from circuitmap_tpu.utils.io import _reconcile_orientation

        psc = np.zeros((40, 900))
        stim = np.zeros((25, 40))
        for p_in, s_in in [(psc, stim), (psc.T, stim.T),
                           (psc.T, stim), (psc, stim.T)]:
            p, s = _reconcile_orientation(p_in, s_in)
            assert p.shape == (40, 900) and s.shape == (25, 40)

    def test_square_stim_keeps_as_stored(self):
        # K == N square stim: content-ambiguous but shape-consistent —
        # must NOT raise (correctly-saved square designs are legal)
        from circuitmap_tpu.utils.io import _reconcile_orientation

        psc = np.zeros((40, 900))
        stim = np.arange(1600.).reshape(40, 40)
        p, s = _reconcile_orientation(psc, stim)
        np.testing.assert_array_equal(s, stim)
