"""Segmented/checkpointed CAVIaR must match the single-scan fit exactly."""

import numpy as np
import pytest

from circuitmap_tpu.model import default_priors
from circuitmap_tpu.simulation import simulate
from circuitmap_tpu.solvers import caviar, caviar_resumable


@pytest.fixture(scope="module")
def sim():
    np.random.seed(11)
    return simulate(N=30, trials=300, H=3, connection_prob=0.1,
                    spont_prob=0.01, gp_scale=1e-3, verbose=False)


def _args(sim):
    p = default_priors(30)
    return (sim["psc"], sim["stim_matrix"], p["mu"], p["beta"], p["shape"],
            p["rate"], p["phi"], p["phi_cov"])


def test_segmented_matches_single_scan(sim, tmp_path):
    kw = dict(iters=12, seed=3, verbose=False, fn_scan=False, analytic_mc=True)
    single = caviar(*_args(sim), **kw)
    ck = str(tmp_path / "fit.npz")
    seg = caviar_resumable(*_args(sim), checkpoint_path=ck,
                           checkpoint_every=5, **kw)
    np.testing.assert_allclose(np.asarray(single[0]), np.asarray(seg[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(single[2]), np.asarray(seg[2]),
                               rtol=1e-5, atol=1e-6)


def test_resume_from_partial(sim, tmp_path):
    kw = dict(seed=3, verbose=False, fn_scan=False, analytic_mc=True)
    ck = str(tmp_path / "fit.npz")
    # run only the first 5 iterations, "preempt", then resume to 12
    caviar_resumable(*_args(sim), checkpoint_path=ck, iters=5,
                     checkpoint_every=5, **kw)
    resumed = caviar_resumable(*_args(sim), checkpoint_path=ck, iters=12,
                               checkpoint_every=5, **kw)
    single = caviar(*_args(sim), iters=12, **kw)
    np.testing.assert_allclose(np.asarray(single[0]), np.asarray(resumed[0]),
                               rtol=1e-5, atol=1e-6)


def test_resume_without_npz_suffix(sim, tmp_path):
    """Suffix-less checkpoint paths must still resume (np.savez appends
    .npz; regression: the resume check looked for the bare path)."""
    kw = dict(seed=3, verbose=False, fn_scan=False, analytic_mc=True)
    ck = str(tmp_path / "fit_ckpt")  # no .npz
    caviar_resumable(*_args(sim), checkpoint_path=ck, iters=5,
                     checkpoint_every=5, **kw)
    import os
    assert os.path.exists(ck + ".npz")
    resumed = caviar_resumable(*_args(sim), checkpoint_path=ck, iters=12,
                               checkpoint_every=5, **kw)
    single = caviar(*_args(sim), iters=12, **kw)
    np.testing.assert_allclose(np.asarray(single[0]), np.asarray(resumed[0]),
                               rtol=1e-5, atol=1e-6)
