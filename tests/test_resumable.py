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


def test_invalid_segmenting_rejected(sim, tmp_path):
    """checkpoint_every < 1 used to spin forever; iters < 1 crashed on
    state.mu — both now raise up front."""
    from circuitmap_tpu.solvers.resumable import caviar_resumable
    from circuitmap_tpu.model import default_priors
    import pytest

    p = default_priors(30)
    args = (sim["psc"], sim["stim_matrix"], p["mu"], p["beta"], p["shape"],
            p["rate"], p["phi"], p["phi_cov"])
    with pytest.raises(ValueError, match="checkpoint_every"):
        caviar_resumable(*args, checkpoint_path=str(tmp_path / "a"),
                         checkpoint_every=0, iters=4, verbose=False)
    with pytest.raises(ValueError, match="iters"):
        caviar_resumable(*args, checkpoint_path=str(tmp_path / "b"),
                         iters=0, verbose=False)


def test_checkpoint_save_is_atomic_replace(tmp_path):
    """save_state overwrites via temp + os.replace: the destination is
    either the old complete checkpoint or the new complete one."""
    import numpy as np
    from circuitmap_tpu.utils.checkpoint import load_state, save_state

    path = tmp_path / "state.npz"
    save_state(path, {"a": np.arange(5)})
    save_state(path, {"a": np.arange(9)})  # overwrite in place
    out = load_state(path)
    assert out["a"].shape == (9,)
    assert not list(tmp_path.glob("*.tmp*"))  # no temp litter
