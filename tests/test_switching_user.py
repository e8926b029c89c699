"""The reference README, run verbatim against circuitmap_tpu.

A reference user switching to this framework should be able to paste
the upstream README's code blocks (reference README.md:25-108) with
only the import renamed. This test executes those blocks end to end:
pretrained-demixer load (from the reference's own torch .ckpt), demix,
CAVIaR fit, the custom-priors block with its exact keys, the
fit_options block with its exact keys, and fresh-demixer training via
generate_training_data(tau_r_lower=...)/train().
"""

import numpy as np
import pytest

import circuitmap_tpu as cm
from circuitmap_tpu import NeuralDemixer

REF_CKPT = "/root/reference/demixers/nwd_ie_ChroME2f.ckpt"


@pytest.fixture(scope="module")
def user_data():
    np.random.seed(0)
    sim = cm.simulate(N=30, trials=300, H=5, verbose=False)
    return sim


def test_readme_quickstart_blocks(user_data):
    sim = user_data
    psc, stim_matrix = sim["psc"], sim["stim_matrix"]
    N = 30

    # "Load a pretrained NWD network" — reference ckpt path + device kwarg
    demix = NeuralDemixer(path=REF_CKPT, device="cpu")
    psc_dem = np.asarray(demix(psc))
    assert psc_dem.shape == psc.shape

    # "initialise and fit a statistical model using CAVIaR"
    model = cm.Model(N)
    model.fit(psc_dem, stim_matrix, method="caviar",
              fit_options={"verbose": False})
    weights = model.state["mu"]
    spikes = model.state["lam"]
    assert weights.shape == (N,) and spikes.shape[0] == N
    from circuitmap_tpu.utils.metrics import r2_score
    assert r2_score(sim["weights"], weights) > 0.9

    # "custom priors" block, exact keys
    priors = {
        "alpha": 1 / 4 * np.ones(N),
        "phi": np.c_[1e-1 * np.ones(N), 5e0 * np.ones(N)],
        "phi_cov": np.array(
            [np.array([[1e-1, 0], [0, 1e0]]) for _ in range(N)]),
        "mu": np.zeros(N),
        "beta": 1e1 * np.ones(N),
        "shape": 1.0,
        "rate": 1e-1,
    }
    model = cm.Model(N, priors=priors)

    # "fine-tuned using an optional fit_options dictionary", exact keys
    fit_options = {
        "msrmp": 0.4,
        "iters": 30,
        "minimum_spike_count": 4,
        "save_histories": True,
    }
    model.fit(psc_dem, stim_matrix, method="caviar",
              fit_options=dict(fit_options, verbose=False))
    assert model.history["mu"].shape == (30, N)


def test_readme_train_new_demixer_block():
    # "Training a new demixer" — fresh net, tailored training data
    demixer = NeuralDemixer()
    demixer.generate_training_data(
        tau_r_lower=10, tau_r_upper=40,
        tau_diff_lower=60, tau_diff_upper=120, size=120)
    demixer.train(epochs=1, verbose=False)
