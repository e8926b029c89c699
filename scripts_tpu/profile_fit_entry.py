"""Stage-by-stage wall breakdown of the bench's fit_only path on TPU.

bench.py fit_only ~0.38 s while the on-device CAVI fit is ~69 ms
(xplane) — this script attributes the remainder: tunnel RTT floor,
host prep (sparsify), per-stage dispatch + settle costs. Each stage is
timed with a forced tiny host pull (CLAUDE.md: block_until_ready on
axon can return early), so stage times INCLUDE one RTT each; the RTT
floor is measured first so it can be subtracted mentally.

Writes one JSON line per run to stdout. Run alone (nproc=1; any
concurrent python halves everything).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from circuitmap_tpu.demix import NeuralDemixer
from circuitmap_tpu.model import default_priors
from circuitmap_tpu.simulation import simulate
from circuitmap_tpu.solvers import caviar
from circuitmap_tpu.solvers._common import (
    prepare_stim_and_init, prepare_traces)
from circuitmap_tpu.solvers.caviar import (
    _run_caviar, _reconnect_and_refit_device, _resolve_laplace_impl,
    _resolve_sweep)


def settle(x):
    # slice ON DEVICE before the pull — np.asarray of the full leaf
    # would drag the whole array through the tunnel (80 MB for lam0)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)


def main():
    N, K, iters = 1000, 20000, 50
    np.random.seed(0)
    sim = simulate(N=N, trials=K, H=10, connection_prob=0.05,
                   verbose=False, batch_size=1000)
    demixer = NeuralDemixer(path="demixers/nwd_ie_ChroME2f.npz")
    priors = default_priors(N)

    dem = demixer(sim["psc"], verbose=False, keep_on_device=True,
                  transfer_dtype=np.int8)
    settle(dem)

    # RTT floor: tiny pull of an already-settled device array
    small = jnp.ones((8,))
    settle(small)
    rtts = []
    for _ in range(5):
        t0 = time.time()
        settle(small)
        rtts.append(time.time() - t0)

    dtype = jnp.float32
    timings = {}

    def run_once():
        t = {}
        t0 = time.time()
        y = prepare_traces(dem, dtype)
        # prepare_observations equivalent: active mask program
        from circuitmap_tpu.solvers.caviar import prepare_observations
        y, active = prepare_observations(y, 1e-2)
        settle(active)
        t["observations"] = time.time() - t0

        t0 = time.time()
        stim, lam_mask, lam0, stim_np, powers_np, pdev, pc = (
            prepare_stim_and_init(sim["stim_matrix"], active, dtype,
                                  powers=[45.0, 55.0, 65.0]))
        settle(lam0)
        t["stim_prep"] = time.time() - t0

        powers = jnp.asarray(pdev, dtype=dtype)
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        final, hists, elbo = _run_caviar(
            y, stim, lam0, lam_mask, powers,
            jnp.asarray(priors["mu"], dtype), jnp.asarray(priors["beta"], dtype),
            jnp.asarray(priors["shape"], dtype), jnp.asarray(priors["rate"], dtype),
            jnp.asarray(priors["phi"], dtype), jnp.asarray(priors["phi_cov"], dtype),
            key, iters=iters, num_mc_samples=100, minimum_spike_count=3,
            delay_spont_est=1, msrmp=0.3, scale_factor=0.75, penalty=5e0,
            max_backtrack_iters=20, tol=0.05, spont_orthogonality=0.1,
            analytic_mc=False, save_histories=False,
            # resolve EXACTLY like the public entry (joint resolver,
            # K-aware). Pinning sweep_impl="pallas" here once silently
            # measured the row-DMA kernel instead (an honoured explicit
            # override, +125 ms/fit of relayout + T(1,128) reduces) and
            # misattributed the bench's fit_scan stage.
            sweep_block_size=(rs := _resolve_sweep(
                "auto", "auto", k=stim.shape[1]))[0],
            sweep_impl=rs[1],
            laplace_impl=_resolve_laplace_impl("auto", dtype),
            update_order="random", track_elbo=False, elbo_tol=None,
        )
        settle(final.mu)
        t["fit_scan"] = time.time() - t0

        t0 = time.time()
        out = _reconnect_and_refit_device(
            stim, final.lam, final.mu, final.beta, final.z, powers,
            final.phi, final.phi_cov,
            jnp.asarray(priors["phi"], dtype),
            jnp.asarray(priors["phi_cov"], dtype),
            jnp.asarray(0.3, dtype), jnp.asarray(3, dtype))
        settle(out[0])
        t["reconnect"] = time.time() - t0
        return t

    run_once()  # warm/compile
    best = {}
    for _ in range(3):
        t = run_once()
        for k, v in t.items():
            best[k] = min(best.get(k, float("inf")), v)

    # whole fit for reference, same data, no staging pulls. The public
    # entry reaches steady state only on its ~3rd in-process call
    # (measured 21.3 / 8.7 / 1.2 / 0.5 s — late compiles + allocator
    # warm-up), so best-of-4 is the honest warm number.
    whole = float("inf")
    for _ in range(4):
        t0 = time.time()
        outw = caviar(dem, sim["stim_matrix"], priors["mu"], priors["beta"],
                      priors["shape"], priors["rate"], priors["phi"],
                      priors["phi_cov"], iters=iters, msrmp=0.3,
                      powers=[45.0, 55.0, 65.0], verbose=False,
                      sweep_block_size=8)
        np.asarray(outw[0][:1])
        whole = min(whole, time.time() - t0)

    print(json.dumps({
        "rtt_floor_ms": round(min(rtts) * 1e3, 1),
        "rtt_all_ms": [round(r * 1e3, 1) for r in rtts],
        "stages_best_ms": {k: round(v * 1e3, 1) for k, v in best.items()},
        "staged_sum_ms": round(sum(best.values()) * 1e3, 1),
        "whole_fit_ms": round(whole * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
