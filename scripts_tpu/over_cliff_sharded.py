"""Over-cliff sharded demonstration → OVER_CLIFF.json.

MEMORY_CLIFF.json records N=10000/K=100000 as a single-chip HBM OOM
(XLA asks 23.3 G of 15.75 G), and docs/DEPLOY.md routes users past the
cliff to the trial-sharded solvers. This script makes that promise a
measurement instead of an extrapolation, on the 8-device virtual CPU
mesh (the same SPMD program a TPU slice runs; 126 GB host RAM stands
in for 8 chips' HBM):

  leg A ("memory"): caviar_sharded at the EXACT recorded OOM shape —
    N=10000, K=100000, reduced iters — executes end-to-end; records
    wall time, process peak RSS, and the per-device shard bytes
    ([.., K/8] partitioning of every trial-axis array).
  leg B ("recovery"): an over-cliff shape (N=2500, K=300000 →
    N·K_pad = 7.5e8 > the 6.8e8-element cliff) fit long enough to
    resolve a simulated circuit; records weight-recovery R².

Trials are synthesised at the CHARGE level (the solvers' observation
is trapz over each trace; a [K, 2] column pair (y, y) integrates to
exactly y) through the hologram structure — O(H·K) host work, no
[K, 900] trace block and no dense [N, K] intermediate on the host.

Run: python scripts_tpu/over_cliff_sharded.py [--quick]
"""

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_charge_experiment(N, K, H=10, seed=0, connection_prob=0.05):
    """Charge-level simulated mapping experiment (no dense [N, K]).

    Returns (psc2 [K, 2] whose trapz is the charge, stim [N, K] f32
    built column-sparse, weights [N]). Spiking follows a saturating
    power curve; charges add per-target contributions plus gaussian
    noise — the generative structure the solvers model, at the
    observation level they actually consume.
    """
    rng = np.random.default_rng(seed)
    w = np.zeros(N)
    conn = rng.random(N) < connection_prob
    w[conn] = rng.uniform(5.0, 35.0, conn.sum())
    powers = np.array([45.0, 55.0, 65.0])
    tgt = rng.integers(0, N, size=(H, K))
    pw = rng.choice(powers, size=K)
    p_spike = 1.0 / (1.0 + np.exp(-(0.12 * pw - 5.0)))  # ~0.6-0.9
    spk = rng.random((H, K)) < p_spike[None, :]
    y = (w[tgt] * spk).sum(axis=0) + 0.5 * rng.standard_normal(K)
    stim = np.zeros((N, K), dtype=np.float32)
    for h in range(H):
        stim[tgt[h], np.arange(K)] = pw
    psc2 = np.stack([y, y], axis=1).astype(np.float32)  # trapz == y
    return psc2, stim, w


def run_leg(N, K, iters, mesh, seed=0):
    from circuitmap_tpu.model import default_priors
    from circuitmap_tpu.parallel.sharded import caviar_sharded
    from circuitmap_tpu.utils.metrics import r2_score

    t0 = time.time()
    psc2, stim, w = synth_charge_experiment(N, K, seed=seed)
    t_sim = time.time() - t0
    pri = default_priors(N)
    t0 = time.time()
    out = caviar_sharded(
        psc2, stim, pri["mu"], pri["beta"], pri["shape"], pri["rate"],
        pri["phi"], pri["phi_cov"], mesh, iters=iters, verbose=False,
        powers=[45.0, 55.0, 65.0], msrmp=0.3)
    mu = np.asarray(out[0])
    wall = time.time() - t0
    assert np.isfinite(mu).all()
    k_pad = -(-K // 128) * 128
    return dict(
        N=N, K=K, iters=iters,
        elements_nk=int(N) * k_pad,
        over_cliff=bool(N * k_pad > 6.8e8),
        sim_s=round(t_sim, 1), fit_wall_s=round(wall, 1),
        per_device_nk_shard_mb=round(N * (k_pad // 8) * 4 / 1e6, 1),
        peak_rss_gb=round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
        r2=round(float(r2_score(w, mu)), 4),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny shapes to smoke the harness")
    ap.add_argument("--out", default=os.path.join(REPO, "OVER_CLIFF.json"))
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from circuitmap_tpu.parallel.mesh import trial_mesh

    mesh = trial_mesh(8)
    legs = ([(100, 2000, 3), (50, 1500, 3)] if args.quick
            else [(2500, 300000, 15),     # recovery, over-cliff
                  (10000, 100000, 2)])    # the recorded OOM shape
    rows = []
    for N, K, iters in legs:
        row = run_leg(N, K, iters, mesh)
        rows.append(row)
        print(json.dumps(row), flush=True)
        payload = dict(mesh_devices=8, backend="cpu (virtual mesh)",
                       cliff_elements=6.8e8, results=rows)
        with open(args.out + ".tmp", "w") as fh:
            json.dump(payload, fh, indent=1)
            fh.write("\n")
        os.replace(args.out + ".tmp", args.out)


if __name__ == "__main__":
    main()
