"""Variance-reduced flagship-scale parity vs the reference (VERDICT #1).

The round-2 measurement (BASELINE_MEASURED config 2) showed cross-impl
weight R^2 = 0.953 at N=1000/K=10000 against the 0.99 North-star bar,
with the defence — it's the MC estimator's sampling dither — plausible
but unproven. This script removes the dither entirely and re-measures:

  * Estimator: both sides use the EXACT truncated-normal mean instead
    of the 100-sample MC estimate. This is a faithful substitution, not
    an approximation: the reference's MC integrand
    ``log(sigmoid(x)/(1-sigmoid(x)))`` is exactly ``x`` (the logit of a
    sigmoid is the identity, reference caviar.py:228-231), so its MC
    estimate converges to precisely this mean. Ours: analytic_mc=True
    (ops/truncnorm.truncated_normal_mean). Reference: the shim's copy of
    caviar.py is patched to the same closed form before import.
  * Update order: both sides sweep coordinates in identity order
    (ours: update_order="identity"; reference: update_order patched to
    jnp.arange(N)). CAVI trajectories depend on coordinate order, so
    random per-seed permutations are the second dither source.
  * Precision: both sides float64 (the reference hard-enables x64;
    ours passes dtype=float64 — exercising the round-3 f64 device-powers
    fix).

With both knobs pinned, BOTH FITS ARE FULLY DETERMINISTIC. Any residual
disagreement is genuine implementation divergence (reduction order,
Laplace-Newton arithmetic), not sampling noise — this is the strongest
attribution the estimator allows, stronger than multi-seed averaging.

Usage:
  python scripts_tpu/parity_variance_reduced.py --sanity   # N=200 quick check
  python scripts_tpu/parity_variance_reduced.py            # flagship N=1000/K=10000
Writes PARITY_VR.json (and merges the flagship row into
BASELINE_MEASURED.json as config "2vr").
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/circuitmap/optimise"
OUR_CKPT = os.path.join(REPO, "demixers", "nwd_ie_ChroME2f.npz")

# the reference's MC estimator block (caviar.py:209-215) and its random
# update order (caviar.py:196), replaced by the deterministic forms.
_MC_BLOCK = (
    "\t\t# sample truncated normals\n"
    "\t\tkey, key_next = jax.random.split(key)\n"
    "\t\tu = jax.random.uniform(key, [num_mc_samples, 2])\n"
    "\t\tmean, sdev = phi[n], jnp.diag(phi_cov[n])\n"
    "\t\tmc_samps = ndtri(ndtr(-mean/sdev) + u * (1 - ndtr(-mean/sdev)))"
    " * sdev + mean\n"
    "\n"
    "\t\t# monte carlo approximation of expectation\n"
    "\t\tmcE = jnp.mean(_vmap_eval_lam_update_monte_carlo(I[n],"
    " mc_samps[:, 0], mc_samps[:, 1]), 0)\n"
)
_ANALYTIC_BLOCK = """\
\t\t# exact truncated-normal mean (the MC estimator's own limit):
\t\t# E[logit(sigmoid(phi0*I - phi1))] = E[phi0]*I - E[phi1]
\t\tkey, key_next = jax.random.split(key)
\t\tmean, sdev = phi[n], jnp.diag(phi_cov[n])
\t\t_alpha = -mean / sdev
\t\t_tmean = mean + sdev * jnp.exp(-0.5 * _alpha**2) / jnp.sqrt(2 * jnp.pi) / (1 - ndtr(_alpha))
\t\tmcE = _tmean[0] * I[n] - _tmean[1]
"""
_ORDER_LINE = "\tupdate_order = jax.random.choice(key, N, [N], replace=False)\n"
_ORDER_FIXED = "\tupdate_order = jnp.arange(N)\n"

# CAVI-SnS variance-reduction patch (reference cavi_sns.py): its
# update_lam MC estimator block is TEXTUALLY IDENTICAL to caviar's
# (the reference repeats the code), so _MC_BLOCK/_ANALYTIC_BLOCK are
# reused; its three randomized sweep orders (update_mu/update_alpha/
# update_lam, cavi_sns.py:77/115/134) carry a trailing comment; and the
# shipped file is unrunnable as-is (update_lam's loop body unpacks the
# key as ``current_key`` but reads ``key`` — the same evident one-line
# fix the parity suite's oracle applies).
_SNS_ORDER_LINE = ("\tupdate_order = jax.random.choice(key, N, [N], "
                   "replace=False) # randomize update order\n")
_SNS_KEY_BUG = "\t\tlam_vector, current_key = carry\n"
_SNS_KEY_FIX = "\t\tlam_vector, key = carry\n"


def load_patched_reference_sns():
    """Import the reference cavi_sns with MC → exact mean, identity
    orders, and the key-unpacking fix applied — fully deterministic."""
    root = tempfile.mkdtemp(prefix="refshim_vr_sns_")
    pkg = os.path.join(root, "ref_optimise_vr_sns")
    os.makedirs(pkg)
    open(os.path.join(pkg, "__init__.py"), "w").write("")
    shutil.copy(os.path.join(REF, "cavi_sns.py"),
                os.path.join(pkg, "cavi_sns.py"))
    path = os.path.join(pkg, "cavi_sns.py")
    src = open(path).read()
    assert _MC_BLOCK in src, "reference SnS MC block not found — stale"
    assert src.count(_SNS_ORDER_LINE) == 3, \
        "reference SnS order lines moved — patch stale"
    assert _SNS_KEY_BUG in src, "reference SnS key bug line moved"
    src = src.replace(_SNS_KEY_BUG, _SNS_KEY_FIX)
    src = src.replace(_MC_BLOCK, _ANALYTIC_BLOCK)
    src = src.replace(_SNS_ORDER_LINE, _ORDER_FIXED)
    open(path, "w").write(src)
    sys.path.insert(0, root)
    import ref_optimise_vr_sns.cavi_sns as ref_sns
    return ref_sns


def load_patched_reference():
    root = tempfile.mkdtemp(prefix="refshim_vr_")
    pkg = os.path.join(root, "ref_optimise_vr")
    os.makedirs(pkg)
    open(os.path.join(pkg, "__init__.py"), "w").write("")
    for f in ("caviar.py", "pava.py"):
        shutil.copy(os.path.join(REF, f), os.path.join(pkg, f))
    path = os.path.join(pkg, "caviar.py")
    src = open(path).read()
    assert _MC_BLOCK in src, "reference MC block not found — patch stale"
    assert _ORDER_LINE in src, "reference order line not found — patch stale"
    src = src.replace(_MC_BLOCK, _ANALYTIC_BLOCK)
    src = src.replace(_ORDER_LINE, _ORDER_FIXED)
    open(path, "w").write(src)
    sys.path.insert(0, root)
    import ref_optimise_vr.caviar as ref_caviar
    return ref_caviar


def run_config(ref_caviar, N, K, iters, seed_data):
    from circuitmap_tpu.demix import NeuralDemixer
    from circuitmap_tpu.model import default_priors
    from circuitmap_tpu.simulation import simulate
    from circuitmap_tpu.solvers import caviar
    from circuitmap_tpu.utils.metrics import r2_score
    import jax.numpy as jnp

    np.random.seed(seed_data)
    sim = simulate(N=N, trials=K, H=10, connection_prob=0.05, verbose=False)
    demixed = np.asarray(
        NeuralDemixer(OUR_CKPT)(sim["psc"], verbose=False), np.float64)
    p = default_priors(N)
    args = (demixed, sim["stim_matrix"], p["mu"], p["beta"], p["shape"],
            p["rate"], p["phi"], p["phi_cov"])

    t0 = time.time()
    ref = ref_caviar.caviar(*args, iters=iters, msrmp=0.3, seed=0,
                            fn_scan=False)
    t_ref = time.time() - t0
    print(f"  reference deterministic fit: {t_ref:.1f}s", flush=True)

    t0 = time.time()
    ours = caviar(*args, iters=iters, msrmp=0.3, seed=0, fn_scan=False,
                  verbose=False, analytic_mc=True, update_order="identity",
                  dtype=jnp.float64)
    t_ours = time.time() - t0
    print(f"  ours deterministic fit: {t_ours:.1f}s", flush=True)

    mu_ref, mu_ours = np.asarray(ref[0]), np.asarray(ours[0])
    lam_ref, lam_ours = np.asarray(ref[2]), np.asarray(ours[2])
    sa, sb = set(np.flatnonzero(mu_ref)), set(np.flatnonzero(mu_ours))
    both = sorted(sa & sb)
    row = {
        "config": (f"CAVIaR deterministic parity (analytic estimator + "
                   f"identity order, f64 both sides), N={N} K={K}"),
        "iters": iters,
        "mu_r2_vs_reference": r2_score(mu_ref, mu_ours),
        "mu_r2_on_shared_support": r2_score(mu_ref[both], mu_ours[both])
        if both else None,
        "lam_max_abs_diff_on_shared_support": float(
            np.max(np.abs(lam_ref[both] - lam_ours[both]))) if both else None,
        "support": {"reference": len(sa), "ours": len(sb),
                    "intersection": len(both)},
        "truth_r2_reference": r2_score(sim["weights"], mu_ref),
        "truth_r2_ours": r2_score(sim["weights"], mu_ours),
        "reference_seconds": t_ref,
        "ours_seconds": t_ours,
        "note": ("both fits fully deterministic: residual disagreement is "
                 "implementation divergence, not sampling/order dither"),
    }
    print(json.dumps(row, indent=2), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sanity", action="store_true",
                    help="small N=200/K=2000 run only")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    ref_caviar = load_patched_reference()
    out = {"protocol": __doc__.split("\n\n")[1]}

    if args.sanity:
        out["sanity"] = run_config(ref_caviar, N=200, K=2000,
                                   iters=args.iters, seed_data=7)
    else:
        out["flagship"] = run_config(ref_caviar, N=1000, K=10000,
                                     iters=args.iters, seed_data=2)

    path = os.path.join(REPO, "PARITY_VR.json")
    prior = json.load(open(path)) if os.path.exists(path) else {}
    prior.update(out)
    json.dump(prior, open(path, "w"), indent=2)
    print("wrote", path, flush=True)

    if "flagship" in out:
        bm_path = os.path.join(REPO, "BASELINE_MEASURED.json")
        if os.path.exists(bm_path):
            bm = json.load(open(bm_path))
            bm.setdefault("configs", {})["2vr"] = out["flagship"]
            json.dump(bm, open(bm_path, "w"), indent=2)
            print("merged into", bm_path, flush=True)


if __name__ == "__main__":
    main()
