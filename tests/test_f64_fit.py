"""x64 full-fit regression: non-f32-representable powers (45.7-style).

Round-2 advisor finding (high): the device stim is reconstructed from
the f32 level table, but device-side powers arrays were built from the
original-precision host powers. Under JAX x64 with powers like 45.7,
every on-device ``stim == powers[p]`` comparison (sweep gate stats,
power-curve stats, reconnect scan) matched zero trials and the fit
silently collapsed to all-zero weights. The fix derives every device
powers array from the uploaded-stim level table
(solvers/_common._powers_dev); this test runs a FULL caviar fit under
x64 with such powers and asserts genuine recovery.

Runs in a subprocess because jax_enable_x64 is process-global and the
rest of the suite runs f32.
"""

import subprocess
import sys

SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from circuitmap_tpu.simulation import simulate
from circuitmap_tpu.model import Model
from circuitmap_tpu.utils.metrics import r2_score

np.random.seed(0)
sim = simulate(N=40, trials=500, H=4, connection_prob=0.1,
               powers=[45.7, 55.3, 65.1], spont_prob=0.02, verbose=False)
stim = np.asarray(sim["stim_matrix"], dtype=np.float64)
assert (stim == 45.7).sum() > 0  # the host matrix holds exact f64 values

model = Model(40)
# track_elbo under x64 regression-tests the stop_at scan-carry dtype:
# an int32-pinned carry vs the int64 arange xs broke the scan typing
model.fit(sim["psc"], stim, method="caviar",
          fit_options={"iters": 20, "verbose": False, "seed": 0,
                       "dtype": jnp.float64, "track_elbo": True,
                       "elbo_tol": 1e-9})
assert np.isfinite(model.elbo[1:]).all(), "x64 ELBO trajectory not finite"
assert 1 <= model.elbo_converged_at <= 20
mu = model.state["mu"]
lam = model.state["lam"]
# pre-fix the f64 fit collapsed: zero device power matches -> no gates
# pass -> mu identically zero. Require genuine recovery instead.
assert np.count_nonzero(mu) > 0, "f64 fit collapsed to all-zero weights"
r2 = r2_score(sim["weights"], mu)
assert r2 > 0.7, f"f64 recovery R2 too low: {r2}"
assert lam.max() > 0.5, "spike posteriors never updated"
print("OK", r2)
"""


def test_f64_caviar_fit_with_non_f32_powers():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True, text=True, cwd="/root/repo", timeout=900,
        env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert proc.returncode == 0, (proc.stdout[-1000:], proc.stderr[-3000:])
    assert proc.stdout.startswith("OK")


BATCHED_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from circuitmap_tpu.model import default_priors
from circuitmap_tpu.simulation import simulate
from circuitmap_tpu.solvers import caviar, caviar_many
from circuitmap_tpu.solvers.batched import (_same_shape_stack,
                                            _upload_trace_stack)

# unit: the *_many host wire must not strip mantissa bits for f64 fits
# (review fix: an unconditional f32 cast used to sit between the
# ragged pad's f64 dtype selection and the device upload)
y64 = np.full((2, 8, 4), 1.0 + 2.0**-40, np.float64)
stims0 = np.zeros((2, 3, 8))
out, _ = _same_shape_stack(y64, stims0, None, "x", dtype=jnp.float64)
assert out.dtype == np.float64, out.dtype
dev = _upload_trace_stack(out, jnp.float64, None)
np.testing.assert_array_equal(np.asarray(dev), y64)
# f32 fits keep the halved wire
out32, _ = _same_shape_stack(y64, stims0, None, "x", dtype=jnp.float32)
assert out32.dtype == np.float32, out32.dtype

# f64 fit fed f32 traces: ship NARROW, widen on device (review fix:
# jnp.asarray(np_f32, dtype=f64) would host-cast first — a full-size
# host temp and double the wire bytes)
y32 = np.linspace(-1, 1, 2 * 8 * 4, dtype=np.float32).reshape(2, 8, 4)
out_n, _ = _same_shape_stack(y32, stims0, None, "x", dtype=jnp.float64)
assert out_n.dtype == np.float32, out_n.dtype  # host wire stays narrow
dev_n = _upload_trace_stack(out_n, jnp.float64, None)
assert dev_n.dtype == jnp.float64, dev_n.dtype
np.testing.assert_array_equal(np.asarray(dev_n), y32.astype(np.float64))

# integration: a ragged f64 batch equals the single f64 fits it holds
sims = []
for seed, k in ((51, 192), (52, 256)):
    np.random.seed(seed)
    sims.append(simulate(N=16, trials=k, H=3, connection_prob=0.2,
                         spont_prob=0.01, gp_scale=1e-3, verbose=False))
p = default_priors(16)
prior_args = (p["mu"], p["beta"], p["shape"], p["rate"], p["phi"],
              p["phi_cov"])
kw = dict(iters=6, fn_scan=False, analytic_mc=True, dtype=jnp.float64)
batch = caviar_many([np.asarray(s["psc"], np.float64) for s in sims],
                    [s["stim_matrix"] for s in sims],
                    *prior_args, seeds=[0, 1], verbose=False, **kw)
for b, s in enumerate(sims):
    single = caviar(np.asarray(s["psc"], np.float64), s["stim_matrix"],
                    *prior_args, seed=b, verbose=False,
                    sweep_impl="xla", **kw)
    np.testing.assert_allclose(np.asarray(single[0]), batch[b]["mu"],
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(single[2]), batch[b]["lam"],
                               rtol=1e-6, atol=1e-7)
print("OK")
"""


def test_f64_batched_wire_keeps_mantissa():
    """caviar_many dtype=float64 must keep f64 through the host wire
    (the prepare_traces parity contract) — ragged and stacked."""
    proc = subprocess.run(
        [sys.executable, "-c", BATCHED_SCRIPT],
        capture_output=True, text=True, cwd="/root/repo", timeout=900,
        env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert proc.returncode == 0, (proc.stdout[-1000:], proc.stderr[-3000:])
    assert proc.stdout.startswith("OK")
