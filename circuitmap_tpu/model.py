"""Model facade: priors, solver dispatch, posterior state.

API contract mirrors the reference (model.py:15-211): construct with a
neuron count and optional prior overrides, call ``fit(obs, stimuli,
method, fit_options)``, read posteriors from ``model.state`` (numpy
arrays), per-iteration snapshots from ``model.history``, wall-clock from
``model.time``. Default priors match reference model.py:24-31.
"""

from __future__ import annotations

import time
from copy import deepcopy

import numpy as np

from . import solvers


def default_priors(N):
    """The reference's default prior set (model.py:24-31)."""
    return {
        "alpha": 0.25 * np.ones(N),
        "phi": np.column_stack([1e-1 * np.ones(N), 5e0 * np.ones(N)]),
        "phi_cov": np.tile(np.array([[1e-1, 0.0], [0.0, 1e0]]), (N, 1, 1)),
        "mu": np.zeros(N),
        "beta": 1e1 * np.ones(N),
        "shape": 1.0,
        "rate": 1e-1,
    }


class Model:
    """Connectivity-mapping model: priors in, posterior ``state`` out."""

    def __init__(self, N, priors=None):
        self.N = N
        self.priors = dict(priors) if priors is not None else {}
        for key, val in default_priors(N).items():
            self.priors.setdefault(key, val)
        self.state = deepcopy(self.priors)
        self.history = {}
        self.time = None
        self.trial_count = None
        self._materialize = None  # see fit(_materialize=)

    # -- dispatch ----------------------------------------------------------

    def fit(self, obs, stimuli, method="caviar", fit_options=None,
            _materialize=None):
        """Run a fit. ``_materialize`` is a facade-internal serving
        knob (the fit server's ``return_fields``): ``None`` keeps the
        public contract — every state/history field lands as a host
        numpy array — while a collection of field names pulls ONLY
        those, leaving the rest device-resident jax arrays. On a
        tunneled accelerator the device→host pull of ``lam`` [N, K]
        (80 MB at the flagship shape) is seconds of wire; a
        summary-only response should never pay it. Unpulled fields
        still work through ``np.asarray`` on access; history names
        match the serve response keys (``history_<field>``)."""
        fit_options = dict(fit_options or {})
        runner = {
            "caviar": self._fit_caviar,
            "cavi_sns": self._fit_cavi_sns,
            "mbcs": self._fit_mbcs,
            "cosamp": self._fit_cosamp,
        }.get(method)
        if runner is None:
            raise ValueError(
                f"unknown method {method!r}; expected "
                "caviar | cavi_sns | mbcs | cosamp"
            )
        from . import _ensure_compile_cache

        _ensure_compile_cache()
        self.fit_method = method  # summarize() keys its calls off this
        self._materialize = (None if _materialize is None
                             else {str(f) for f in _materialize})
        t0 = time.time()
        try:
            runner(obs, stimuli, fit_options)
        finally:
            self._materialize = None
        self.time = time.time() - t0
        return self

    def _pull(self, name, value):
        """np.asarray under the ``_materialize`` policy (see fit)."""
        if value is None:
            return None
        if self._materialize is None or name in self._materialize:
            return np.asarray(value)
        return value

    def summary(self, stim=None, verbose=True):
        """Per-neuron posterior summary (``circuitmap_tpu.summarize``);
        prints the table unless ``verbose=False``. Returns the dict."""
        from .summary import format_summary, summarize

        out = summarize(self, stim=stim)
        if verbose:
            print(format_summary(out), end="")
        return out

    # -- per-solver adapters ----------------------------------------------

    def _fit_caviar(self, obs, stimuli, fit_options):
        mesh = fit_options.pop("mesh", None)
        track_elbo = bool(fit_options.get("track_elbo"))
        if mesh is not None:
            # trial-sharded fit over a device mesh (track_elbo supported:
            # the sharded solver psums the bound per iteration)
            from .parallel import caviar_sharded

            result = caviar_sharded(
                obs, stimuli, self.state["mu"], self.state["beta"],
                self.state["shape"], self.state["rate"], self.state["phi"],
                self.state["phi_cov"], mesh=mesh, **fit_options,
            )
        else:
            result = self._run_caviar_local(obs, stimuli, fit_options)
        if track_elbo:
            *result, (elbos, converged_at) = result
            self.elbo = np.asarray(elbos)
            self.elbo_converged_at = converged_at
        (mu, beta, lam, shape, rate, phi, phi_cov, z, receptive_fields,
         *hists) = result

        self.state.update(
            mu=self._pull("mu", mu),
            beta=self._pull("beta", beta),
            lam=self._pull("lam", lam),
            shape=self._pull("shape", shape),
            rate=self._pull("rate", rate),
            phi=self._pull("phi", phi),
            phi_cov=self._pull("phi_cov", phi_cov),
            z=self._pull("z", z),
            receptive_fields=receptive_fields,
        )
        self.trial_count = self.state["lam"].shape[1]
        names = ["mu", "beta", "lam", "shape", "rate", "phi", "phi_cov", "z"]
        self.history = {
            n: self._pull(f"history_{n}", h) for n, h in zip(names, hists)
        }
        if track_elbo:
            self.history["elbo"] = self.elbo

    def _run_caviar_local(self, obs, stimuli, fit_options):
        return solvers.caviar(
            obs,
            stimuli,
            self.state["mu"],
            self.state["beta"],
            self.state["shape"],
            self.state["rate"],
            self.state["phi"],
            self.state["phi_cov"],
            **fit_options,
        )

    def _fit_cavi_sns(self, obs, stimuli, fit_options):
        mesh = fit_options.pop("mesh", None)
        if mesh is not None:
            from .parallel import cavi_sns_sharded

            result = cavi_sns_sharded(
                obs, stimuli, self.state["mu"], self.state["beta"],
                self.state["alpha"], self.state["shape"], self.state["rate"],
                self.state["phi"], self.state["phi_cov"], mesh=mesh,
                **fit_options,
            )
        else:
            result = solvers.cavi_sns(
                obs,
                stimuli,
                self.state["mu"],
                self.state["beta"],
                self.state["alpha"],
                self.state["shape"],
                self.state["rate"],
                self.state["phi"],
                self.state["phi_cov"],
                **fit_options,
            )
        mu, beta, alpha, lam, shape, rate, phi, phi_cov, *hists = result

        self.state.update(
            mu=self._pull("mu", mu),
            beta=self._pull("beta", beta),
            alpha=self._pull("alpha", alpha),
            lam=self._pull("lam", lam),
            shape=self._pull("shape", shape),
            rate=self._pull("rate", rate),
            phi=self._pull("phi", phi),
            phi_cov=self._pull("phi_cov", phi_cov),
        )
        self.trial_count = self.state["lam"].shape[1]
        names = ["mu", "beta", "alpha", "lam", "shape", "rate", "phi", "phi_cov"]
        self.history = {
            n: self._pull(f"history_{n}", h) for n, h in zip(names, hists)
        }

    def _fit_cosamp(self, obs, stimuli, fit_options):
        """Greedy CoSaMP baseline on integrated charge.

        The reference README documents ``method='cosamp'`` but its
        dispatcher never implemented it (reference model.py:36-44
        raises); provided here: sensing matrix = binary targeting
        design, measurements = trapezoidal charges.
        """
        stim = np.asarray(stimuli, dtype=float)
        y = np.trapezoid(np.asarray(obs, dtype=float), axis=-1)
        A = (stim > 0).T.astype(float)
        # every other adapter accepts a mesh= fit option; fail with the
        # reason here rather than a TypeError from deep inside cosamp
        if fit_options.pop("mesh", None) is not None:
            raise ValueError(
                "cosamp has no mesh path (it is a host-side greedy "
                "baseline) — drop mesh= or use method='caviar'/"
                "'cavi_sns'/'mbcs'")
        k = int(fit_options.pop("k", max(int(0.1 * self.N), 1)))
        weights, elapsed = solvers.cosamp(A, y, k, **fit_options)
        # cosamp produces point weights only: record its solver-side
        # elapsed time, and leave lam (and the rest of the state) at the
        # priors rather than fabricating a posterior it never computed.
        self.state.update(mu=weights, cosamp_time=float(elapsed))
        self.trial_count = stim.shape[1]
        self.history = {}

    def _fit_mbcs(self, obs, stimuli, fit_options):
        mesh = fit_options.pop("mesh", None)
        if mesh is not None:
            from .parallel import mbcs_sharded

            result = mbcs_sharded(
                obs, stimuli, self.state["mu"], self.state["beta"],
                self.state["shape"], self.state["rate"], mesh=mesh,
                **fit_options,
            )
        else:
            result = solvers.mbcs(
                obs,
                stimuli,
                self.state["mu"],
                self.state["beta"],
                self.state["shape"],
                self.state["rate"],
                **fit_options,
            )
        mu, beta, lam, shape, rate, z, receptive_fields, *hists = result

        self.state.update(
            mu=self._pull("mu", mu),
            beta=self._pull("beta", beta),
            lam=self._pull("lam", lam),
            shape=self._pull("shape", shape),
            rate=self._pull("rate", rate),
            z=self._pull("z", z),
            receptive_fields=self._pull("receptive_fields",
                                        receptive_fields),
        )
        self.trial_count = self.state["lam"].shape[1]
        names = ["mu", "beta", "lam", "shape", "rate", "z"]
        self.history = {
            n: self._pull(f"history_{n}", h) for n, h in zip(names, hists)
        }
