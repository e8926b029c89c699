"""Streaming / online CAVIaR: the posterior updates as trials arrive.

The reference is strictly offline (SURVEY.md §3.1: every solver consumes
the complete [K] trial set after the experiment ends). Real holographic
experiments produce trials continuously, and closed-loop use — choosing
the next stimulation ensembles from the current posterior — needs the
posterior DURING the experiment. ``OnlineCaviar`` keeps the full CAVI
state device-resident in fixed-capacity trial buffers and warm-starts
further CAVI iterations each time a block of trials arrives.

TPU-native design:

* **Capacity buffers.** Trials live in ``[N, C]`` device arrays with
  ``C >= K``; columns beyond the true count are inert (zero traces,
  masks and spikes — the same invariant the solver's 128-alignment
  padding relies on, solvers/caviar.py::_run_caviar). The true trial
  count enters the jitted fit as a TRACED scalar (``k_true``), so a
  growing stream reuses ONE compiled program per capacity bucket
  instead of recompiling at every new K.
* **Warm starts.** Each update resumes from the current ``CaviarState``
  and advances the global iteration counter (``start_iter``), so gate
  delays (``delay_spont_est``, spike-count gating) behave like one long
  fit over growing data. The spontaneous soft-threshold counter is the
  one exception: its seed is capped at ``max_backtrack_iters - 1``
  (``spont_seed_cap``) — seeded with the raw global index it would hit
  the bound mid-stream and freeze z, leaving all later blocks'
  spontaneous activity unestimated; capped, mature updates keep the
  schedule's late regime (one coarse soft-threshold step/iteration).
* **Bounded recompiles.** Block widths are padded to 128-column
  buckets and capacity doubles (128-aligned) when exceeded: a stream of
  B blocks compiles O(log B) programs, not O(B).
* **Per update**: one small host→device block upload (traces at the
  fit dtype's width + stimulus as int8 power buckets), one fused
  insert dispatch, one fit dispatch. Nothing is pulled back until
  ``posterior()``/``result()``.

Equivalence: the per-trial observation reductions (trapezoid charge +
energy mask, ops/charge.py) are pointwise in the trial, so streaming
blocks produce exactly the inputs a batch fit would see. A single
``update(psc, stim, iters=i)`` over all trials is numerically the batch
``solvers.caviar`` fit (equality-tested, tests/test_online.py).

Warm-start dynamics: CAVI warm-started on thin early data parks true
connections in the spontaneous bucket — a local optimum further
iterations never leave (the false-negative mode the reference's
fn-scan exists for, caviar.py:94-98). Online it must run after EVERY
acquisition round, not just at the end: on a half-and-half stream the
raw warm-started fit plateaus at weight-R2 0.42 while per-update
scanning reaches 0.97 (and a 4-block stream 0.99). ``update``'s
``fn_scan=True`` default folds the one-dispatch device scan into the
streaming state accordingly.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.charge import prepare_observations
from ._common import (_bucketise_dense, _levels, _select_levels,
                      prepare_traces)
from .caviar import (CaviarState, _reconnect_and_refit_device, _run_caviar,
                     _resolve_laplace_impl, _resolve_sweep,
                     _resolve_sweep_block_size, _validate_update_order)


def _ceil128(n):
    return -(-int(n) // 128) * 128


def _insert_block_impl(y_cap, stim_cap, mask_cap, lam_cap, levels, y_blk,
                       bucket_blk, active_blk, k0):
    """Fused insert of one trial block at column offset ``k0``.

    Reconstructs the block's stimulus values from the power-bucket wire
    (int8, _common._select_levels — no gather), initialises the block's
    spike posterior to 0.95 on targeted active trials (reference
    caviar.py:32-34), and writes trials into the capacity buffers.
    ``k0`` is traced: one compiled program per (C, block) shape pair,
    reused at every offset.
    """
    dtype = y_cap.dtype
    stim_blk = _select_levels(levels, bucket_blk)                  # [N, kb]
    act = active_blk.astype(dtype)
    lam0_blk = jnp.where(
        stim_blk > 0, jnp.asarray(0.95, dtype), jnp.zeros((), dtype)
    ) * act[None, :]
    dus = jax.lax.dynamic_update_slice
    zero = jnp.zeros((), jnp.int32)
    return (
        dus(y_cap, y_blk.astype(dtype), (k0,)),
        dus(stim_cap, stim_blk, (zero, k0)),
        dus(mask_cap, act, (k0,)),
        dus(lam_cap, lam0_blk, (zero, k0)),
    )


_insert_block = jax.jit(_insert_block_impl)


def _grow_buffers_impl(y, stim, mask, lam, z, pad):
    """Capacity growth: one dispatch. New columns are zero — inert
    until an insert writes them. (No buffer donation here or in
    _insert_block: it saves only an on-device copy — ~0.1 ms at the
    bench shape — while emitting unusable-donation warnings on the CPU
    backend. Not worth the noise.)"""
    return (
        jnp.pad(y, (0, pad)),
        jnp.pad(stim, ((0, 0), (0, pad))),
        jnp.pad(mask, (0, pad)),
        jnp.pad(lam, ((0, 0), (0, pad))),
        jnp.pad(z, (0, pad)),
    )


_grow_buffers = jax.jit(_grow_buffers_impl, static_argnames=("pad",))


@jax.jit
def _valid_mask(k, like):
    """[C] validity: 1 for the first ``k`` columns (true trials), 0 for
    inert capacity columns. Shape/dtype follow ``like``."""
    return (jnp.arange(like.shape[0]) < k).astype(like.dtype)


class OnlineCaviar:
    """Streaming CAVIaR over trial blocks (see module docstring).

    Parameters mirror ``solvers.caviar`` (reference caviar.py:20-23
    defaults); ``priors`` is the Model-facade prior dict (reference
    model.py:24-31 defaults when omitted). ``powers`` should be the
    rig's stimulation levels — known up front in a closed-loop setting;
    when omitted the level table is derived from the FIRST block, and a
    later block carrying an unseen level raises (pass ``powers=`` to
    avoid).

    Usage::

        oc = OnlineCaviar(N, powers=[45., 55., 65.])
        for psc_blk, stim_blk in acquisition:      # demixed traces
            oc.update(psc_blk, stim_blk, iters=10)
            mu, beta = oc.posterior()["mu"], oc.posterior()["beta"]
        final = oc.result()                        # incl. fn-scan
    """

    def __init__(self, N, priors=None, powers=None, dtype=jnp.float32,
                 seed=0, capacity=1024, y_xcorr_thresh=1e-2, msrmp=0.3,
                 num_mc_samples=100, minimum_spike_count=3,
                 delay_spont_est=1, scale_factor=0.75, penalty=5e0,
                 max_backtrack_iters=20, tol=0.05, spont_orthogonality=0.1,
                 analytic_mc=False, sweep_impl="auto",
                 sweep_block_size="auto", laplace_impl="auto",
                 update_order="random", mesh=None):
        from .. import _ensure_compile_cache

        _ensure_compile_cache()
        # ``mesh``: shard the stream over a jax mesh. The capacity
        # buffers partition on the trial axis, each warm-start fit runs
        # the trial-sharded program (parallel/sharded._run_sharded —
        # psum'd updates, traced start_iter/k/spont-seed-cap so a
        # growing stream never recompiles), and inserts/growth carry
        # pinned output shardings so the big arrays never leave their
        # shards between updates. The single-chip path is unchanged
        # (mesh=None, default); equality tested on the virtual 8-device
        # mesh (tests/test_online.py::TestMeshStream).
        self.mesh = mesh
        if mesh is not None:
            import math

            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import TRIAL_AXIS

            self._align = math.lcm(128, int(mesh.devices.size))
            sh_t = NamedSharding(mesh, P(TRIAL_AXIS))
            sh_nt = NamedSharding(mesh, P(None, TRIAL_AXIS))
            self._sh_t, self._sh_nt = sh_t, sh_nt
            self._insert_jit = jax.jit(
                _insert_block_impl, out_shardings=(sh_t, sh_nt, sh_t, sh_nt))
            self._grow_jit = jax.jit(
                _grow_buffers_impl, static_argnames=("pad",),
                out_shardings=(sh_t, sh_nt, sh_t, sh_nt, sh_t))
            self._valid_jit = jax.jit(_valid_mask, out_shardings=sh_t)
        else:
            self._align = 128
            self._insert_jit = _insert_block
            self._grow_jit = _grow_buffers
            self._valid_jit = _valid_mask
        if priors is None:
            from ..model import default_priors

            priors = default_priors(N)
        self.N = int(N)
        self.dtype = jnp.dtype(dtype)
        self._priors = tuple(
            jnp.asarray(priors[k], dtype)
            for k in ("mu", "beta", "shape", "rate", "phi", "phi_cov")
        )
        self._y_xcorr_thresh = float(y_xcorr_thresh)
        self._msrmp = float(msrmp)
        self._min_spike_count = int(minimum_spike_count)
        block = _resolve_sweep_block_size(sweep_block_size)
        self._sweep_block_req = sweep_block_size
        self._static = dict(
            num_mc_samples=int(num_mc_samples),
            minimum_spike_count=int(minimum_spike_count),
            delay_spont_est=int(delay_spont_est),
            msrmp=float(msrmp),
            scale_factor=float(scale_factor),
            penalty=float(penalty),
            max_backtrack_iters=int(max_backtrack_iters),
            tol=float(tol),
            spont_orthogonality=float(spont_orthogonality),
            analytic_mc=bool(analytic_mc),
            save_histories=False,
            sweep_block_size=block,
            # placeholder — re-resolved each update() against the LIVE
            # capacity (a growing stream can cross the Pallas kernels'
            # VMEM budget; auto falls back to the XLA blocked sweep)
            sweep_impl=_resolve_sweep(sweep_impl, sweep_block_size)[1],
            laplace_impl=_resolve_laplace_impl(laplace_impl, dtype),
            update_order=_validate_update_order(update_order),
            track_elbo=False,
            elbo_tol=None,
        )
        self._sweep_impl_req = sweep_impl  # re-resolved per update
        self._key = jax.random.PRNGKey(seed)

        # level table: fixed by powers= now, or by the first block
        if powers is not None:
            self._powers_np, self._levels_np = _levels(
                np.zeros((1, 1)), powers)
        else:
            self._powers_np = self._levels_np = None
        self._dev_tables = None  # lazy device copies of the level table

        self.k = 0          # true trials seen
        self.it = 0         # cumulative CAVI iterations
        self._n_reconnected = 0  # by the latest update's fn-scan
        self._C = self._ceil(max(int(capacity), 128))
        self._bufs = None   # (y, stim, mask) at capacity, lazy dtype init
        self._state = None  # CaviarState at capacity
        self._counts_np = None  # [N, P] power-bucket counts (true trials)

    # -- internals ---------------------------------------------------------

    def _ceil(self, n):
        return -(-int(n) // self._align) * self._align

    def _shard(self, a):
        """Pin a fresh buffer to its mesh sharding (no-op single-chip)."""
        if self.mesh is None:
            return a
        return jax.device_put(
            a, self._sh_t if a.ndim == 1 else self._sh_nt)

    def _alloc(self):
        C, dt = self._C, self.dtype
        return (self._shard(jnp.zeros(C, dt)),
                self._shard(jnp.zeros((self.N, C), dt)),
                self._shard(jnp.zeros(C, dt)))

    def _init_state(self, lam_cap):
        mu_p, beta_p, shape_p, rate_p, phi_p, phi_cov_p = self._priors
        return CaviarState(
            mu=mu_p, beta=beta_p, lam=lam_cap, shape=shape_p, rate=rate_p,
            phi=phi_p, phi_cov=phi_cov_p,
            z=self._shard(jnp.zeros(self._C, self.dtype)),
            spont_rate=jnp.zeros((), self.dtype), key=self._key,
        )

    def _ensure_capacity(self, k_needed):
        if k_needed <= self._C:
            return
        new_c = self._ceil(max(2 * self._C, k_needed))
        pad = new_c - self._C
        if self._bufs is None:
            self._C = new_c
            return
        y, stim, mask = self._bufs
        lam = self._state.lam if self._state is not None else self._shard(
            jnp.zeros((self.N, self._C), self.dtype))
        z = self._state.z if self._state is not None else self._shard(
            jnp.zeros(self._C, self.dtype))
        y, stim, mask, lam, z = self._grow_jit(y, stim, mask, lam, z, pad)
        self._bufs = (y, stim, mask)
        if self._state is not None:
            self._state = self._state._replace(lam=lam, z=z)
        self._C = new_c

    # -- streaming API -----------------------------------------------------

    def update(self, psc_block, stim_block, iters=10, fn_scan=True,
               trace_wire=None):
        """Ingest a block of trials and run ``iters`` more CAVI
        iterations warm-started from the current posterior.

        ``psc_block``: [k_b, 900] demixed traces; ``stim_block``:
        [N, k_b] stimulus design columns for those trials. Returns self
        (chainable); nothing is pulled to the host.

        ``trace_wire``: compress the block's trace upload like the
        batch solvers (solvers/_common.prepare_traces: "f16" / "int8"
        / "int4" / "int4d2") — the block only feeds the trapezoid
        charge + activity mask, which average the quantisation noise
        out, and at closed-loop block sizes the upload is a meaningful
        slice of the steady-state refresh latency.

        ``fn_scan=True`` folds the false-negative reconnection scan
        (reference caviar.py:94-98) into the streaming state after the
        iterations. This matters much more online than offline:
        warm-started CAVI on thin early data parks true connections in
        the spontaneous bucket — a local optimum more iterations never
        leave (measured: a half-and-half stream plateaus at weight-R2
        0.42 without the per-update scan, reaches 0.97 with it). The
        scan is one fused device dispatch; disable only for parity runs
        against an unscanned batch fit.
        """
        if int(iters) < 1:
            raise ValueError(f"iters must be >= 1, got {iters}")
        psc = np.asarray(psc_block)
        if psc.ndim == 1:
            psc = psc[None]
        stim_np = np.asarray(stim_block)
        if stim_np.ndim == 1:
            stim_np = stim_np[:, None]
        if stim_np.shape[0] != self.N:
            raise ValueError(
                f"stim_block has {stim_np.shape[0]} neurons, model has "
                f"{self.N}")
        kb = psc.shape[0]
        if kb == 0:
            raise ValueError("empty trial block")
        if stim_np.shape[1] != kb:
            raise ValueError(
                f"psc_block carries {kb} trials but stim_block "
                f"{stim_np.shape[1]}")

        fresh_table = self._levels_np is None
        if fresh_table:
            self._powers_np, self._levels_np = _levels(stim_np, None)
            if self._levels_np.size < 2:
                self._powers_np = self._levels_np = None
                raise ValueError(
                    "the first block carries no nonzero stimulation, so "
                    "no power-level table can be derived from it; pass "
                    "powers= up front")
        try:
            return self._update_guarded(psc, stim_np, kb, iters, fn_scan,
                                        trace_wire)
        except BaseException:
            if fresh_table:
                # roll the table derivation back too: a failed FIRST
                # update ingested nothing, so it must not freeze the
                # stream's power levels to its block (the rollback
                # guarantee below covers everything else)
                self._powers_np = self._levels_np = None
                self._dev_tables = None
            raise

    def _update_guarded(self, psc, stim_np, kb, iters, fn_scan, trace_wire):
        """``update()``'s body after block validation and level-table
        derivation; the caller rolls back a first-block table if this
        raises."""
        kb_pad = _ceil128(kb)
        self._ensure_capacity(self.k + kb_pad)
        if self._bufs is None:
            self._bufs = self._alloc()

        # block wire: f32 traces (zero-padded to the 128 bucket) +
        # int8 power buckets; raises on levels outside the table.
        # An f64 stream keeps full mantissa in transit (the parity
        # contract prepare_traces enforces for batch fits).
        wire = np.float64 if self.dtype.itemsize > 4 else np.float32
        traces = np.zeros((kb_pad, psc.shape[1]), wire)
        traces[:kb] = psc
        bucket = np.zeros((self.N, kb_pad), np.int8)
        bucket[:, :kb] = _bucketise_dense(stim_np, self._levels_np)
        traces_dev = prepare_traces(traces, self.dtype,
                                    trace_wire=trace_wire)
        y_blk, active_blk = prepare_observations(
            traces_dev, self._y_xcorr_thresh)

        # Everything below is staged in locals and only committed to
        # self after the fit (and optional fn-scan) succeeds — a raised
        # update() must leave the stream exactly as it was (capacity
        # growth above is the one earlier mutation, and it is
        # semantics-preserving either way).
        y, stim, mask = self._bufs
        lam = (self._state.lam if self._state is not None
               else self._shard(jnp.zeros((self.N, self._C), self.dtype)))
        y, stim, mask, lam = self._insert_jit(
            y, stim, mask, lam,
            self._levels_dev(), y_blk,
            jnp.asarray(bucket), active_blk,
            jnp.asarray(self.k, jnp.int32),
        )
        state = (self._init_state(lam) if self._state is None
                 else self._state._replace(lam=lam))
        k_new = self.k + kb

        # Cap the spontaneous soft-threshold seed at
        # max_backtrack_iters-1: with the raw global index, z would
        # FREEZE once cumulative iterations passed
        # max_backtrack_iters and trials ingested after that point
        # would never get spontaneous activity estimated. Capped, a
        # mature stream keeps running the schedule's LATE regime —
        # one coarse step at the unshrunk penalty per iteration,
        # exactly how a long batch fit's last live iteration
        # behaves. (Re-seeding from zero each update is WRONG the
        # other way: the deep-shrink early regime re-runs on
        # immature lam for every new block and absorbs evoked
        # charge into z — measured multi-block recovery R2
        # 0.9 -> 0.45.) Gate delays stay global; updates are
        # bit-identical to a batch fit while the cap is inactive
        # (cumulative iterations < max_backtrack_iters).
        seed_cap = jnp.asarray(
            self._static["max_backtrack_iters"] - 1, jnp.int32)
        if self.mesh is None:
            # re-resolve the sweep against the LIVE capacity: a grown
            # stream can cross the Pallas ring's VMEM budget, where
            # auto routes to the XLA sweep (same blocked schedule)
            (self._static["sweep_block_size"],
             self._static["sweep_impl"]) = _resolve_sweep(
                self._sweep_impl_req, self._sweep_block_req, k=self._C)
            state, _, _ = _run_caviar(
                y, stim, state.lam, mask, self._powers_dev(), *self._priors,
                self._key, state, jnp.asarray(k_new, jnp.int32),
                spont_seed_cap=seed_cap,
                iters=int(iters), start_iter=self.it, **self._static,
            )
            counts_new = self._counts_np
        else:
            # trial-sharded warm start: the capacity buffers stay in
            # their shards; every reduction psums over the mesh. The
            # sharded program takes the loop-invariant power-bucket
            # counts as an input — accumulate them host-side from the
            # int8 bucket wire (exact: the device stim IS these buckets)
            from ..parallel.sharded import _run_sharded

            n_p = self._levels_np.size - 1
            if self._counts_np is None:
                self._counts_np = np.zeros((self.N, n_p), np.float64)
            blk_counts = (
                bucket[:, :kb, None] == np.arange(1, n_p + 1)[None, None, :]
            ).sum(axis=1).astype(np.float64)
            counts_new = self._counts_np + blk_counts
            sh_static = {k: v for k, v in self._static.items()
                         if k != "sweep_impl"}
            state, _ = _run_sharded(
                y, stim, state.lam, mask,
                self._valid_jit(jnp.asarray(k_new, jnp.int32), y),
                self._powers_dev(), self._levels_dev(),
                jnp.asarray(counts_new, self.dtype),
                jnp.asarray(float(k_new), self.dtype),
                *self._priors, self._key, state,
                spont_seed_cap=seed_cap,
                mesh=self.mesh, iters=int(iters), start_iter=self.it,
                **sh_static,
            )
        n_rec = self._n_reconnected
        if fn_scan:
            mu, beta, lam, z, phi, phi_cov, n_rec = self._reconnect(
                state, stim, k_new)
            state = state._replace(mu=mu, beta=beta, lam=lam, z=z,
                                   phi=phi, phi_cov=phi_cov)
        # Commit: the fit (and scan) succeeded, so the new trials are in.
        self._bufs = (y, stim, mask)
        self.k = k_new
        self._n_reconnected = n_rec
        self._state = state
        self._counts_np = counts_new
        self.it += int(iters)
        return self

    def _reconnect(self, state, stim, k):
        dt = self.dtype
        return _reconnect_and_refit_device(
            stim, state.lam, state.mu, state.beta, state.z,
            self._powers_dev(), state.phi, state.phi_cov,
            self._priors[4], self._priors[5],
            jnp.asarray(self._msrmp, dt),
            jnp.asarray(self._min_spike_count, dt),
            jnp.asarray(k, jnp.int32),
        )

    def _levels_dev(self):
        """Device-resident level table, uploaded once. The table is
        immutable after it is first derived/loaded, and every update()
        needs it 2-3 times — re-uploading cost one eager tunnel
        dispatch (~3-5 ms RPC enqueue) per use on the closed-loop
        latency path."""
        if self._dev_tables is None:
            lv = jnp.asarray(self._levels_np, self.dtype)
            self._dev_tables = (lv, lv[1:])
        return self._dev_tables[0]

    def _powers_dev(self):
        self._levels_dev()
        return self._dev_tables[1]

    @property
    def trial_count(self):
        return self.k

    @property
    def iteration(self):
        return self.it

    @property
    def last_reconnected(self):
        """Connections the latest update's fn-scan restored (host pull)."""
        return int(np.asarray(self._n_reconnected))

    def posterior(self):
        """Small-field snapshot (no [N, K] pulls): mu, beta, phi,
        phi_cov, shape, rate, spont_rate as numpy."""
        self._require_state()
        s = self._state
        from .caviar import _pull_host_batch

        small = _pull_host_batch(s.mu, s.beta, s.phi, s.phi_cov, s.shape,
                                 s.rate, s.spont_rate)
        return dict(
            mu=small[0], beta=small[1], phi=small[2].reshape(self.N, 2),
            phi_cov=small[3].reshape(self.N, 2, 2),
            shape=small[4].reshape(()), rate=small[5].reshape(()),
            spont_rate=small[6].reshape(()),
        )

    def result(self, fn_scan=True):
        """Full posterior at the true trial count, optionally after the
        false-negative reconnection scan (reference caviar.py:94-98).
        Non-destructive: the streaming state is left untouched, so
        acquisition can continue after a mid-experiment readout."""
        self._require_state()
        s = self._state
        mu, beta, lam, z = s.mu, s.beta, s.lam, s.z
        phi, phi_cov = s.phi, s.phi_cov
        n_rec = 0
        if fn_scan:
            mu, beta, lam, z, phi, phi_cov, n_rec = self._reconnect(
                s, self._bufs[1], self.k)
        k = self.k
        return dict(
            mu=np.asarray(mu), beta=np.asarray(beta),
            lam=np.asarray(lam[:, :k]), z=np.asarray(z[:k]),
            shape=np.asarray(s.shape), rate=np.asarray(s.rate),
            phi=np.asarray(phi), phi_cov=np.asarray(phi_cov),
            spont_rate=np.asarray(s.spont_rate),
            n_reconnected=int(np.asarray(n_rec)),
            trial_count=k, iterations=self.it,
        )

    def _require_state(self):
        if self._state is None:
            raise RuntimeError(
                "no trials ingested yet — call update() first")

    # -- crash recovery ------------------------------------------------------

    def save(self, path):
        """Checkpoint the full streaming state (atomic write).

        A closed-loop rig crashing mid-experiment must not lose the
        stream: the checkpoint carries the capacity buffers, the CAVI
        state, the level table and the counters. ``load`` restores an
        OnlineCaviar that continues exactly where this one stopped
        (same fit options must be passed at construction — they are
        solver configuration, not state).
        """
        from ..utils.checkpoint import save_state

        self._require_state()
        y, stim, mask = self._bufs
        s = self._state
        save_state(path, dict(
            k=np.asarray(self.k), it=np.asarray(self.it),
            levels=self._levels_np, powers_host=self._powers_np,
            y=np.asarray(y), stim=np.asarray(stim), mask=np.asarray(mask),
            state={f: np.asarray(getattr(s, f)) for f in s._fields},
        ))

    @classmethod
    def load(cls, path, N=None, **kwargs):
        """Restore a stream checkpointed by ``save``. ``kwargs`` are the
        constructor's fit options (must match the original run)."""
        from ..utils.checkpoint import load_state

        ck = load_state(path)
        n = int(ck["stim"].shape[0])
        if N is not None and int(N) != n:
            raise ValueError(f"checkpoint carries N={n}, got N={N}")
        self = cls(n, **kwargs)
        dt = self.dtype
        self._levels_np = np.asarray(ck["levels"], np.float32)
        self._dev_tables = None  # table changed: drop any device copy
        self._powers_np = np.asarray(ck["powers_host"])
        self.k = int(ck["k"])
        self.it = int(ck["it"])
        self._C = int(ck["stim"].shape[1])
        self._bufs = (jnp.asarray(ck["y"], dt), jnp.asarray(ck["stim"], dt),
                      jnp.asarray(ck["mask"], dt))
        st = ck["state"]
        self._state = CaviarState(**{
            f: jnp.asarray(st[f], dt if np.asarray(st[f]).dtype.kind == "f"
                           else None)
            for f in CaviarState._fields
        })
        if self.mesh is not None:
            # a single-chip checkpoint's capacity may not divide the
            # mesh: grow to the mesh alignment (inert columns)
            aligned = self._ceil(self._C)
            if aligned != self._C:
                pad = aligned - self._C
                y, stim, mask = self._bufs
                y, stim, mask, lam, z = self._grow_jit(
                    y, stim, mask, self._state.lam, self._state.z, pad)
                self._bufs = (y, stim, mask)
                self._state = self._state._replace(lam=lam, z=z)
                self._C = aligned
            if self.k:
                # rebuild the loop-invariant bucket counts the sharded
                # program takes as input (the buffer holds stim VALUES).
                # One [N, k] comparison per level, not a broadcast
                # [N, k, P] temporary — the same host-memory rule as
                # parallel/distributed.py's counts (first-touch page
                # faults make a multi-GB temp cost seconds here)
                pw = self._levels_np[1:].astype(np.float32)
                stim_vals = np.asarray(ck["stim"][:, :self.k],
                                       dtype=np.float32)
                self._counts_np = np.stack(
                    [(stim_vals == v).sum(axis=1) for v in pw],
                    axis=1).astype(np.float64)
        return self
