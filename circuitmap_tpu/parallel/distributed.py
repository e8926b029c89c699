"""Multi-process (multi-host) bootstrap for the sharded solver family.

The trial-sharded solvers (parallel/sharded.py) express every update as
per-shard compute plus a ``psum`` over the ``trial`` mesh axis — a
design that is process-count agnostic. What a pod slice larger than one
host additionally needs is the bootstrap layer this module supplies:

  * :func:`initialize` — ``jax.distributed.initialize`` wrapper
    (idempotent) so every process sees the global device set,
  * :func:`global_trial_mesh` — a 1-D ``trial`` mesh over every global
    device (ICI-contiguous order on real slices),
  * :func:`caviar_sharded_distributed` — per-host trial feeding: each
    process passes only the trials it recorded; global arrays are
    assembled with ``jax.make_array_from_process_local_data`` and the
    existing ``shard_map`` program runs unchanged, its psums now
    crossing hosts.

The reference scales out with zero-communication SLURM job arrays
(reference scripts/generate_loho_cv_slurm_scripts.py:8-36); a single
fit there can never exceed one process. Here one fit spans the slice.

Proven on this rig with 2 processes x 4 virtual CPU devices over gloo
collectives (tests/test_distributed.py), equality-checked against the
single-process mesh solver.
"""

from __future__ import annotations

import functools as _functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import TRIAL_AXIS
from .sharded import _run_sharded
from ..solvers._laplace import _resolve_laplace_impl
from ..solvers.caviar import (
    _resolve_sweep_block_size,
    _validate_update_order,
)


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """Join (or bootstrap) a multi-process JAX cluster. Idempotent.

    On a real TPU pod slice all arguments auto-detect from the TPU
    metadata and this is a bare ``initialize()``. For CPU/GPU clusters
    (and the 2-process gloo proof in tests/test_distributed.py) pass
    ``coordinator_address="host:port"``, ``num_processes`` and this
    process's ``process_id`` explicitly.
    """
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialised — jax.distributed forbids a second init
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def global_trial_mesh() -> Mesh:
    """A 1-D ``trial`` mesh over every device in the cluster.

    ``jax.devices()`` returns the global device list in ICI-contiguous
    order on TPU slices, so neighbouring trial shards are ICI
    neighbours and the solver psums ride ICI before DCN.
    """
    return Mesh(np.array(jax.devices()), (TRIAL_AXIS,))


def _local_device_count(mesh: Mesh) -> int:
    pidx = jax.process_index()
    n = sum(1 for d in mesh.devices.ravel() if d.process_index == pidx)
    if n == 0:
        raise ValueError(
            "this process owns no devices in the mesh — every "
            "participating process must contribute devices")
    return n


def _allgather_host(x):
    """Host-side all-gather of a (same-shaped-everywhere) numpy array.

    Returns [num_processes, *x.shape]. Uses the global device mesh via
    one replicated-out jit — no separate host RPC channel needed.
    """
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def _plan_shards(K_loc, mesh):
    """Agree on a common per-device shard size across processes.

    Returns (rows_per_device, K_pad_local, K_global, k_all) where
    ``k_all`` is the per-process true trial counts in process order.
    """
    n_local = _local_device_count(mesh)
    k_all = _allgather_host(np.asarray([K_loc, n_local], np.int64))
    if not (k_all[:, 1] == n_local).all():
        raise ValueError(
            "unequal local device counts across processes: "
            f"{k_all[:, 1].tolist()}")
    rows = int(max(-(-int(k) // n_local) for k in k_all[:, 0]))
    return rows, rows * n_local, int(k_all[:, 0].sum()), k_all[:, 0]


def _global_powers(stim_local, powers, np_dtype):
    """Union of per-process stim levels, deduplicated at the fit dtype
    (the f64 device-table contract of solvers/_common).

    With explicit ``powers=`` the local stim levels are validated
    against the table — a level outside it would silently match no
    power bucket (zero counts, corrupted msrmp gating), where the
    single-process entries raise (solvers/_common.prepare_stim)."""
    loc = np.unique(stim_local[stim_local > 0]).astype(np.float64)
    if powers is None:
        max_levels = 64
        if loc.size > max_levels:
            raise ValueError(
                f"{loc.size} distinct stim levels on this process; pass "
                "powers= explicitly for continuously-varying designs")
        buf = np.zeros(max_levels)
        buf[:loc.size] = loc
        gathered = _allgather_host(buf).ravel()
        powers = np.unique(gathered[gathered > 0])
    else:
        powers = np.unique(np.asarray(powers, np.float64))
        missing = np.setdiff1d(loc.astype(np_dtype),
                               powers.astype(np_dtype))
        if missing.size:
            raise ValueError(
                f"stim levels {missing.tolist()} on process "
                f"{jax.process_index()} are not in powers="
                f"{powers.tolist()} — every stimulated level must be "
                "in the table (matching the single-process contract)")
    return np.unique(powers.astype(np_dtype)).astype(np.float64)


def _pad_local(psc_local, stim_local, K_pad_loc):
    """Zero-pad this process's shard to the agreed width; returns the
    padded pair plus the [K_pad_loc] validity mask."""
    K_loc = psc_local.shape[0]
    pad = K_pad_loc - K_loc
    if pad:
        psc_local = np.concatenate(
            [psc_local, np.zeros((pad, psc_local.shape[1]),
                                 psc_local.dtype)])
        stim_local = np.concatenate(
            [stim_local,
             np.zeros((stim_local.shape[0], pad), stim_local.dtype)],
            axis=1)
    valid = np.zeros(K_pad_loc, np.float32)
    valid[:K_loc] = 1.0
    return psc_local, stim_local, valid


def _keep_mask(k_all, K_pad_loc):
    """Boolean mask over the gathered [.., K_pad_global] axis selecting
    real (non-padding) trials, in process order."""
    if K_pad_loc * len(k_all) == int(k_all.sum()):
        return np.ones(int(k_all.sum()), bool)
    return np.concatenate(
        [np.arange(K_pad_loc) < int(k) for k in k_all])


# bound on the FLEETING per-device replicated buffer a gather may
# materialise (bytes). A single whole-array all-gather would put the
# full [N, K_pad_global] on EVERY device — at the pod scale this
# module exists for that is itself an OOM (e.g. [5000, 1e6] f32 =
# 20 GB against 16 GB HBM), killing the fit its checkpoint was meant
# to protect. Chunking the trial axis caps the spike at ~0.8 GB.
_GATHER_CHUNK_BYTES = 8e8


@_functools.lru_cache(maxsize=512)
def _slice_gather_jit(mesh, lo, hi, axis):
    """Memoised jitted static-slice-to-replicated gather. A fresh
    ``partial`` per call would miss jax's jit cache and re-trace every
    chunk on every checkpoint segment; keying on (mesh, lo, hi, axis)
    reuses the compiled executable across segments."""
    from jax import lax

    sh_r = NamedSharding(mesh, P())
    if axis < 0:  # 0-d passthrough gather
        return jax.jit(lambda a: a, out_shardings=sh_r)
    return jax.jit(
        _functools.partial(lax.slice_in_dim, start_index=lo,
                           limit_index=hi, axis=axis),
        out_shardings=sh_r)


def _gather_chunked(mesh, arr, pull=True):
    """All-gather a trial-sharded global array to host, in bounded
    trial-axis chunks (static-slice jits — identical program sequence
    on every process, so the collectives line up). ``pull=False`` joins
    every chunk's collective but skips the host copies (non-writer
    processes in the checkpoint loop)."""
    if arr.ndim == 0:
        chunk = _slice_gather_jit(mesh, 0, 0, -1)(arr)
        return np.asarray(chunk) if pull else jax.block_until_ready(chunk)
    axis = arr.ndim - 1  # the trial axis is last on every gathered array
    K = arr.shape[axis]
    other = max(1, int(np.prod(arr.shape[:-1])))
    block = max(1, int(_GATHER_CHUNK_BYTES
                       // (other * np.dtype(arr.dtype).itemsize)))
    outs = []
    for lo in range(0, K, block):
        chunk = _slice_gather_jit(mesh, lo, min(K, lo + block), axis)(arr)
        if pull:
            outs.append(np.asarray(chunk))
        else:
            jax.block_until_ready(chunk)
    if not pull:
        return None
    return outs[0] if len(outs) == 1 else np.concatenate(outs, axis=axis)


def _gather_full(mesh, *arrays):
    """Chunked all-gather of sharded global arrays, pulled to host."""
    return [_gather_chunked(mesh, a) for a in arrays]


def _prep_caviar_distributed(psc_local, stim_local, mesh, np_dtype,
                             y_xcorr_thresh, powers, trace_wire=None):
    """Per-host prep shared by the one-shot and resumable distributed
    CAVIaR entries: agree on the global shard plan, pad the local
    trials, run local observation prep, and assemble the global
    (process-spanning) device arrays.

    Host-side prep (observations, activity mask, power counts) touches
    only this process's trials — the per-host feeding contract — plus
    three tiny metadata all-gathers (trial counts, power set,
    power-bucket counts).
    """
    psc_local = np.asarray(psc_local)
    stim_local = np.asarray(stim_local)
    K_loc = psc_local.shape[0]
    N = stim_local.shape[0]

    rows, K_pad_loc, K_global, k_all = _plan_shards(K_loc, mesh)
    powers_dev = _global_powers(stim_local, powers, np_dtype)
    levels = np.concatenate([[0.0], powers_dev])
    psc_local, stim_local, valid_loc = _pad_local(
        psc_local, stim_local, K_pad_loc)

    # per-host observation prep: local device compute, host-resident
    # out. prepare_traces gives this entry the same compressed trace
    # wire (f16/int8/int4/int4d2) and chunked host-cast hygiene as the
    # single-process solvers — on-node host->HBM is fast, but thin-link
    # feeding (an acquisition host streaming shards in) is not.
    from ..ops.charge import prepare_observations
    from ..solvers._common import prepare_traces

    y_loc, active_loc = prepare_observations(
        prepare_traces(psc_local, np_dtype, trace_wire=trace_wire),
        y_xcorr_thresh)
    y_loc = np.asarray(y_loc)
    lam_mask_loc = np.asarray(active_loc).astype(np.float32) * valid_loc
    lam0_loc = np.where(stim_local > 0, 0.95, 0.0).astype(np.float32) \
        * lam_mask_loc[None, :]

    # global power-bucket counts: sum of per-process local counts.
    # One [N, K_loc] comparison per level instead of a broadcast
    # [N, K_loc, P] temporary (1.5 GB host spike at pod-scale K_loc)
    stim_real = stim_local[:, :K_loc].astype(np_dtype, copy=False)
    pc_loc = np.stack(
        [(stim_real == np_dtype.type(p)).sum(axis=1) for p in powers_dev],
        axis=1).astype(np.float64)
    power_counts = _allgather_host(pc_loc).sum(axis=0)

    # assemble global arrays from the per-process shards
    sh_t = NamedSharding(mesh, P(TRIAL_AXIS))
    sh_nt = NamedSharding(mesh, P(None, TRIAL_AXIS))
    sh_r = NamedSharding(mesh, P())
    mk = jax.make_array_from_process_local_data

    def cast(a):
        return np.asarray(a, dtype=np_dtype)

    def rep(a):
        return mk(sh_r, cast(a))

    return dict(
        N=N, K_loc=K_loc, rows=rows, K_pad_loc=K_pad_loc,
        K_global=K_global, k_all=k_all,
        powers_dev=powers_dev, levels=levels, power_counts=power_counts,
        y_g=mk(sh_t, cast(y_loc)),
        stim_g=mk(sh_nt, cast(stim_local)),
        lam0_g=mk(sh_nt, cast(lam0_loc)),
        lam_mask_g=mk(sh_t, cast(lam_mask_loc)),
        valid_g=mk(sh_t, cast(valid_loc)),
        sh_t=sh_t, sh_nt=sh_nt, sh_r=sh_r, mk=mk, rep=rep, cast=cast,
    )


def caviar_sharded_distributed(
    psc_local,
    stim_local,
    mu_prior,
    beta_prior,
    shape_prior,
    rate_prior,
    phi_prior,
    phi_cov_prior,
    mesh=None,
    iters=50,
    num_mc_samples=100,
    seed=0,
    y_xcorr_thresh=1e-2,
    minimum_spike_count=3,
    delay_spont_est=1,
    msrmp=0.3,
    scale_factor=0.75,
    penalty=5e0,
    max_backtrack_iters=20,
    tol=0.05,
    spont_orthogonality=0.1,
    dtype=jnp.float32,
    analytic_mc=False,
    powers=None,
    sweep_block_size=1,
    laplace_impl="auto",
    update_order="random",
    trace_wire=None,
    gather_output=True,
    verbose=True,
):
    """Fit CAVIaR across processes, each feeding its own trials.

    ``psc_local`` [K_local, T] and ``stim_local`` [N, K_local] are the
    trials *this process* holds; different processes may hold different
    counts. Global trial order is process order (process 0's trials
    first). Posterior contract matches ``caviar_sharded`` with
    ``fn_scan=False, save_histories=False``: returns ``(mu, beta, lam,
    shape, rate, phi, phi_cov, z, None)``. With ``gather_output=True``
    (default) ``lam``/``z`` are all-gathered and padding-trimmed so
    every process returns the full [N, K_global] posterior; with False
    they stay as global sharded ``jax.Array``s (pull shards with
    ``jax.experimental.multihost_utils``).

    Host-side prep (observations, activity mask, power counts) runs on
    each process's own trials only — the per-host feeding contract —
    then three tiny metadata all-gathers agree on the global trial
    count, power set, and power-bucket counts.
    """
    if mesh is None:
        mesh = global_trial_mesh()
    np_dtype = np.dtype(dtype)
    prep = _prep_caviar_distributed(psc_local, stim_local, mesh, np_dtype,
                                    y_xcorr_thresh, powers,
                                    trace_wire=trace_wire)
    K_global, k_all, K_pad_loc = (prep["K_global"], prep["k_all"],
                                  prep["K_pad_loc"])
    rep, mk, sh_r = prep["rep"], prep["mk"], prep["sh_r"]

    if verbose and jax.process_index() == 0:
        print(f"Running CAVIaR over {jax.process_count()} processes / "
              f"{mesh.devices.size} devices (K_global={K_global}, "
              f"rows/device={prep['rows']}).")

    key = np.asarray(jax.random.PRNGKey(seed))
    final, _ = _run_sharded(
        prep["y_g"], prep["stim_g"], prep["lam0_g"], prep["lam_mask_g"],
        prep["valid_g"],
        rep(prep["powers_dev"]), rep(prep["levels"]),
        rep(prep["power_counts"]),
        rep(np.float64(K_global)),
        rep(mu_prior), rep(beta_prior), rep(shape_prior), rep(rate_prior),
        rep(phi_prior), rep(phi_cov_prior),
        mk(sh_r, key),
        mesh=mesh,
        iters=int(iters),
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
        sweep_block_size=_resolve_sweep_block_size(sweep_block_size),
        update_order=_validate_update_order(str(update_order)),
        laplace_impl=_resolve_laplace_impl(laplace_impl, dtype),
    )

    mu = np.asarray(final.mu)  # replicated outputs: addressable everywhere
    beta = np.asarray(final.beta)
    shape = np.asarray(final.shape)
    rate = np.asarray(final.rate)
    phi = np.asarray(final.phi)
    phi_cov = np.asarray(final.phi_cov)

    if not gather_output:
        return (mu, beta, final.lam, shape, rate, phi, phi_cov, final.z,
                None)

    # all-gather the trial-sharded posteriors, then drop padding columns
    lam_full, z_full = _gather_full(mesh, final.lam, final.z)
    keep = _keep_mask(k_all, K_pad_loc)
    return (mu, beta, lam_full[:, keep], shape, rate, phi, phi_cov,
            z_full[keep], None)


def caviar_resumable_distributed(
    psc_local,
    stim_local,
    mu_prior,
    beta_prior,
    shape_prior,
    rate_prior,
    phi_prior,
    phi_cov_prior,
    checkpoint_path,
    mesh=None,
    iters=50,
    checkpoint_every=10,
    num_mc_samples=100,
    seed=0,
    y_xcorr_thresh=1e-2,
    minimum_spike_count=3,
    delay_spont_est=1,
    msrmp=0.3,
    scale_factor=0.75,
    penalty=5e0,
    max_backtrack_iters=20,
    tol=0.05,
    spont_orthogonality=0.1,
    dtype=jnp.float32,
    analytic_mc=False,
    powers=None,
    sweep_block_size=1,
    laplace_impl="auto",
    update_order="random",
    trace_wire=None,
    gather_output=True,
    verbose=True,
):
    """Segmented multi-process CAVIaR with checkpoint/resume — failure
    recovery at pod scale (solvers/resumable.py x
    :func:`caviar_sharded_distributed`; the reference's only recovery
    story is re-running the whole SLURM array job).

    After every ``checkpoint_every`` iterations the GLOBAL state is
    all-gathered, trimmed to the true ``K_global``, and written
    atomically by process 0 (utils/checkpoint.save_state — temp +
    os.replace, so a preemption mid-save never corrupts the previous
    checkpoint). The file format matches the single-process resumable
    checkpoints and is independent of process count and mesh size: a
    fit started on one layout resumes on another — including on a
    single chip via ``solvers.caviar_resumable`` — provided each
    process feeds the same global trial order (process-order
    concatenation of the local shards). ``checkpoint_path`` must be on
    a filesystem process 0 can write and every process can read at
    resume time (the usual shared-FS pod setup).

    Iteration indices line up exactly with an unsegmented run (traced
    ``start_iter``, as in the single-process segments), so gate delays
    and the spontaneous soft-threshold schedule match
    ``caviar_sharded_distributed`` over the same total ``iters``.
    Posterior/return contract matches it too (``fn_scan=False``
    semantics).
    """
    import os

    from ..solvers.caviar import CaviarState
    from ..utils.checkpoint import load_state, save_state

    if int(iters) < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if int(checkpoint_every) < 1:
        # same contract as solvers.caviar_resumable; 0 would spin the
        # whole pod in an infinite gather/save loop
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}")
    if mesh is None:
        mesh = global_trial_mesh()
    np_dtype = np.dtype(dtype)
    prep = _prep_caviar_distributed(psc_local, stim_local, mesh, np_dtype,
                                    y_xcorr_thresh, powers,
                                    trace_wire=trace_wire)
    N, K_loc = prep["N"], prep["K_loc"]
    K_global, k_all, K_pad_loc = (prep["K_global"], prep["k_all"],
                                  prep["K_pad_loc"])
    rep, mk, sh_r = prep["rep"], prep["mk"], prep["sh_r"]
    head = verbose and jax.process_index() == 0

    start = 0
    state = None
    if os.path.exists(checkpoint_path):
        ck = load_state(checkpoint_path)
        start = int(ck.pop("completed_iters"))
        lam_ck = np.asarray(ck["lam"])
        if lam_ck.shape != (N, K_global):
            raise ValueError(
                f"checkpoint carries lam{lam_ck.shape} but this cluster "
                f"feeds [N={N}, K_global={K_global}] trials — a resumed "
                "fit must see the same global trial set")
        # slice this process's trial columns back out of the global
        # checkpoint (global order = process-order concatenation)
        off = int(k_all[:jax.process_index()].sum())
        lam_loc = np.zeros((N, K_pad_loc), np_dtype)
        lam_loc[:, :K_loc] = lam_ck[:, off:off + K_loc]
        z_loc = np.zeros(K_pad_loc, np_dtype)
        z_loc[:K_loc] = np.asarray(ck["z"])[off:off + K_loc]
        state = CaviarState(
            mu=rep(ck["mu"]), beta=rep(ck["beta"]),
            lam=mk(prep["sh_nt"], lam_loc),
            shape=rep(ck["shape"]), rate=rep(ck["rate"]),
            phi=rep(ck["phi"]), phi_cov=rep(ck["phi_cov"]),
            z=mk(prep["sh_t"], z_loc),
            spont_rate=rep(ck["spont_rate"]),
            key=mk(sh_r, np.asarray(ck["key"], np.uint32)),
        )
        if head:
            print(f"Resuming distributed CAVIaR from iteration {start} "
                  f"({checkpoint_path}).")

    if head and start < iters:
        print(f"Running resumable CAVIaR over {jax.process_count()} "
              f"processes / {mesh.devices.size} devices "
              f"(K_global={K_global}, rows/device={prep['rows']}).")

    static = dict(
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
        sweep_block_size=_resolve_sweep_block_size(sweep_block_size),
        update_order=_validate_update_order(str(update_order)),
        laplace_impl=_resolve_laplace_impl(laplace_impl, dtype),
    )
    key = np.asarray(jax.random.PRNGKey(seed))
    keep = _keep_mask(k_all, K_pad_loc)

    def _gather_host_state(st, pull):
        """All-gather lam/z in bounded chunks (_gather_chunked — a
        whole-array replicated gather would OOM the devices at the pod
        scale this entry serves; every process joins the collectives),
        but pull the multi-GB host copies only where ``pull`` — during
        the segment loop that is process 0 alone, the one writer;
        pulling on every process would pay the device->host transfer P
        times per checkpoint for a single file write."""
        lam_r = _gather_chunked(mesh, st.lam, pull=pull)
        z_r = _gather_chunked(mesh, st.z, pull=pull)
        if not pull:
            return None
        return dict(
            mu=np.asarray(st.mu), beta=np.asarray(st.beta),
            lam=np.asarray(lam_r)[:, keep], shape=np.asarray(st.shape),
            rate=np.asarray(st.rate), phi=np.asarray(st.phi),
            phi_cov=np.asarray(st.phi_cov), z=np.asarray(z_r)[keep],
            spont_rate=np.asarray(st.spont_rate),
            key=np.asarray(st.key),
        )

    while start < iters:
        seg = min(checkpoint_every, iters - start)
        state, _ = _run_sharded(
            prep["y_g"], prep["stim_g"], prep["lam0_g"],
            prep["lam_mask_g"], prep["valid_g"],
            rep(prep["powers_dev"]), rep(prep["levels"]),
            rep(prep["power_counts"]),
            rep(np.float64(K_global)),
            rep(mu_prior), rep(beta_prior), rep(shape_prior),
            rep(rate_prior), rep(phi_prior), rep(phi_cov_prior),
            mk(sh_r, key), state,
            mesh=mesh, iters=seg, start_iter=start, **static,
        )
        start += seg
        host = _gather_host_state(state, pull=jax.process_index() == 0)
        if jax.process_index() == 0:
            save_state(checkpoint_path,
                       {**host, "completed_iters": np.asarray(start)})
        if head:
            print(f"checkpointed after iteration {start}/{iters}")

    if not gather_output:
        return (np.asarray(state.mu), np.asarray(state.beta), state.lam,
                np.asarray(state.shape), np.asarray(state.rate),
                np.asarray(state.phi), np.asarray(state.phi_cov),
                state.z, None)
    # the return contract pulls the full posterior on EVERY process
    # (workers export identical results), unlike the proc-0-only
    # checkpoint pulls above
    host = _gather_host_state(state, pull=True)
    return (host["mu"], host["beta"], host["lam"], host["shape"],
            host["rate"], host["phi"], host["phi_cov"], host["z"], None)


def cavi_sns_sharded_distributed(
    psc_local,
    stim_local,
    mu_prior,
    beta_prior,
    alpha_prior,
    shape_prior,
    rate_prior,
    phi_prior,
    phi_cov_prior,
    mesh=None,
    iters=50,
    num_mc_samples=100,
    seed=1,
    minimum_spike_count=3,
    dtype=jnp.float32,
    analytic_mc=False,
    powers=None,
    laplace_impl="auto",
    trace_wire=None,
    gather_output=True,
    verbose=True,
):
    """CAVI-SnS across processes, each feeding its own trials.

    Per-host contract as :func:`caviar_sharded_distributed`; posterior
    contract as ``cavi_sns_sharded`` with ``save_histories=False``:
    returns ``(mu, beta, alpha, lam, shape, rate, phi, phi_cov)``.
    As in the single-device solver no trial-activity mask is applied
    (reference cavi_sns.py:24-25) — validity only excludes padding.
    """
    from .sharded import _run_sns_sharded
    from ..ops.charge import integrated_charge
    from ..solvers._laplace import _resolve_laplace_impl as _res_lap

    if mesh is None:
        mesh = global_trial_mesh()
    psc_local = np.asarray(psc_local)
    stim_local = np.asarray(stim_local)
    K_loc = psc_local.shape[0]
    np_dtype = np.dtype(dtype)

    rows, K_pad_loc, K_global, k_all = _plan_shards(K_loc, mesh)
    powers_dev = _global_powers(stim_local, powers, np_dtype)
    levels = np.concatenate([[0.0], powers_dev])
    psc_local, stim_local, valid_loc = _pad_local(
        psc_local, stim_local, K_pad_loc)

    from ..solvers._common import prepare_traces

    y_loc = np.asarray(integrated_charge(
        prepare_traces(psc_local, np_dtype, trace_wire=trace_wire)))
    lam0_loc = np.where(stim_local > 0, 0.95, 0.0).astype(np.float32) \
        * valid_loc[None, :]

    if verbose and jax.process_index() == 0:
        print(f"Running CAVI-SnS over {jax.process_count()} processes / "
              f"{mesh.devices.size} devices (K_global={K_global}).")

    sh_t = NamedSharding(mesh, P(TRIAL_AXIS))
    sh_nt = NamedSharding(mesh, P(None, TRIAL_AXIS))
    sh_r = NamedSharding(mesh, P())
    mk = jax.make_array_from_process_local_data

    def cast(a):
        return np.asarray(a, dtype=np_dtype)

    def rep(a):
        return mk(sh_r, cast(a))

    final, _ = _run_sns_sharded(
        mk(sh_t, cast(y_loc)),
        mk(sh_nt, cast(stim_local)),
        mk(sh_nt, cast(lam0_loc)),
        mk(sh_t, cast(valid_loc)),   # lam_mask == validity for SnS
        mk(sh_t, cast(valid_loc)),
        rep(levels),
        rep(np.float64(K_global)),
        rep(mu_prior), rep(beta_prior), rep(alpha_prior),
        rep(shape_prior), rep(rate_prior), rep(phi_prior),
        rep(phi_cov_prior),
        mk(sh_r, np.asarray(jax.random.PRNGKey(seed))),
        mesh=mesh,
        iters=int(iters),
        num_mc_samples=int(num_mc_samples),
        minimum_spike_count=int(minimum_spike_count),
        analytic_mc=bool(analytic_mc),
        save_histories=False,
        laplace_impl=_res_lap(laplace_impl, dtype),
    )
    mu, beta, alpha = (np.asarray(final.mu), np.asarray(final.beta),
                       np.asarray(final.alpha))
    shape, rate = np.asarray(final.shape), np.asarray(final.rate)
    phi, phi_cov = np.asarray(final.phi), np.asarray(final.phi_cov)
    if not gather_output:
        return (mu, beta, alpha, final.lam, shape, rate, phi, phi_cov)
    (lam_full,) = _gather_full(mesh, final.lam)
    keep = _keep_mask(k_all, K_pad_loc)
    return (mu, beta, alpha, lam_full[:, keep], shape, rate, phi, phi_cov)


def mbcs_sharded_distributed(
    psc_local,
    stim_local,
    mu_prior,
    beta_prior,
    shape_prior,
    rate_prior,
    mesh=None,
    iters=50,
    seed=0,
    y_xcorr_thresh=0.05,
    penalty=5e0,
    scale_factor=0.5,
    max_penalty_iters=10,
    max_lasso_iters=100,
    constrain_weights="positive",
    learn_lam=True,
    delay_spont_estimation=1,
    minimum_spike_count=1,
    noise_scale=0.5,
    num_mc_samples_noise_model=10,
    minimum_maximal_spike_prob=0.2,
    orthogonal_outliers=True,
    outlier_penalty=5e1,
    init_spike_prior=0.75,
    outlier_tol=0.05,
    spont_rate=0,
    lam_mask_fraction=0.05,
    dtype=jnp.float32,
    analytic_noise=False,
    powers=None,
    trace_wire=None,
    gather_output=True,
    verbose=True,
):
    """MBCS across processes, each feeding its own trials.

    Per-host contract as :func:`caviar_sharded_distributed`; posterior
    contract as ``mbcs_sharded`` with ``save_histories=False``:
    returns ``(mu, beta, lam, shape, rate, z, receptive_fields)``.
    The activity mask's relative-peak cut uses the GLOBAL trace peak
    (one scalar all-gather); everything else preps per-host.
    """
    from .sharded import _run_mbcs_sharded

    if mesh is None:
        mesh = global_trial_mesh()
    psc_local = np.asarray(psc_local)
    stim_local = np.asarray(stim_local)
    K_loc = psc_local.shape[0]
    N = stim_local.shape[0]
    np_dtype = np.dtype(dtype)

    rows, K_pad_loc, K_global, k_all = _plan_shards(K_loc, mesh)
    powers_dev = _global_powers(stim_local, powers, np_dtype)
    pw = np.concatenate([[0.0], powers_dev])

    # host activity mask on the REAL local trials (mbcs.py:41-42
    # analogue); the relative-peak term compares against the global max
    energy = np.sum(psc_local * psc_local, axis=-1)
    local_max = psc_local.max() if K_loc else 0.0
    global_max = float(_allgather_host(
        np.asarray([local_max], np.float64)).max())
    lam_mask_loc = (energy > y_xcorr_thresh).astype(np.float32)
    lam_mask_loc[np.max(psc_local, axis=1)
                 < lam_mask_fraction * global_max] = 0.0

    psc_local, stim_local, valid_loc = _pad_local(
        psc_local, stim_local, K_pad_loc)
    lam_mask_loc = np.concatenate(
        [lam_mask_loc, np.zeros(K_pad_loc - K_loc, np.float32)])

    from ..ops.charge import integrated_charge

    from ..solvers._common import prepare_traces

    y_loc = np.asarray(integrated_charge(
        prepare_traces(psc_local, np_dtype, trace_wire=trace_wire)))
    lam0_loc = np.where(stim_local > 0, float(init_spike_prior),
                        0.0).astype(np.float32) * lam_mask_loc[None, :]

    rng = np.random.default_rng(seed)  # same seed everywhere: replicated
    mu0 = rng.lognormal(1.0, 1.0, N)

    if verbose and jax.process_index() == 0:
        print(f"Running MBCS over {jax.process_count()} processes / "
              f"{mesh.devices.size} devices (K_global={K_global}).")

    sh_t = NamedSharding(mesh, P(TRIAL_AXIS))
    sh_nt = NamedSharding(mesh, P(None, TRIAL_AXIS))
    sh_r = NamedSharding(mesh, P())
    mk = jax.make_array_from_process_local_data

    def cast(a):
        return np.asarray(a, dtype=np_dtype)

    def rep(a):
        return mk(sh_r, cast(a))

    final, _ = _run_mbcs_sharded(
        mk(sh_t, cast(y_loc)),
        mk(sh_nt, cast(stim_local)),
        mk(sh_nt, cast(lam0_loc)),
        mk(sh_t, cast(lam_mask_loc)),
        mk(sh_t, cast(valid_loc)),
        rep(pw),
        rep(np.float64(K_global)),
        rep(mu0),
        rep(beta_prior),
        mk(sh_t, np.full(K_pad_loc, float(shape_prior), np_dtype)),
        mk(sh_t, np.full(K_pad_loc, float(rate_prior), np_dtype)),
        mk(sh_r, np.asarray(jax.random.PRNGKey(seed))),
        rep(penalty), rep(scale_factor), rep(outlier_penalty),
        rep(minimum_maximal_spike_prob), rep(spont_rate),
        rep(outlier_tol), rep(noise_scale),
        mesh=mesh,
        iters=int(iters),
        max_penalty_iters=int(max_penalty_iters),
        max_lasso_iters=int(max_lasso_iters),
        constrain_weights=str(constrain_weights),
        learn_lam=bool(learn_lam),
        delay_spont_estimation=int(delay_spont_estimation),
        minimum_spike_count=int(minimum_spike_count),
        num_mc_samples_noise_model=int(num_mc_samples_noise_model),
        orthogonal_outliers=bool(orthogonal_outliers),
        save_histories=False,
        analytic_noise=bool(analytic_noise),
    )
    (mu_f, beta_f, lam, shape_f, rate_f, z, _spont, _prior, rf,
     _key) = final
    mu_f, beta_f, rf = (np.asarray(mu_f), np.asarray(beta_f),
                        np.asarray(rf))
    if not gather_output:
        return (mu_f, beta_f, lam, shape_f, rate_f, z, rf)
    lam_full, shape_full, rate_full, z_full = _gather_full(
        mesh, lam, shape_f, rate_f, z)
    keep = _keep_mask(k_all, K_pad_loc)
    return (mu_f, beta_f, lam_full[:, keep], shape_full[keep],
            rate_full[keep], z_full[keep], rf)
