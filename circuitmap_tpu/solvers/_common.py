"""Shared host->device preamble for the solvers.

Every solver takes the [N, K] stimulus design matrix from host memory.
On a bandwidth-limited link (CLAUDE.md: the tunneled TPU moves ~50 MB/s
with ~0.5 s per dispatch) two things matter: ship few bytes, and issue
few programs. So stim ships in hologram form when it is column-sparse —
each trial stimulates at most H of N neurons, so [H, K] target indices
+ power buckets carry the same information as the dense [N, K] matrix
in ~N/H x fewer bytes (0.6 MB vs 20 MB at the bench shape) — falling
back to int8 bucket indices (4x smaller than f32: stim takes only P+1
distinct values), and every eager device op of the prep path is fused
into one jitted program: a single dispatch instead of one per op.

Precision contract: the DEVICE stimulus holds the f32 level values
(bucketed reconstruction), while the HOST powers returned to callers
keep the original precision of the stim matrix — the host-side
reconnection scan compares them against the original stim, so both
sides always agree on which trials carry which power. Because the two
can differ under float64 (a non-f32-representable power like 45.7
round-trips through the f32 level table), the prepare functions return
BOTH: ``powers_np`` for host comparisons against the original stim and
``powers_dev_np`` for building any device-side powers/levels array —
the values that are actually present in the uploaded stim. Mixing them
up silently zeroes every on-device ``stim == powers[p]`` match for f64
fits (round-2 advisor finding).
"""

from __future__ import annotations

import warnings
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


# Measured single-chip working-set ceiling (MEMORY_CLIFF.json, 16 GB
# TPU v5e): N=5000 x K_pad=100096 (~5.0e8 elements per [N, K] array)
# fits; 1e9 elements asks 23.3 GB of HBM and dies. The ladder puts the
# cliff at ~6.8e8 elements.
_SINGLE_CHIP_ELEM_CLIFF = 6.8e8


class MemoryEnvelopeWarning(ResourceWarning):
    """Single-chip HBM-envelope preflight (warn_single_chip_envelope).

    Subclasses ResourceWarning for category semantics, but is
    registered under ``warnings.simplefilter`` as always-shown below:
    CPython's DEFAULT filters ignore ResourceWarning, which would make
    the preflight silent in exactly the plain-`python script.py`
    production context it exists for (it would only print under
    pytest/-W default/dev mode)."""


# default-visible regardless of Python's ignore::ResourceWarning default;
# users can still silence it explicitly with
# warnings.filterwarnings("ignore", category=MemoryEnvelopeWarning)
warnings.simplefilter("always", MemoryEnvelopeWarning)


def warn_single_chip_envelope(n_rows, k, what="this fit", dtype=None):
    """Route oversized single-chip fits toward the sharded path BEFORE
    XLA's opaque RESOURCE_EXHAUSTED (which takes ~45 s to surface
    through the tunnel — MEMORY_CLIFF.json protocol notes).

    Fires a MemoryEnvelopeWarning (a default-visible ResourceWarning
    subclass) when the [n_rows, K] working set exceeds
    the envelope measured on a 16 GB chip. The cliff is a BYTE budget
    (HBM), measured with f32 arrays — a wider fit dtype scales the
    effective element count by ``itemsize/4`` (an f64 fit hits the
    wall at half the elements). Advisory, not an error: a larger-HBM
    part moves the cliff, and the fit may still be the right call just
    under it. Silent on CPU backends (host RAM, not HBM, bounds
    those). Single-chip entries call this; the sharded/distributed
    paths — whose per-device working set is the point — do not.
    """
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - no backend at all
        return
    if backend == "cpu":
        return
    k_pad = -(-int(k) // 128) * 128
    itemsize = 4 if dtype is None else jnp.dtype(dtype).itemsize
    elems = int(n_rows) * k_pad * itemsize // 4  # f32-equivalent elements
    if elems > _SINGLE_CHIP_ELEM_CLIFF:
        warnings.warn(
            f"{what} allocates [{n_rows}, {k_pad}] working arrays "
            f"({elems:.2e} f32-equivalent elements), past the ~6.8e8-"
            "element single-chip envelope measured on a 16 GB TPU v5e "
            "(MEMORY_CLIFF.json) — expect HBM exhaustion. Shard trials "
            "over a mesh instead: parallel.caviar_sharded(mesh=...) on "
            "one host, or parallel.distributed.* on a multi-host slice "
            "(docs/DEPLOY.md has the recipe).",
            MemoryEnvelopeWarning, stacklevel=3)


class DataThinDesignWarning(UserWarning):
    """Design-identifiability preflight (warn_data_thin_design)."""


# measured identifiability floor, in mean stimulations per neuron:
# SCALING.json rows at N=5000/K=20000 — H=10 (40 stims/neuron) recovers
# R²=0.953 and H=20 (80) 0.974, while K=60000/H=10 (120) reaches 0.9875
# and K=60000/H=20 (240) 0.9952. Below ~100 the weakest rows of the
# design, not the solver, bound recovery. The floor is a LARGE-N
# phenomenon (hologram collisions: each trial's charge divides over H
# candidates drawn from N): small maps recover fine on thin designs
# (N=50/H=5 at 40 stims/neuron measures R²≈0.99), so the check only
# arms at N >= _DATA_THIN_MIN_N — where the scaling study actually
# observed design-bound recovery (N=2000 at 100 stims/neuron: 0.988).
_DATA_THIN_STIMS_PER_NEURON = 100.0
_DATA_THIN_MIN_N = 2000


def warn_data_thin_design(power_counts_np, k, what="this fit"):
    """Flag designs too thin to identify their own circuit BEFORE the
    fit spends minutes producing a mediocre map.

    The N=5000 scaling rows showed sub-0.99 recovery that read like a
    solver ceiling but was a design artifact (~40 stimulations per
    neuron); the same N recovers R² 0.995 at 240 stims/neuron
    (SCALING.md). Fires a DataThinDesignWarning when the MEAN
    per-neuron stimulation count is below the measured ~100-stim
    identifiability floor, naming the two design levers (trials K,
    targets-per-trial H). Advisory: sparse circuits and strong weights
    can still resolve below the floor. ``power_counts_np`` is the
    [N, P] per-neuron trial count per power that the sparse stim
    upload computes for free (prepare_stim_and_init); None (dense
    upload paths) skips the check rather than paying an [N, K] pass.
    """
    if power_counts_np is None:
        return
    per_neuron = np.asarray(power_counts_np).sum(axis=1)
    if per_neuron.size < _DATA_THIN_MIN_N:
        return
    _warn_data_thin(float(per_neuron.mean()), per_neuron.size, k, what)


def warn_data_thin_design_dense(stim_np, k_true=None, what="this fit"):
    """Data-thin preflight for entries WITHOUT free per-neuron counts
    (the sharded/SnS/MBCS prep paths keep the dense design): one
    host `count_nonzero` pass, paid only at N >= the floor's arming
    threshold — small maps skip the scan entirely."""
    stim_np = np.asarray(stim_np)
    n = stim_np.shape[0]
    if n < _DATA_THIN_MIN_N:
        return
    k = int(stim_np.shape[1] if k_true is None else k_true)
    mean_stims = float(np.count_nonzero(stim_np)) / n
    _warn_data_thin(mean_stims, n, k, what)


def _warn_data_thin(mean_stims, n, k, what):
    if mean_stims < _DATA_THIN_STIMS_PER_NEURON:
        warnings.warn(
            f"{what}: the design stimulates each neuron "
            f"~{mean_stims:.0f} times on average ({n} "
            f"neurons over {int(k)} trials) — under the ~"
            f"{int(_DATA_THIN_STIMS_PER_NEURON)}-stim identifiability "
            "floor measured at N=5000 (R² 0.95 at 40 stims/neuron vs "
            "0.995 at 240; SCALING.md). Recovery will be bounded by "
            "the design, not the solver: raise the trial count K "
            "and/or the targets-per-trial H.",
            DataThinDesignWarning, stacklevel=4)


def prepare_traces(y_psc, dtype, trace_wire=None):
    """Cast traces host-side (half the transfer) unless already on device.

    The f32 wire applies only when the requested dtype is f32 or
    narrower — an explicit dtype=float64 fit (e.g. reference-parity
    oracle runs) must not silently lose mantissa bits in transit.

    ``trace_wire`` compresses the host->device upload when raw traces
    are fed straight to a solver (the demixed path already has this:
    demix/demixer.py transfer_dtype): "f16" halves it (~1e-3 relative
    quantisation), "int8" quarters it (per-trace peak scale, ~0.4% of
    peak — below recording noise; WIRE_STUDY.json measured int8 == f32
    truth-R2 to 4 decimals on the bench config), "int4" (two codes per
    byte) and "int4d2" (mean-pool 2x + int4, device upsample) shrink
    it 8x/16x — for SOLVER inputs the observation reduction is a
    trapezoid integral over 900 samples, which averages the
    quantisation noise out: measured truth-R2 within +-0.002 of f32 on
    raw-trace fits over 3 seeds (unlike the demixer path, no QAT
    checkpoint is needed). Opt-in: None keeps the exact f32 wire.
    Ignored for device-resident inputs; rejected for f64 fits
    (parity-oracle exactness).
    """
    if isinstance(y_psc, jax.Array):
        return y_psc.astype(dtype)
    if trace_wire not in (None, "f32", "f16", "int8", "int4", "int4d2"):
        raise ValueError(
            f"trace_wire must be None, 'f32', 'f16', 'int8', 'int4' or "
            f"'int4d2', got {trace_wire!r}")
    from ..utils.quant import PackedInt4Traces

    if isinstance(y_psc, PackedInt4Traces):
        # traces arrived already in int4 wire form (the HTTP fit
        # server's psc_q4 bodies): ship the codes as-is — the device
        # dequantise reconstructs exactly the dense host reconstruction
        # (requantise identity), so any recode could only lose
        # information or bytes. Exception: an explicitly-requested
        # int4d2 wire over non-pooled codes re-encodes (the caller
        # asked for half the upload bytes).
        if jnp.dtype(dtype).itemsize > 4:
            raise ValueError(
                "int4-wire trace bodies are incompatible with "
                "dtype=float64 fits (the wire already quantised the "
                "traces; parity-oracle fits need the raw f64 block)")
        if not (trace_wire == "int4d2" and y_psc.decimate == 1):
            K, T = y_psc.shape
            tw = (T + 1) // 2 if y_psc.decimate == 2 else T
            return _unpack_int4_traces(
                jnp.asarray(y_psc.packed), jnp.asarray(y_psc.scale),
                tw, T, y_psc.decimate == 2, dtype)
        y_psc = y_psc.dense()
    if jnp.dtype(dtype).itemsize > 4:
        if trace_wire is not None:
            raise ValueError(
                "trace_wire is incompatible with dtype=float64 "
                "(parity-oracle fits must keep full mantissa in transit)")
        return jnp.asarray(np.asarray(y_psc, dtype=np.float64), dtype=dtype)
    if trace_wire == "f16":
        # ship the NARROW array and widen inside jit — jnp.asarray with
        # a target dtype would host-cast to a fresh full-size f32 buffer
        # first (verified against jax's array(): np.asarray(obj, dtype)),
        # paying the page faults AND uploading full width. Cast into the
        # half-size f16 buffer in chunks to bound the host temporaries.
        arr = np.asarray(y_psc)
        h16 = np.empty(arr.shape, dtype=np.float16)
        step = 4096
        for k0 in range(0, arr.shape[0], step):
            h16[k0:k0 + step] = arr[k0:k0 + step]
        return _widen_traces(jnp.asarray(h16), dtype)
    if trace_wire == "int8":
        arr = np.asarray(y_psc)
        K = arr.shape[0]
        # quantise in row chunks: bounds the fresh f32 temporaries
        # (abs, arr/scale) to ~15 MB — a full-size temp at the bench
        # shape costs more in first-touch page faults than the wire
        # saves (CLAUDE.md host-memory rule; the demixer wire chunks
        # for the same reason). Only the int8 output (1/4 size) and
        # the [K] scales are allocated at full height.
        from ..utils.quant import quantise_int8

        q = np.empty(arr.shape, dtype=np.int8)
        scale = np.empty(K, dtype=np.float32)
        step = 4096
        for k0 in range(0, K, step):
            _, scale[k0:k0 + step] = quantise_int8(
                arr[k0:k0 + step], out=q[k0:k0 + step])
        return _dequantise_traces(jnp.asarray(q), jnp.asarray(scale), dtype)
    if trace_wire in ("int4", "int4d2"):
        from ..utils.quant import encode_int4_traces

        arr = np.asarray(y_psc)
        K, T = arr.shape
        tw = (T + 1) // 2 if trace_wire == "int4d2" else T
        t_pad = -(-tw // 2) * 2
        packed = np.empty((K, t_pad // 2), dtype=np.uint8)
        scale = np.empty(K, dtype=np.float32)
        step = 4096
        dec = 2 if trace_wire == "int4d2" else 1
        for k0 in range(0, K, step):
            # fused cast→pool→quantise→pack (native single pass when
            # available; numpy fallback quantises in f32 like the
            # reference transform, demix.demixer.wire_transform, so
            # codes agree bit-for-bit whatever the input dtype;
            # per-chunk processing bounds the temporaries)
            packed[k0:k0 + step], scale[k0:k0 + step] = \
                encode_int4_traces(arr[k0:k0 + step], decimate=dec)
        return _unpack_int4_traces(
            jnp.asarray(packed), jnp.asarray(scale), tw, T,
            trace_wire == "int4d2", dtype)
    return jnp.asarray(np.asarray(y_psc, dtype=np.float32), dtype=dtype)


@partial(jax.jit, static_argnames=("tw", "t_true", "upsample", "dtype"))
def _unpack_int4_traces(packed, scale, tw, t_true, upsample, dtype):
    """Device-side int4/int4d2 unpack — the demixer wire's unpack
    (demix/demixer._demix_and_filter_int4*) without the network."""
    from ..demix.demixer import _unpack_int4_codes, _upsample2

    codes = _unpack_int4_codes(packed, tw)
    traces = codes.astype(jnp.float32) * scale[:, None]
    if upsample:
        traces = _upsample2(traces, t_true, xp=jnp)
    return traces.astype(dtype)


@partial(jax.jit, static_argnames=("dtype",))
def _dequantise_traces(q, scale, dtype):
    return q.astype(dtype) * scale[:, None].astype(dtype)


@partial(jax.jit, static_argnames=("dtype",))
def _widen_traces(h, dtype):
    return h.astype(dtype)


def _levels(stim_np, powers=None):
    """Host side: sorted stimulation levels, original-precision + f32.

    ``powers`` (the rig's stimulation levels — experiment config, as in
    the reference harness YAMLs) skips the 20M-element np.unique scan;
    it is deduplicated here. Returns (powers_host, levels_np):
    powers_host keeps the stim matrix's own precision (host consumers
    compare it against stim directly), levels_np is the 0-prefixed f32
    table the device reconstruction uses.
    """
    if powers is None:
        cand = np.unique(stim_np)
    else:
        cand = np.unique(np.asarray(powers))
    cand = cand[cand != 0.0]
    if powers is None and cand.size > 1024:
        # a non-uniform (per-trial analog) power set: nearly every
        # level is observed once, so the per-power spike-rate stats
        # behind the isotonic connection gate are all single-trial
        # estimates — statistically meaningless — and the [N, P] level
        # machinery would scale with it. Real rigs stimulate at a few
        # discrete levels; a raw analog power column needs rounding
        raise ValueError(
            f"stim matrix contains {cand.size} distinct nonzero "
            "stimulation levels — the power-curve gate needs repeated "
            "trials per level. Pass powers=[...] with the rig's "
            "discrete command levels (values not in the set will be "
            "rejected), or round the stim matrix to its true levels "
            "before fitting")
    # bucketing happens in f32: dedupe there, keeping the first
    # original-precision representative of each f32 level
    lv32, first = np.unique(cand.astype(np.float32), return_index=True)
    powers_host = cand[first]
    levels_np = np.concatenate([[0.0], lv32]).astype(np.float32)
    return powers_host, levels_np


def _select_levels(levels, bucket):
    """bucket indices -> level values WITHOUT a gather.

    A [P+1]-table gather over N*K elements runs on the TPU's scalar
    gather path (measured ~2 s at 20M elements); P+1 compare-selects are
    pure VPU work and fuse into one pass. levels.shape is static under
    jit, so the loop unrolls.
    """
    b = bucket.astype(jnp.int32)
    stim = jnp.zeros(bucket.shape, levels.dtype)
    for p in range(1, levels.shape[0]):
        stim = stim + jnp.where(b == p, levels[p], jnp.zeros((), levels.dtype))
    return stim


@jax.jit
def _stim_from_buckets(levels, bucket):
    return _select_levels(levels, bucket)


def _power_mismatch_error(levels_np):
    return ValueError(
        "stim contains stimulation values not covered by the supplied "
        f"powers= levels {levels_np[1:].tolist()}; pass the exact set of "
        "power levels used in the experiment (or omit powers= to derive "
        "them from the stim matrix)"
    )


def _sparsify(stim_np, levels_np, max_fill=0.125):
    """Column-sparse hologram wire format, or None when dense is cheaper.

    Each trial (column) stimulates at most H neurons, so the bucket
    matrix compresses to [H, K] target indices (int16, -1 padded) plus
    [H, K] per-target power buckets (int8). Worth it when H is a small
    fraction of N — the device-side reconstruction is H fused
    compare-selects over [N, K]. Raises ValueError when stim contains
    values the level table cannot represent (a mismatched ``powers=``
    would otherwise silently corrupt the device stimulus).
    """
    N, K = stim_np.shape
    if N > 32766:
        return None
    # absolute cap alongside the relative one: the device reconstruction
    # unrolls H compare-select passes over [N, K], so a moderately dense
    # stim (H in the hundreds) would compile a huge program and lose to
    # the int8 bucket upload it displaces (round-2 advisor finding)
    h_cap = max(1, min(int(N * max_fill), 96))
    # native single-pass sparsifier (utils/native.sparsify_stim) when
    # the C++ library is available; identical wire contract
    from ..utils import native as _native

    out = _native.sparsify_stim(stim_np, levels_np, h_cap)
    if out == "overflow":
        return None  # too dense for hologram form; skip the numpy rescan
    if out is not None:
        return out
    # numpy fallback: scan a bool mask, transposed — nonzero() on the
    # [K, N] view comes out sorted by column already (no argsort), and
    # the bool pass reads 8x less memory than nonzero on the f64 matrix
    mask = stim_np != 0
    nz_k, nz_n = np.nonzero(mask.T)
    if nz_k.size == 0:
        return None
    counts = np.bincount(nz_k, minlength=K)
    H = int(counts.max())
    if H > h_cap:
        return None
    offsets = np.concatenate([[0], np.cumsum(counts)])
    slots = np.arange(nz_k.size) - offsets[nz_k]
    targets = np.full((H, K), -1, dtype=np.int16)
    tbucket = np.zeros((H, K), dtype=np.int8)
    targets[slots, nz_k] = nz_n.astype(np.int16)
    # bucket in f32 (casting only the nonzeros): levels are f32, and a
    # mixed f64/f32 searchsorted mis-buckets non-representable powers
    vals32 = stim_np[nz_n, nz_k].astype(np.float32)
    buckets = np.searchsorted(levels_np, vals32)
    safe = np.minimum(buckets, levels_np.size - 1)
    if not np.array_equal(levels_np[safe], vals32):
        raise _power_mismatch_error(levels_np)
    buckets = buckets.astype(np.int8)
    tbucket[slots, nz_k] = buckets
    # per-neuron trial counts per power, free from the triples — saves
    # the reconnect scan three [N, K] passes
    power_counts = np.zeros((N, levels_np.size - 1))
    np.add.at(power_counts, (nz_n, buckets.astype(np.int64) - 1), 1.0)
    return targets, tbucket, power_counts


def _bucketise_dense(stim_np, levels_np):
    """Dense int8 bucket matrix, validating level coverage."""
    stim32 = stim_np.astype(np.float32, copy=False)
    bucket = np.searchsorted(levels_np, stim32)
    safe = np.minimum(bucket, levels_np.size - 1)
    if not np.array_equal(levels_np[safe], stim32):
        raise _power_mismatch_error(levels_np)
    return bucket.astype(np.int8)


def _upload_plan(stim_np, powers):
    """Shared front half of the two prepare entry points.

    Returns (powers_host, levels_np, kind, payload) with kind one of
    "dense" (payload None), "sparse" (payload = (targets, tbucket,
    power_counts)), or "bucket" (payload = int8 bucket matrix).
    """
    powers_host, levels_np = _levels(stim_np, powers)
    if levels_np.size > 127:
        return powers_host, levels_np, "dense", None
    sparse = _sparsify(stim_np, levels_np)
    if sparse is not None:
        return powers_host, levels_np, "sparse", sparse
    return powers_host, levels_np, "bucket", _bucketise_dense(
        stim_np, levels_np)


def _stim_from_sparse(levels, targets, tbucket, n_neurons):
    """[H, K] hologram form -> dense [N, K] stim, fully on device.

    H compare-select passes (H is static, the loop unrolls) — pure VPU
    work, no gather/scatter.
    """
    vals = _select_levels(levels, tbucket)                    # [H, K]
    t32 = targets.astype(jnp.int32)
    iota = jax.lax.iota(jnp.int32, n_neurons)[:, None]        # [N, 1]
    K = targets.shape[1]
    stim = jnp.zeros((n_neurons, K), levels.dtype)
    for h in range(targets.shape[0]):
        stim = stim + jnp.where(
            t32[h][None, :] == iota, vals[h][None, :],
            jnp.zeros((), levels.dtype),
        )
    return stim


@partial(jax.jit, static_argnames=("n_neurons",))
def _stim_from_sparse_jit(levels, targets, tbucket, n_neurons):
    return _stim_from_sparse(levels, targets, tbucket, n_neurons)


def _powers_dev(powers_np, levels_np, kind):
    """The powers array matching the values present in the DEVICE stim.

    Dense uploads ship the original values (cast to dtype on upload), so
    the original-precision table is the consistent one; the bucketed and
    sparse reconstructions hold f32 level values widened to dtype, so
    device comparisons must use the f32-rounded table. Identical for
    dtype <= f32; differs exactly when an f64 fit uses powers that are
    not f32-representable (module docstring).
    """
    if kind == "dense":
        return powers_np
    return levels_np[1:].astype(np.float64)


def prepare_stim(stim, dtype, powers=None):
    """Returns (stim_device, stim_np, powers_np, powers_dev_np).

    Ships stim in sparse hologram form when the design is column-sparse
    (the practical case: H targets per trial), else as int8 power-bucket
    indices when there are at most 127 levels, else dense f32.
    ``powers_np`` is for host comparisons against ``stim_np``;
    ``powers_dev_np`` for any device-side powers/levels array (see
    module docstring on the f64 precision contract).
    """
    # no full-size f32 cast: a fresh [N, K] host buffer costs more than
    # the cast (first-touch page faults); host consumers (reconnect
    # scan, power counts) are dtype-agnostic numpy
    stim_np = np.asarray(stim)
    powers_np, levels_np, kind, payload = _upload_plan(stim_np, powers)
    pdev = _powers_dev(powers_np, levels_np, kind)
    if kind == "dense":
        return jnp.asarray(stim_np, dtype=dtype), stim_np, powers_np, pdev
    if kind == "sparse":
        targets, tbucket, _pc = payload
        stim_dev = _stim_from_sparse_jit(
            jnp.asarray(levels_np, dtype), jnp.asarray(targets),
            jnp.asarray(tbucket), stim_np.shape[0]
        )
        return stim_dev, stim_np, powers_np, pdev
    stim_dev = _stim_from_buckets(
        jnp.asarray(levels_np, dtype), jnp.asarray(payload)
    )
    return stim_dev, stim_np, powers_np, pdev


@jax.jit
def _mask_and_lam0_jit(stim, active):
    return _mask_and_lam0(stim, active)


def _mask_and_lam0(stim, active):
    lam_mask = active.astype(stim.dtype)
    lam0 = jnp.where(stim > 0, jnp.asarray(0.95, stim.dtype), 0.0) * lam_mask
    return lam_mask, lam0


@jax.jit
def _prep_stim_and_init(levels, bucket, active):
    """Fused solver preamble: stim gather + activity mask + lam init.

    One dispatch for what would otherwise be four eager ops through the
    tunnel (gather, astype, where, multiply).
    """
    stim = _select_levels(levels, bucket)
    return (stim,) + _mask_and_lam0(stim, active)


@partial(jax.jit, static_argnames=("n_neurons",))
def _prep_stim_and_init_sparse(levels, targets, tbucket, active, n_neurons):
    stim = _stim_from_sparse(levels, targets, tbucket, n_neurons)
    return (stim,) + _mask_and_lam0(stim, active)


def prepare_stim_and_init(stim, active, dtype, powers=None):
    """Device (stim, lam_mask, lam0) in a single compiled program.

    The lam0 = 0.95-on-targeted-trials initialisation is shared by
    caviar / resumable / sharded (reference caviar.py:32-34). Uploads
    the sparse hologram form when the design allows (see module
    docstring), falling back to int8 buckets, then dense f32.

    Returns (stim_dev, lam_mask, lam0, stim_np, powers_np,
    powers_dev_np, power_counts_np) — powers_np is for host comparisons
    against stim_np, powers_dev_np for device-side powers arrays (module
    docstring); power_counts_np is the host [N, P] per-neuron trial
    count per power when the sparse path computed it for free (None
    otherwise); the reconnect scan reuses it instead of three [N, K]
    passes.
    """
    stim_np = np.asarray(stim)  # no full-size cast; see prepare_stim
    powers_np, levels_np, kind, payload = _upload_plan(stim_np, powers)
    pdev = _powers_dev(powers_np, levels_np, kind)
    if kind == "dense":
        stim_dev = jnp.asarray(stim_np, dtype=dtype)
        lam_mask, lam0 = _mask_and_lam0_jit(stim_dev, active)
        return stim_dev, lam_mask, lam0, stim_np, powers_np, pdev, None
    if kind == "sparse":
        targets, tbucket, power_counts = payload
        stim_dev, lam_mask, lam0 = _prep_stim_and_init_sparse(
            jnp.asarray(levels_np, dtype), jnp.asarray(targets),
            jnp.asarray(tbucket), active, stim_np.shape[0]
        )
        return (stim_dev, lam_mask, lam0, stim_np, powers_np, pdev,
                power_counts)
    stim_dev, lam_mask, lam0 = _prep_stim_and_init(
        jnp.asarray(levels_np, dtype), jnp.asarray(payload), active
    )
    return stim_dev, lam_mask, lam0, stim_np, powers_np, pdev, None
