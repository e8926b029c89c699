"""NeuralDemixer facade: load/train/apply the waveform demixer.

API parity with the reference class (neural_waveform_demixing.py:17-94):
``NeuralDemixer(path)(traces)`` demixes a [K, T] trace block;
``generate_training_data`` + ``train`` fit a fresh network. Differences
by design:

  * the forward pass is a jitted JAX function on the accelerator the
    solvers already use (no torch, no device tug-of-war — reference
    README.md:31);
  * the monotone-decay post-filter runs on device as a cummin scan
    (ops/monotone) instead of a host time loop
    (neural_waveform_demixing.py:337-348);
  * batches are padded to bucket sizes so arbitrary K reuses a handful
    of compiled programs;
  * training is optax SGD + MSE (the reference's optimiser/loss,
    neural_waveform_demixing.py:289-293) with explicit batch-norm
    running-stat updates.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.monotone import monotone_decay_filter
from .unet import (
    init_nwd_params,
    nwd_unet_forward,
    update_running_stats,
)
from . import convert
from .datagen import generate_psc_dataset


@jax.jit
def _demix_batch(params, traces):
    """Peak-normalise -> forward -> rescale. traces: [B, T].

    Forward runs in the params' dtype (f32 default; bf16 supported for
    ~1.7x faster inference), normalisation/rescale always in f32.
    """
    traces = traces.astype(jnp.float32)  # f16-wire inputs restored on device
    net_dtype = params["conv"]["conv"]["w"].dtype
    tmax = jnp.max(traces, axis=1, keepdims=True)
    safe = jnp.where(tmax != 0, tmax, 1.0)
    x = ((traces / safe)[:, None, :]).astype(net_dtype)
    out = nwd_unet_forward(params, x)[:, 0, :].astype(traces.dtype)
    return out * tmax


@partial(jax.jit, static_argnames=("start",))
def _demix_and_filter(params, traces, start):
    return monotone_decay_filter(_demix_batch(params, traces), start=start)


@partial(jax.jit, static_argnames=("start",))
def _demix_and_filter_quantised(params, wire, scale, start):
    """int8-wire variant: dequantise on device, then demix + filter."""
    traces = wire.astype(jnp.float32) * scale[:, None]
    return monotone_decay_filter(_demix_batch(params, traces), start=start)


# the wire's pool/upsample arithmetic lives in the jax-free
# utils/quant.py (one copy shared with the HTTP client and the native
# encoder's numpy fallback); these aliases keep historical imports
# working
from ..utils.quant import _pool2, _upsample2  # noqa: E402


# host-side pack: one copy for all wires (incl. the jax-free HTTP
# client), so it lives in utils/quant.py; this alias keeps the
# historical import path working
from ..utils.quant import quantise_pack_int4 as _quantise_pack_int4  # noqa: E402


def _unpack_int4_codes(packed, n_codes):
    """Device-side unpack: the one implementation lives in
    utils/quant.unpack_int4_codes (array-module-parameterised, like
    ``_upsample2``); traced here with ``xp=jnp`` it is pure VPU work
    (shifts, masks, one reshape) that fuses into the caller's
    dequantise multiply."""
    from ..utils.quant import unpack_int4_codes

    return unpack_int4_codes(packed, n_codes, xp=jnp)


def resolve_transfer_dtype(token):
    """Normalise a user-facing wire token to ``NeuralDemixer.__call__``'s
    ``transfer_dtype`` value: 'f32'/''/None → None (plain f32 upload),
    'f16' → np.float16, 'int8' → np.int8, 'int4'/'int4d2' pass through
    as strings. Raises ValueError on anything else. Shared by every
    front end that takes the token as text (serve, warm-cache, run_main)
    so they agree on the vocabulary."""
    if token is None or isinstance(token, type) or hasattr(token, "itemsize"):
        return token  # already a dtype-like (np.int8 / np.float16 / dtype)
    tok = str(token).lower()
    if tok in ("", "f32", "float32"):
        return None
    if tok in ("f16", "float16"):
        return np.float16
    if tok == "int8":
        return np.int8
    if tok in ("int4", "int4d2"):
        return tok
    raise ValueError(
        f"unknown trace wire {token!r}; expected f32/f16/int8/int4/int4d2")


def wire_transform(traces, bits=4, decimate=1):
    """Host-side reference of the quantised trace wire: what the device
    reconstructs from a ``transfer_dtype`` upload, as f32 traces.

    This is the SINGLE source of truth for the wire semantics — the
    QAT trainer (scripts_tpu/train_qat_demixer.py) corrupts its
    training inputs with exactly this function, and the device unpack
    paths are equality-tested against it, so train-time and serve-time
    quantisation can never drift apart.

    ``decimate=2`` is the int4d2 wire: antialias mean-pool by 2 (odd
    tails keep the raw last sample), quantise the pooled trace with a
    per-trace peak/(2^{bits-1}-1) scale, then linearly upsample back —
    even sample ``0.75*p[i] + 0.25*p[i-1]``, odd ``0.75*p[i] +
    0.25*p[i+1]`` (clamped edges), the exact interpolation the device
    applies.
    """
    x = np.asarray(traces, dtype=np.float32)
    T = x.shape[-1]
    if decimate not in (1, 2):
        raise ValueError(f"decimate must be 1 or 2, got {decimate!r}")
    p = _pool2(x) if decimate == 2 else x
    qmax = 2 ** (bits - 1) - 1
    peak = np.abs(p).max(axis=-1, keepdims=True)
    scale = np.where(peak > 0, peak / qmax, 1.0).astype(np.float32)
    q = (np.clip(np.rint(p / scale), -qmax, qmax).astype(np.float32)
         * scale)
    if decimate == 1:
        return q
    return np.ascontiguousarray(_upsample2(q, T), dtype=np.float32)


@partial(jax.jit, static_argnames=("start", "t_true"))
def _demix_and_filter_int4(params, packed, scale, start, t_true):
    """int4-wire variant: two 4-bit codes per byte, unpacked on device.

    ``packed``: uint8 [B, ceil(T/2)] — low nibble = even sample, high
    nibble = odd sample, each a sign-magnitude-free two's-complement
    4-bit code in [-7, 7]. ``scale``: f32 [B] per-trace step
    (peak / 7). Unpack is pure VPU work (shifts, masks, one reshape)
    and fuses into the dequantise multiply.
    """
    codes = _unpack_int4_codes(packed, t_true)
    traces = codes.astype(jnp.float32) * scale[:, None]
    return monotone_decay_filter(_demix_batch(params, traces), start=start)


@partial(jax.jit, static_argnames=("start", "t_true"))
def _demix_and_filter_int4d2(params, packed, scale, start, t_true):
    """int4d2-wire variant: the codes are 2x mean-pooled samples; after
    the int4 unpack + dequantise, linearly upsample back to ``t_true``
    on device (even sample = 0.75*p[i] + 0.25*p[i-1], odd = 0.75*p[i]
    + 0.25*p[i+1], clamped edges — the exact host-reference transform,
    demixer.wire_transform(decimate=2)). Quarter of the int8 wire's
    bytes; pair with a *_int4d2qat.npz checkpoint."""
    th = (t_true + 1) // 2
    p = _unpack_int4_codes(packed, th).astype(jnp.float32) * scale[:, None]
    traces = _upsample2(p, t_true, xp=jnp)
    return monotone_decay_filter(_demix_batch(params, traces), start=start)


def _bucket(n, minimum=64):
    """Round up to a bucket size (bounded recompiles, bounded padding waste).

    Powers of two up to 1024, then multiples of 1024 — so a 20k-trace
    block pads by <5% instead of doubling to the next power of two.
    """
    b = minimum
    while b < n and b < 1024:
        b *= 2
    if n > b:
        b = ((n + 1023) // 1024) * 1024
    return b


def mesh_compatible(mesh):
    """True iff ``NeuralDemixer.__call__(mesh=mesh)`` can shard rows.

    The ONE statement of the divisibility rule (callers like the fit
    server must not re-encode it): row buffers pad to ``_bucket``
    sizes — powers of two up to 1024, then multiples of 1024 — so a
    power-of-two device count <= 1024 divides every bucket once the
    bucket floor is raised to the mesh size; anything else would fail
    device_put's even-sharding requirement mid-run on some chunk size.
    """
    if mesh is None:
        return False
    n = int(mesh.devices.size)
    return n > 0 and (n & (n - 1)) == 0 and n <= 1024


@jax.jit
def _train_step(params, x, y, lr):
    """One SGD step on MSE; returns (params with fresh BN stats, loss).

    The ONE copy of the loss/SGD/BN-stats arithmetic: the per-step CPU
    path calls it directly and the scan-epoch TPU path traces it as the
    scan body — the two platform paths must train identically, so the
    step body must not fork."""

    def loss_fn(p):
        pred, stats = nwd_unet_forward(p, x[:, None, :], train=True)
        return jnp.mean(jnp.square(pred[:, 0, :] - y)), stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    params = update_running_stats(params, stats)
    return params, loss


@jax.jit
def _train_epoch(params, xs, ys, lr):
    """A whole epoch as one compiled scan over stacked minibatches.

    xs, ys: [steps, batch, T]. One device dispatch per epoch instead of
    one per minibatch — on a dispatch-costly link (tunneled TPU) this is
    the difference between training being host-bound or device-bound.
    """

    def step(params, batch):
        x, y = batch
        return _train_step(params, x, y, lr)

    params, losses = jax.lax.scan(step, params, (xs, ys))
    return params, jnp.mean(losses)


@jax.jit
def _eval_loss(params, x, y):
    pred = nwd_unet_forward(params, x[:, None, :])
    return jnp.mean(jnp.square(pred[:, 0, :] - y))


class NeuralDemixer:
    """Load (or train) a demixer and apply it to PSC trace blocks."""

    def __init__(self, path=None, params=None, eval_mode=True, device=None,
                 seed=0, dtype=jnp.float32, compute_dtype=None):
        # ``device`` accepted for reference-API compatibility; JAX placement
        # is managed by the runtime (one memory pool for demixer + solver).
        del eval_mode, device
        from .. import _ensure_compile_cache

        _ensure_compile_cache()
        if params is not None:
            self.params = params
        elif path is not None:
            self.params = convert.load_params(path, dtype=dtype)
        else:
            self.params = init_nwd_params(jax.random.PRNGKey(seed), dtype=dtype)
        if compute_dtype is not None:
            self.params = jax.tree_util.tree_map(
                lambda a: a.astype(compute_dtype), self.params
            )
        self.training_data = None
        self.test_data = None
        # one-slot cache: (mesh, replicated params) for __call__(mesh=)
        self._mesh_params = None

    # -- inference ---------------------------------------------------------

    def __call__(self, traces, monotone_filter_start=500,
                 monotone_filter_inplace=True, verbose=True,
                 keep_on_device=False, chunk_size=4096,
                 transfer_dtype=None, mesh=None):
        """Demix a trace block. ``keep_on_device=True`` returns a device
        array — use it when the output feeds a solver directly, so the
        [K, T] block never round-trips through host memory.

        Large blocks stream in ``chunk_size`` pieces: JAX's async
        dispatch overlaps each chunk's host->device transfer with the
        previous chunk's forward pass, hiding most of the upload time
        behind compute (the transfer is the dominant cost on a
        bandwidth-limited link). ``transfer_dtype=np.float16`` halves
        the upload: traces cast host-side, restored to f32 on device
        before the forward pass (~1e-3 relative quantisation — far
        below recording noise; measured no R2 change on the bench).
        ``transfer_dtype=np.int8`` quarters it: traces ship as int8
        with a per-trace peak scale, dequantised on device (~4e-3
        relative to the trace peak — the demixer normalises by peak
        anyway, so this is a uniform input quantisation).
        ``transfer_dtype="int4"`` (string token; numpy has no 4-bit
        dtype) halves the wire again: two 4-bit codes per byte with a
        per-trace peak/7 scale, unpacked on device. The ~7%-of-peak
        step is visible to stock checkpoints (-0.03 truth-R2,
        WIRE_STUDY.json) — pair it with a quantisation-aware-trained
        checkpoint (demixers/*_int4qat.npz), which recovers int8-level
        fidelity at half the transfer.

        ``mesh``: shard the forward pass over the trial axis of a
        device mesh. Eval-mode BatchNorm normalises with running
        statistics (unet.py:219), so every row is independent and the
        sharded forward is EXACTLY the single-device one — no
        cross-device reductions, each chip demixes its row block.
        Params replicate once per mesh (cached); the row buffers ship
        with a trial-axis NamedSharding, so each host→device chunk
        transfer splits across the slice. Pair with the sharded
        solver family: ``keep_on_device=True`` hands them a
        trial-sharded array directly.
        """
        del monotone_filter_inplace  # functional; kept for API parity
        from ..utils.quant import PackedInt4Traces

        packed_in = traces if isinstance(traces, PackedInt4Traces) \
            else None
        squeeze = False
        if packed_in is None:
            # NO full-size dtype cast here: a fresh [K, T] host buffer
            # costs more than the cast itself (first-touch page faults,
            # measured ~1.5 s / 80 MB in this container). Chunks cast
            # into the small per-chunk wire buffer instead.
            traces = np.asarray(traces)
            squeeze = traces.ndim == 1
            if squeeze:
                traces = traces[None]
        K, T = traces.shape
        if isinstance(transfer_dtype, str):
            # one vocabulary for every string token ('f32'→None,
            # 'f16'→f16, int4 tokens pass through) — np.dtype would
            # choke on 'f32'/'f16' and silently diverge from the CLI/
            # server front ends otherwise
            transfer_dtype = resolve_transfer_dtype(transfer_dtype)
        int4_dec = {"int4": 1, "int4d2": 2}.get(transfer_dtype, 0) \
            if isinstance(transfer_dtype, str) else 0
        wire = np.float32 if (transfer_dtype is None or int4_dec) \
            else np.dtype(transfer_dtype)
        if packed_in is not None:
            # traces arrived in int4 wire form (the HTTP fit server's
            # psc_q4 bodies): ship the codes as-is — device dequantise
            # reconstructs EXACTLY the dense host reconstruction, so
            # re-encoding could only lose information. One exception:
            # an int4d2-requested wire over non-pooled codes (a QAT-d2
            # checkpoint wants its train-time pooled transform) —
            # densify and take the normal encode path.
            if int4_dec == 2 and packed_in.decimate == 1:
                traces = packed_in.dense()
                packed_in = None
            else:
                int4_dec = packed_in.decimate

        bucket_min = 64
        if mesh is None:
            _dev1 = _dev2 = jnp.asarray
            params_use = self.params
        else:
            ndev = int(mesh.devices.size)
            # every row buffer pads to a bucket (powers of two from
            # bucket_min up to 1024, then multiples of 1024 — _bucket),
            # so a power-of-two mesh <=1024 divides every bucket once
            # the bucket floor is raised to the mesh size; anything
            # else would fail device_put's even-sharding requirement
            # mid-run on some chunk size
            if not mesh_compatible(mesh):
                raise ValueError(
                    f"mesh size {ndev} does not divide the demixer's "
                    "row buckets; use a power-of-two mesh (<= 1024 "
                    "devices)")
            bucket_min = max(bucket_min, ndev)
            from jax.sharding import NamedSharding, PartitionSpec

            from ..parallel.mesh import TRIAL_AXIS

            sh1 = NamedSharding(mesh, PartitionSpec(TRIAL_AXIS))
            sh2 = NamedSharding(mesh, PartitionSpec(TRIAL_AXIS, None))
            sh_rep = NamedSharding(mesh, PartitionSpec())
            _dev1 = lambda a: jax.device_put(a, sh1)  # noqa: E731
            _dev2 = lambda a: jax.device_put(a, sh2)  # noqa: E731
            cached = self._mesh_params
            # mesh compares by EQUALITY (trial_mesh() constructs a
            # fresh Mesh per call — an identity key would re-replicate
            # the whole param pytree every demix); params by IDENTITY
            # (train() rebinds self.params every epoch, and a stale
            # replicated copy would silently demix with pre-training
            # weights)
            if (cached is not None and cached[0] == mesh
                    and cached[1] is self.params):
                params_use = cached[2]
            else:
                params_use = jax.device_put(self.params, sh_rep)
                self._mesh_params = (mesh, self.params, params_use)

        def _one(part):
            bucket = _bucket(part.shape[0], minimum=bucket_min)
            if int4_dec:
                # fused cast→pool→quantise→pack (native single pass
                # when available; the numpy pipeline quantises in f32
                # whatever the input dtype — the QAT train-time
                # transform, wire_transform, runs in f32, so an f64
                # source quantised in f64 could round .5-boundary
                # samples to different codes)
                from ..utils.quant import encode_int4_traces

                packed, scale_safe = encode_int4_traces(
                    part, decimate=int4_dec, out_rows=bucket)
                pscale = np.ones(bucket, dtype=np.float32)
                pscale[:part.shape[0]] = scale_safe
                fn = (_demix_and_filter_int4d2 if int4_dec == 2
                      else _demix_and_filter_int4)
                return fn(
                    params_use, _dev2(packed), _dev1(pscale),
                    int(monotone_filter_start), T)[:part.shape[0]]
            if wire == np.int8:
                # one quantiser across the demixer/solver/HTTP wires
                # (utils/quant.py — raises loudly on non-finite traces:
                # the unsafe int8 cast would wrap silently)
                from ..utils.quant import quantise_int8

                padded = np.zeros((bucket, T), dtype=np.int8)
                _, scale_safe = quantise_int8(
                    part, out=padded[:part.shape[0]])
                pscale = np.ones(bucket, dtype=np.float32)
                pscale[:part.shape[0]] = scale_safe
                return _demix_and_filter_quantised(
                    params_use, _dev2(padded), _dev1(pscale),
                    int(monotone_filter_start))[:part.shape[0]]
            padded = np.zeros((bucket, T), dtype=wire)
            padded[:part.shape[0]] = part  # casts into the wire buffer
            return _demix_and_filter(params_use, _dev2(padded),
                                     int(monotone_filter_start))[:part.shape[0]]

        def _one_packed(k0, k1):
            # pass-through: pad the already-packed rows to the bucket
            # (zero codes / unit scales, like the encode path) and hand
            # them straight to the int4 forward — zero host codec
            n = k1 - k0
            bucket = _bucket(n, minimum=bucket_min)
            pk = np.zeros((bucket, packed_in.packed.shape[1]), np.uint8)
            pk[:n] = packed_in.packed[k0:k1]
            ps = np.ones(bucket, dtype=np.float32)
            ps[:n] = packed_in.scale[k0:k1]
            fn = (_demix_and_filter_int4d2 if int4_dec == 2
                  else _demix_and_filter_int4)
            return fn(params_use, _dev2(pk), _dev1(ps),
                      int(monotone_filter_start), T)[:n]

        one = (_one_packed if packed_in is not None
               else lambda k0, k1: _one(traces[k0:k1]))
        t0 = time.time()
        if K <= chunk_size:
            dev = one(0, K)
        else:
            chunks = [one(k0, min(k0 + chunk_size, K))
                      for k0 in range(0, K, chunk_size)]
            dev = jnp.concatenate(chunks, axis=0)
        out = dev if keep_on_device else np.asarray(dev)
        if verbose:
            # force completion before reading the clock: with
            # keep_on_device the dispatch returns while the forward
            # pass is still in flight, and the print would report
            # dispatch-only time (CLAUDE.md async-timing rule). The
            # device-side slice keeps the settling pull to one element.
            if keep_on_device:
                np.asarray(dev[:1, :1])
            print(f"Demixed {K} traces in {time.time() - t0:.3f}s.")
        return out[0] if squeeze else out

    # -- training ----------------------------------------------------------

    def generate_training_data(self, save_path=None, **kwargs):
        """Simulate (inputs, targets) pairs; see datagen.generate_psc_dataset."""
        self.training_data, self.test_data = generate_psc_dataset(**kwargs)
        if save_path is not None:
            np.savez(
                save_path,
                training_inputs=self.training_data[0],
                training_targets=self.training_data[1],
                test_inputs=self.test_data[0],
                test_targets=self.test_data[1],
            )
        return self.training_data, self.test_data

    def train(self, epochs=1000, batch_size=64, learning_rate=1e-2,
              data_path=None, save_every=50, save_path=None, seed=0,
              verbose=True, mesh=None, **_compat):
        """SGD/MSE training loop (reference trainer config,
        neural_waveform_demixing.py:56-94, 289-306).

        ``mesh``: data-parallel training over a device mesh — the batch
        axis shards across devices, parameters stay replicated, and the
        jitted step runs SPMD (XLA inserts the gradient all-reduces).
        Because jit sharding keeps GLOBAL array semantics, even the
        batch-norm batch statistics reduce over the full batch exactly
        (no per-replica-BN divergence as in manual pmap-style DP);
        equality-tested against the single-device loop. Each epoch's
        permuted batches upload host→devices once (on-node HBM links
        make that negligible; this path targets a multi-chip host, not
        the tunneled single chip).
        """
        if data_path is not None:
            data = np.load(data_path)
            train = (data["training_inputs"], data["training_targets"])
            test = (data["test_inputs"], data["test_targets"])
        else:
            if self.training_data is None:
                raise RuntimeError(
                    "no training data: call generate_training_data() or pass data_path"
                )
            train, test = self.training_data, self.test_data

        sh_batch = sh_rep = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from ..parallel.mesh import TRIAL_AXIS

            # [steps, batch, T] epochs shard on the BATCH axis; params
            # replicate (device_put once — mixing committed single-
            # device params with sharded batches is a placement error)
            sh_batch = NamedSharding(mesh, PartitionSpec(None, TRIAL_AXIS))
            sh_step = NamedSharding(mesh, PartitionSpec(TRIAL_AXIS))
            sh_rep = NamedSharding(mesh, PartitionSpec())
            self.params = jax.device_put(self.params, sh_rep)
            # epoch data stays HOST-side in the mesh branch: each
            # epoch's permuted batches are device_put with the batch
            # sharding (a device-resident gather across shards would
            # need an all-to-all per epoch instead)
            x_tr = np.asarray(train[0], dtype=np.float32)
            y_tr = np.asarray(train[1], dtype=np.float32)
            x_te = jax.device_put(
                np.asarray(test[0], dtype=np.float32), sh_rep)
            y_te = jax.device_put(
                np.asarray(test[1], dtype=np.float32), sh_rep)
        else:
            x_tr = jnp.asarray(train[0], dtype=jnp.float32)
            y_tr = jnp.asarray(train[1], dtype=jnp.float32)
            x_te = jnp.asarray(test[0], dtype=jnp.float32)
            y_te = jnp.asarray(test[1], dtype=jnp.float32)
        n = x_tr.shape[0]
        batch_size = min(batch_size, n)  # datasets smaller than one batch
        if mesh is not None and batch_size % int(mesh.devices.size):
            raise ValueError(
                f"effective batch_size={batch_size} (dataset n={n}) must "
                f"divide over the {int(mesh.devices.size)}-device mesh")
        steps = max(n // batch_size, 1)
        lr = jnp.asarray(learning_rate, jnp.float32)

        rng = np.random.default_rng(seed)
        t0 = time.time()
        history = []
        # Epoch execution strategy is per-platform: on accelerators the
        # whole epoch runs as ONE compiled scan (one dispatch per epoch
        # — on a dispatch-costly tunneled TPU this is the difference
        # between host-bound and device-bound training). On CPU the
        # same scan executes its body ~12x slower than the identical
        # step dispatched eagerly (measured 1.08 s/step in-scan vs
        # 87 ms/step dispatched, single core), so CPU loops the jitted
        # step instead: 7.9 s/epoch vs torch's 44.6 s on this host.
        on_accel = jax.devices()[0].platform != "cpu"
        for epoch in range(epochs):
            perm = rng.permutation(n)[: steps * batch_size].reshape(steps, batch_size)
            if mesh is not None and on_accel:
                # one host→devices upload per epoch, batch axis sharded;
                # the SAME scan-epoch program as the single-accelerator
                # path runs SPMD over the mesh
                self.params, mean_loss = _train_epoch(
                    self.params,
                    jax.device_put(x_tr[perm], sh_batch),
                    jax.device_put(y_tr[perm], sh_batch),
                    lr,
                )
            elif mesh is not None:
                # CPU mesh: same per-platform rule as single-device —
                # XLA:CPU runs a scan body ~12x slower than the
                # identical step dispatched eagerly, so loop the jitted
                # step with per-step sharded batches (identical SPMD/BN
                # semantics, per-step equality tested)
                losses = []
                for s in range(steps):
                    self.params, loss = _train_step(
                        self.params,
                        jax.device_put(x_tr[perm[s]], sh_step),
                        jax.device_put(y_tr[perm[s]], sh_step),
                        lr,
                    )
                    losses.append(loss)
                mean_loss = jnp.mean(jnp.stack(losses))
            elif on_accel:
                self.params, mean_loss = _train_epoch(
                    self.params, x_tr[perm], y_tr[perm], lr
                )
            else:
                losses = []
                for s in range(steps):
                    self.params, loss = _train_step(
                        self.params, x_tr[perm[s]], y_tr[perm[s]], lr
                    )
                    losses.append(loss)
                mean_loss = jnp.mean(jnp.stack(losses))
            val = float(_eval_loss(self.params, x_te, y_te)) if x_te.shape[0] else 0.0
            history.append({"epoch": epoch, "train_loss": float(mean_loss),
                            "val_loss": val})
            if verbose and (epoch % max(epochs // 10, 1) == 0 or epoch == epochs - 1):
                print(f"epoch {epoch}: train={float(mean_loss):.5f} val={val:.5f}")
            if save_path is not None and (epoch + 1) % save_every == 0:
                convert.save_params(save_path, self.params)

        if save_path is not None:
            convert.save_params(save_path, self.params)
        if verbose:
            print(f"Training complete in {(time.time() - t0) / 60:.2f} min.")
        return history

    def save(self, path):
        convert.save_params(path, self.params)
