"""NWD U-Net: the 1-D waveform-demixing network, as a pure function.

Architecture parity with the reference NWDUNet
(neural_waveform_demixing.py:254-287): four downsampling blocks
(avg-pool → dilated conv → batch-norm → relu), four upsampling blocks
(transposed conv → bn → relu → linear resize → skip concat), and a
wide dilated output conv block. Implemented as a parameter-pytree +
pure forward function rather than a module class: trivially jittable,
vmappable, shardable, and the pytree keys line up 1:1 with the torch
state_dict for checkpoint conversion (demix/convert.py).

Semantics deliberately match torch so the shipped pretrained
checkpoints reproduce: cross-correlation convs, VALID avg-pool with
floor division, ConvTranspose via ``lax.conv_transpose`` with
``transpose_kernel=True``, and ``align_corners=False`` half-pixel
linear interpolation. Data layout is NCH throughout.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-5  # torch BatchNorm1d default
BN_MOMENTUM = 0.1

# (in_ch, out_ch, kernel, dilation) per downsampling block;
# (in_ch, out_ch, kernel, stride) per upsampling block — reference
# neural_waveform_demixing.py:259-269.
DOWN_SPECS = [(1, 16, 32, 2), (16, 16, 32, 1), (16, 32, 16, 1), (32, 32, 16, 1)]
UP_SPECS = [(32, 16, 16, 1), (48, 16, 16, 1), (32, 16, 32, 1), (32, 4, 32, 2)]
OUT_SPEC = dict(in_ch=4, out_ch=1, kernel=256, padding=255, dilation=2)


# ---------------------------------------------------------------------------
# Primitive layers (torch-semantics)
# ---------------------------------------------------------------------------


def conv1d(x, w, b, stride=1, padding=0, dilation=1):
    """torch.nn.Conv1d: x [B,C,L], w [O,I,K] (cross-correlation)."""
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + b[None, :, None]


def conv1d_fft(x, w, b, padding, dilation):
    """Same op as conv1d, computed as an rFFT convolution (stride 1).

    The output head of the U-Net maps C channels to ONE (kernel 256,
    dilation 2): as a matmul that is a single MXU output column —
    ~1/128 utilisation — and it carries ~3/4 of the network's FLOPs.
    In the frequency domain it is a batched elementwise multiply and
    one inverse FFT. FFT runs in f32 regardless of activation dtype.
    """
    B, C, L = x.shape
    O, _, K = w.shape
    keff = dilation * (K - 1) + 1
    out_len = L + 2 * padding - keff + 1

    # dilate + reverse the kernel so correlation becomes convolution
    kd = jnp.zeros((O, C, keff), dtype=jnp.float32)
    kd = kd.at[:, :, ::dilation].set(w.astype(jnp.float32))
    kdr = kd[:, :, ::-1]

    xpad = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (padding, padding)))
    n = 1
    while n < xpad.shape[-1] + keff - 1:
        n *= 2
    Xf = jnp.fft.rfft(xpad, n=n)                      # [B, C, F]
    Kf = jnp.fft.rfft(kdr, n=n)                       # [O, C, F]
    Yf = jnp.einsum("bcf,ocf->bof", Xf, Kf)           # sum over channels
    y = jnp.fft.irfft(Yf, n=n)[..., keff - 1: keff - 1 + out_len]
    return (y + b.astype(jnp.float32)[None, :, None]).astype(x.dtype)


def conv1d_toeplitz(x, w, b, padding, dilation, tile=128):
    """Same op as conv1d (stride 1), as banded-Toeplitz MXU matmuls.

    The FFT head (conv1d_fft) fixed the 1/128-MXU-utilisation problem
    of an O=1 conv, but on TPU the FFT itself became ~25 ms of the
    60 ms demixer forward at the bench shape (xplane profile — the
    [B, C, 2048] rfft stages plus [F, B] pointwise products). Here the
    output TIME axis supplies the MXU columns instead: out[t] for a
    128-wide tile of t is one matmul of the input window [B, C*win]
    against a banded weight matrix [C*win, O*128] whose column u holds
    the dilated kernel shifted by u. FLOPs ~2x the direct conv but at
    full MXU utilisation; HIGHEST precision keeps checkpoint parity
    (bf16-multiply passes would cost ~1e-2 relative on 2.5k-term rows).
    """
    B, C, L = x.shape
    O, _, K = w.shape
    keff = dilation * (K - 1) + 1
    out_len = L + 2 * padding - keff + 1
    n_tiles = -(-out_len // tile)
    win = tile - 1 + keff

    xpad = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (padding, padding)))
    need = (n_tiles - 1) * tile + win
    if need > xpad.shape[-1]:
        xpad = jnp.pad(xpad, ((0, 0), (0, 0), (0, need - xpad.shape[-1])))

    # banded weights: Wb[c, v, o, u] = w[o, c, j] where v = u + dil*j
    uu = jnp.arange(tile)[None, :]
    vu_flat = ((uu + dilation * jnp.arange(K)[:, None]) * tile + uu)  # [K,tile]
    wv = jnp.broadcast_to(
        jnp.transpose(w, (1, 2, 0)).astype(jnp.float32)[:, :, None, :],
        (C, K, tile, O),
    ).reshape(C, K * tile, O)
    Wb = jnp.zeros((C, win * tile, O), jnp.float32)
    Wb = Wb.at[:, vu_flat.reshape(-1), :].add(wv)
    Wb = Wb.reshape(C, win, tile, O)

    y_tiles = []
    for t in range(n_tiles):
        xw = lax.dynamic_slice_in_dim(xpad, t * tile, win, axis=2)
        y_tiles.append(jnp.einsum(
            "bcv,cvuo->bou", xw, Wb, precision=lax.Precision.HIGHEST))
    y = jnp.concatenate(y_tiles, axis=-1)[..., :out_len]
    return (y + b.astype(jnp.float32)[None, :, None]).astype(x.dtype)


def _head_conv(x, w, b, padding, dilation):
    """Output-head conv: Toeplitz matmuls on the MXU, rFFT elsewhere
    (XLA:CPU's pocketfft path is already good there and the training
    benchmarks were measured on it)."""
    if jax.default_backend() in ("tpu", "axon"):
        return conv1d_toeplitz(x, w, b, padding, dilation)
    return conv1d_fft(x, w, b, padding, dilation)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_transpose1d_core(x, w, stride):
    """ConvTranspose1d core (no bias): y[b,o,s*stride+k] += x[b,i,s] w[i,o,k].

    Custom VJP: XLA's autodiff of the lhs-dilated conv this forward
    lowers to is catastrophically slow on CPU (measured 250 ms per
    gradient at the decoder shapes vs ~20 ms forward — it dominated the
    whole training step). Both gradients are ordinary dense convs:

      dx[b,i,s] = sum_{o,k} g[b,o,s*stride+k] w[i,o,k]   (strided corr)
      dw[i,o,k] = sum_{b,s} x[b,i,s] g[b,o,s*stride+k]   (batch-contracted
                                                          corr, rhs-dilated)
    """
    return lax.conv_transpose(
        x,
        w,
        strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        transpose_kernel=True,
    )


def _conv_transpose1d_fwd(x, w, stride):
    return _conv_transpose1d_core(x, w, stride), (x, w)


def _conv_transpose1d_bwd(stride, res, g):
    x, w = res
    # dx: correlate the cotangent with w at the forward stride — a plain
    # strided VALID conv ([I,O,K] read as OIH: dim0 = dx's channel out).
    dx = lax.conv_general_dilated(
        g, w,
        window_strides=(stride,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    # dw[i,o,k]: batch plays the contracted-feature role; computing
    # out[o,i,k] = sum_{b,s} g[o,b,k+s*stride] x[i,b,s] as a conv with
    # g^T as lhs, x^T as kernel, rhs_dilation = stride.
    dw_t = lax.conv_general_dilated(
        jnp.transpose(g, (1, 0, 2)),       # [O, B, Lg]
        jnp.transpose(x, (1, 0, 2)),       # [I, B, S] as OIH
        window_strides=(1,),
        padding=[(0, 0)],
        rhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )                                      # [O, I, K]
    return dx, jnp.transpose(dw_t, (1, 0, 2))


_conv_transpose1d_core.defvjp(_conv_transpose1d_fwd, _conv_transpose1d_bwd)


def conv_transpose1d(x, w, b, stride=1):
    """torch.nn.ConvTranspose1d: x [B,C,L], w [I,O,K].

    ConvTranspose is the gradient of a forward conv mapping O->I; with
    ``transpose_kernel=True`` lax expects that forward conv's kernel,
    so the torch [in, out, K] weight is described as 'OIH'. Gradients
    come from the custom VJP above.
    """
    return _conv_transpose1d_core(x, w, stride) + b[None, :, None]


def avg_pool1d(x, kernel=3, stride=2):
    """torch.nn.AvgPool1d (VALID, count_include_pad irrelevant: no pad)."""
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, 1, kernel), (1, 1, stride), "VALID"
    )
    return summed / kernel


def batch_norm(x, bn, train=False):
    """BatchNorm1d over [B,C,L]. Returns (y, batch_stats or None).

    Eval mode normalises with running statistics; train mode with batch
    statistics (biased variance), reporting (mean, unbiased var) for the
    running-average update, as torch does.
    """
    if train:
        mean = jnp.mean(x, axis=(0, 2))
        var = jnp.var(x, axis=(0, 2))
        n = x.shape[0] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        stats = (mean, unbiased)
    else:
        mean, var = bn["running_mean"], bn["running_var"]
        stats = None
    inv = lax.rsqrt(var + BN_EPS)
    y = (x - mean[None, :, None]) * inv[None, :, None]
    return y * bn["scale"][None, :, None] + bn["bias"][None, :, None], stats


def resize_linear(x, out_len):
    """torch F.interpolate(mode='linear', align_corners=False) on [B,C,L]."""
    in_len = x.shape[-1]
    scale = in_len / out_len
    # the sample grid stays f32 whatever the activation dtype: bf16
    # cannot represent odd integers >= 257, so a bf16 arange shifts
    # gather indices by up to 2 frames and corrupts the interpolation
    # weights over the back 2/3 of a 900-sample trace (round-4 review
    # finding, empirically confirmed). Only the gathered DATA computes
    # in the activation dtype.
    pos = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, in_len - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_len - 1)
    frac = (pos - lo).astype(x.dtype)
    return x[..., lo] * (1.0 - frac) + x[..., hi] * frac


# ---------------------------------------------------------------------------
# Parameter init / structure
# ---------------------------------------------------------------------------


def _bn_init(ch, dtype):
    return {
        "scale": jnp.ones(ch, dtype),
        "bias": jnp.zeros(ch, dtype),
        "running_mean": jnp.zeros(ch, dtype),
        "running_var": jnp.ones(ch, dtype),
    }


def init_nwd_params(key, dtype=jnp.float32):
    """Fresh parameters, torch-default initialisation (kaiming-uniform
    fan-in for conv weights, uniform bias)."""
    params = {}

    def conv_init(key, shape, fan_in):
        k1, k2 = jax.random.split(key)
        bound = 1.0 / np.sqrt(fan_in)
        w = jax.random.uniform(k1, shape, dtype, -bound, bound)
        b = jax.random.uniform(k2, (shape[0],), dtype, -bound, bound)
        return w, b

    keys = jax.random.split(key, 9)
    for i, (ci, co, k, _d) in enumerate(DOWN_SPECS):
        w, b = conv_init(keys[i], (co, ci, k), ci * k)
        params[f"dblock{i + 1}"] = {"conv": {"w": w, "b": b}, "bn": _bn_init(co, dtype)}
    for i, (ci, co, k, _s) in enumerate(UP_SPECS):
        # ConvTranspose1d weight layout [I, O, K]; torch fan_in = O * K
        k1, k2 = jax.random.split(keys[4 + i])
        bound = 1.0 / np.sqrt(co * k)
        w = jax.random.uniform(k1, (ci, co, k), dtype, -bound, bound)
        b = jax.random.uniform(k2, (co,), dtype, -bound, bound)
        params[f"ublock{i + 1}"] = {
            "deconv": {"w": w, "b": b},
            "bn": _bn_init(co, dtype),
        }
    s = OUT_SPEC
    w, b = conv_init(keys[8], (s["out_ch"], s["in_ch"], s["kernel"]),
                     s["in_ch"] * s["kernel"])
    params["conv"] = {"conv": {"w": w, "b": b}, "bn": _bn_init(s["out_ch"], dtype)}
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _down_block(p, x, dilation, train):
    y = avg_pool1d(x)
    y = conv1d(y, p["conv"]["w"], p["conv"]["b"], dilation=dilation)
    y, stats = batch_norm(y, p["bn"], train)
    return jax.nn.relu(y), stats


def _up_block(p, x, stride, out_len, train, skip=None):
    y = conv_transpose1d(x, p["deconv"]["w"], p["deconv"]["b"], stride=stride)
    y, stats = batch_norm(y, p["bn"], train)
    y = resize_linear(jax.nn.relu(y), out_len)
    if skip is not None:
        y = jnp.concatenate([y, skip], axis=1)
    return y, stats


def nwd_unet_forward(params, x, train=False):
    """Demixer forward. x: [B, 1, L] -> [B, 1, L].

    With ``train=True`` also returns the list of per-BN batch statistics
    (in block order) for running-average updates.
    """
    enc, stats = [], []
    h = x
    for i, (_, _, _, dil) in enumerate(DOWN_SPECS):
        h, s = _down_block(params[f"dblock{i + 1}"], h, dil, train)
        enc.append(h)
        stats.append(s)

    skips = [enc[2], enc[1], enc[0], None]
    lens = [enc[2].shape[-1], enc[1].shape[-1], enc[0].shape[-1], x.shape[-1]]
    for i, (_, _, _, stride) in enumerate(UP_SPECS):
        h, s = _up_block(
            params[f"ublock{i + 1}"], h, stride, lens[i], train, skip=skips[i]
        )
        stats.append(s)

    p = params["conv"]
    h = _head_conv(h, p["conv"]["w"], p["conv"]["b"],
                   padding=OUT_SPEC["padding"], dilation=OUT_SPEC["dilation"])
    h, s = batch_norm(h, p["bn"], train)
    stats.append(s)
    out = jax.nn.relu(h)
    return (out, stats) if train else out


BN_BLOCK_ORDER = [f"dblock{i}" for i in range(1, 5)] + [
    f"ublock{i}" for i in range(1, 5)
] + ["conv"]


def update_running_stats(params, stats, momentum=BN_MOMENTUM):
    """Fold train-mode batch statistics into the running BN estimates."""
    new = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    for name, st in zip(BN_BLOCK_ORDER, stats):
        mean, var = st
        bn = dict(new[name]["bn"])
        bn["running_mean"] = (1 - momentum) * bn["running_mean"] + momentum * mean
        bn["running_var"] = (1 - momentum) * bn["running_var"] + momentum * var
        blk = dict(new[name])
        blk["bn"] = bn
        new[name] = blk
    return new
