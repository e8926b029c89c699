"""Shared host-side int8 trace quantiser (jax-free).

One implementation of the per-trace peak/127 scheme for its three
consumers — the demixer device wire (demix/demixer.py), the solver
raw-trace wire (solvers/_common.prepare_traces) and the fit server's
HTTP body wire (serve.encode_psc_int8; FitClient runs on rig machines
with numpy only, so this module must not import jax). Keeping one copy
is what makes the serve wire's composition guarantee ("server-side
dequantise → device-side requantise is the identity") robust: the
per-row max code is exactly 127 only while every producer uses the
same scale and rounding.

Quantisation always happens in f32 whatever the input dtype — the
'.5-boundary' lesson (CLAUDE.md round-4 session 4): an f64 source
quantised in f64 can round boundary samples to different codes than
the same data quantised in f32.
"""

from __future__ import annotations

import numpy as np


def _pool2(x, xp=np):
    """Antialias mean-pool by 2 on the last axis; an odd tail keeps the
    raw last sample. ONE implementation for host (numpy) and device
    (pass ``xp=jnp``) — the wire's train-time corruption and serve-time
    reconstruction must agree bit-for-bit, so there is exactly one copy
    of this arithmetic (in f32 on both sides)."""
    T = x.shape[-1]
    T2 = T // 2
    p = 0.5 * (x[..., : 2 * T2 : 2] + x[..., 1 : 2 * T2 : 2])
    if T % 2:
        p = xp.concatenate([p, x[..., -1:]], axis=-1)
    return p


def _upsample2(p, t_true, xp=np):
    """Inverse of :func:`_pool2` up to quantisation: linear upsample —
    even sample ``0.75*p[i] + 0.25*p[i-1]``, odd ``0.75*p[i] +
    0.25*p[i+1]`` (clamped edges). Shared host/device (``xp``)."""
    prev = xp.concatenate([p[..., :1], p[..., :-1]], axis=-1)
    nxt = xp.concatenate([p[..., 1:], p[..., -1:]], axis=-1)
    even = 0.75 * p + 0.25 * prev
    odd = 0.75 * p + 0.25 * nxt
    up = xp.stack([even, odd], axis=-1).reshape(*p.shape[:-1], -1)
    return up[..., :t_true]


def encode_int4_traces(part, decimate=1, out_rows=None):
    """Fused trace-wire encode of a [B, T] chunk in the SOURCE dtype:
    cast-to-f32 → (mean-pool by ``decimate``) → int4 quantise → nibble
    pack, returning ``(packed uint8 [rows, ceil(T'/2)], scale f32
    [B])`` exactly like :func:`quantise_pack_int4` composed with
    :func:`_pool2`.

    Routes through the native single-pass encoder when available
    (utils/native.encode_traces_int4 — one read of the source instead
    of ~6 numpy passes; equality-tested bit-for-bit), with the numpy
    pipeline as the always-correct fallback. This is the entry the
    chunked upload loops should call: handing it the original f64/f32
    chunk lets the native path skip the full-size f32 cast too.
    """
    part = np.asarray(part)
    if part.ndim != 2:
        raise ValueError(f"expected a [B, T] chunk, got {part.shape}")
    if decimate not in (1, 2):
        raise ValueError(f"decimate must be 1 or 2, got {decimate!r}")
    from . import native

    res = native.encode_traces_int4(part, decimate, out_rows)
    if res is not None:
        return res
    src = np.asarray(part, dtype=np.float32)
    if decimate == 2:
        src = _pool2(src)
    return quantise_pack_int4(src, out_rows=out_rows)


def quantise_pack_int4(src, out_rows=None):
    """Host-side int4 quantise + nibble-pack: the ONE copy of the
    wire's pack arithmetic (demixer upload path, solver trace wire,
    HTTP psc wire).

    ``src``: float32 [B, tw] (callers must cast first — quantising in
    f32 regardless of input dtype keeps serve-time codes bit-for-bit
    identical to the QAT train-time transform,
    demix.demixer.wire_transform). ``out_rows``: pad the packed rows to
    this count (zero codes). Returns (packed uint8 [out_rows,
    ceil(tw/2)], scale f32 [B]) where scale is the per-trace step
    peak/7 (1.0 for all-zero traces). Raises on non-finite samples — a
    non-finite peak would make the unsafe int8 cast wrap silently.
    """
    assert src.dtype == np.float32, "int4 wire quantises in f32"
    B, tw = src.shape
    rows = B if out_rows is None else int(out_rows)
    scale = (np.abs(src).max(axis=1) / 7.0).astype(np.float32)
    if not np.isfinite(scale).all():
        raise ValueError(
            "traces contain non-finite samples (or peaks above float32 "
            "range); the int4 wire format requires finite traces")
    scale = np.where(scale > 0, scale, np.float32(1.0))
    t_pad = -(-tw // 2) * 2
    q = np.zeros((rows, t_pad), dtype=np.int8)
    np.rint(src / scale[:, None], out=q[:B, :tw], casting="unsafe")
    np.clip(q, -7, 7, out=q)
    qu = q.view(np.uint8)
    packed = (qu[:, 0::2] & 0x0F) | ((qu[:, 1::2] & 0x0F) << 4)
    return packed, scale


def unpack_int4_codes(packed, n_codes, xp=np):
    """Inverse of :func:`quantise_pack_int4`'s pack: split each byte
    into two sign-extended 4-bit two's-complement codes in [-7, 7]
    (low nibble = even sample, high = odd) and trim the pad.

    The ONE copy of the unpack arithmetic, array-module-parameterised
    (the ``_upsample2`` pattern): ``xp=np`` on hosts (the jax-free HTTP
    server decode), ``xp=jnp`` on device (demix.demixer), where it is
    pure VPU work that fuses into the caller's dequantise multiply."""
    w = packed.astype(xp.int32) if hasattr(packed, "astype") \
        else np.asarray(packed).astype(xp.int32)
    low = w & 0xF
    high = (w >> 4) & 0xF
    low = low - ((low > 7).astype(xp.int32) << 4)
    high = high - ((high > 7).astype(xp.int32) << 4)
    return xp.stack([low, high], axis=-1).reshape(
        w.shape[0], -1)[:, :n_codes]


def decode_int4_traces(packed, scale, t_true, decimate=1, xp=np):
    """Dense f32 reconstruction of an int4/int4d2 trace wire:
    unpack codes, multiply the per-trace scale, and (``decimate=2``)
    linearly upsample back to ``t_true`` — exactly the device unpack
    (solvers/_common._unpack_int4_traces) on the host. With ``xp=np``
    the native single-pass decoder handles it when available
    (utils/native.decode_traces_int4, bit-identical by test)."""
    if xp is np:
        from . import native

        out = native.decode_traces_int4(
            np.asarray(packed), np.asarray(scale), int(t_true), decimate)
        if out is not None:
            return out
    th = (t_true + 1) // 2 if decimate == 2 else t_true
    traces = unpack_int4_codes(packed, th, xp=xp).astype(np.float32)
    traces = traces * xp.asarray(scale, dtype=np.float32)[:, None]
    if decimate == 2:
        traces = _upsample2(traces, t_true, xp=xp)
    return traces


class PackedInt4Traces:
    """A [K, T] trace block held in its int4/int4d2 wire form.

    The HTTP fit server receives quantised trace bodies (serve
    ``psc_q4*`` keys) whose codes are EXACTLY what a matching device
    wire would re-derive from the dense reconstruction (the requantise
    identity: the per-row peak code is qmax by construction). Decoding
    to dense f32 only for the device wire to re-encode wastes ~0.4 s
    of host codec and a full-size temporary per flagship request —
    this container defers that: consumers that understand the wire
    (demix.demixer.NeuralDemixer.__call__, solvers/_common.
    prepare_traces) ship the codes as-is, and every other consumer
    transparently gets the dense reconstruction via ``__array__``
    (memoised — serve handlers may touch the body several times).

    ``packed``: uint8 [rows, ceil(t2/2)] nibble pairs (t2 = code
    count: ceil(T/2) for ``decimate=2`` else T); ``scale``: f32
    [rows]; ``t_true``: T of the reconstructed traces; ``lead``: the
    logical leading dims — default ``(rows,)`` for a [K, T] block,
    ``(B, K)`` for a /fit_many batch (rows = B*K; ``flat()`` views
    the same buffers as the 2-D block the demixer/solver wires take).
    """

    __slots__ = ("packed", "scale", "t_true", "decimate", "lead",
                 "_dense")

    def __init__(self, packed, scale, t_true, decimate=1, lead=None):
        packed = np.asarray(packed)
        scale = np.asarray(scale, dtype=np.float32)
        t_true = int(t_true)
        if decimate not in (1, 2):
            raise ValueError(f"decimate must be 1 or 2, got {decimate!r}")
        t2 = (t_true + 1) // 2 if decimate == 2 else t_true
        if (packed.ndim != 2 or packed.dtype != np.uint8
                or t_true <= 0 or packed.shape[1] != (t2 + 1) // 2):
            raise ValueError(
                f"packed must be uint8 [rows, {(t2 + 1) // 2}] for "
                f"t_true={t_true}, decimate={decimate}; got "
                f"{packed.dtype} {packed.shape}")
        if scale.shape != (packed.shape[0],):
            raise ValueError(
                f"scale must be [rows={packed.shape[0]}], got "
                f"{scale.shape}")
        lead = (packed.shape[0],) if lead is None \
            else tuple(int(d) for d in lead)
        if (not lead or any(d <= 0 for d in lead)
                or int(np.prod(lead, dtype=np.int64)) != packed.shape[0]):
            raise ValueError(
                f"lead={lead} does not match {packed.shape[0]} "
                "packed rows")
        self.packed = packed
        self.scale = scale
        self.t_true = t_true
        self.decimate = decimate
        self.lead = lead
        # one-slot holder so flat() views SHARE the memo with their
        # parent (a dense() on either fills it for both)
        self._dense = [None]

    @property
    def shape(self):
        return (*self.lead, self.t_true)

    @property
    def ndim(self):
        return len(self.lead) + 1

    def __len__(self):
        return self.lead[0]

    def flat(self):
        """The [rows, T] view of the same codes (shared buffers and
        dense memo) — what the 2-D trace wires consume."""
        if len(self.lead) == 1:
            return self
        out = PackedInt4Traces(self.packed, self.scale, self.t_true,
                               self.decimate)
        out._dense = self._dense
        return out

    def dense(self):
        """Dense f32 [*lead, T] reconstruction (memoised flat)."""
        if self._dense[0] is None:
            self._dense[0] = decode_int4_traces(
                self.packed, self.scale, self.t_true, self.decimate)
        if len(self.lead) == 1:
            return self._dense[0]
        return self._dense[0].reshape(*self.lead, self.t_true)

    def __array__(self, dtype=None, copy=None):
        d = self.dense()
        if dtype is not None and np.dtype(dtype) != d.dtype:
            return d.astype(dtype)
        if copy:
            return d.copy()
        return d


def quantise_int8(part, out=None):
    """Per-trace peak/127 int8 codes for a [..., T] block.

    Returns ``(codes int8 [..., T], scale f32 [...])`` with
    ``scale = max(|row|) / 127`` (1.0 for all-zero rows), quantised in
    f32. ``out`` optionally receives the codes in place (e.g. a slice
    of a preallocated padded buffer). Raises on non-finite input: the
    unsafe int8 cast would otherwise wrap silently.
    """
    part_src = np.asarray(part)
    if part_src.ndim == 2:
        from . import native

        res = native.encode_traces_int8(part_src, out=out)
        if res is not None:
            return res
    part = np.asarray(part_src, dtype=np.float32)
    scale = (np.abs(part).max(axis=-1) / np.float32(127.0)).astype(
        np.float32)
    if not np.isfinite(scale).all():
        raise ValueError(
            "traces contain non-finite samples (or peaks above float32 "
            "range); the int8 trace wire requires finite traces")
    scale = np.where(scale > 0, scale, np.float32(1.0))
    if out is None:
        out = np.empty(part.shape, dtype=np.int8)
    np.rint(part / scale[..., None], out=out, casting="unsafe")
    return out, scale
