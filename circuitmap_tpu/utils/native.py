"""ctypes bindings for the native windowing library.

Compiles circuitmap_tpu/native/windowing.cpp on first use (cached next
to the source) and exposes:

  * extract_windows(timeline, stim_times, pre, width) -> [K, W] f32
  * trapz_rows(traces) -> [K] f64 charges
  * extract_windows_with_charge(...) -> (windows, charges)

Every entry point has a numpy fallback (used automatically when no
compiler is available), so the native path is a pure accelerator.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent.parent / "native" / "windowing.cpp"
_LIB = _SRC.parent / "libwindowing.so"
_lib = None
_load_failed = False


def _build():
    cmd = [
        "g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC",
        "-std=c++17", "-pthread",
        str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _get_lib():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        # rebuild when the source is newer; a prebuilt .so without the
        # source alongside (e.g. a binary install) is used as-is
        stale = (
            not _LIB.exists()
            or (_SRC.exists() and _LIB.stat().st_mtime < _SRC.stat().st_mtime)
        )
        if stale:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.cm_extract_windows.argtypes = [
            f32p, ctypes.c_int64, i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, f32p,
        ]
        lib.cm_trapz_rows.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64, f64p]
        lib.cm_extract_windows_with_charge.argtypes = [
            f32p, ctypes.c_int64, i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, f32p, f64p,
        ]
        # probe the (newer) sparsify symbols separately: a prebuilt
        # libwindowing.so predating them must not disable the whole
        # library — only sparsify_stim falls back
        i16p = ctypes.POINTER(ctypes.c_int16)
        i8p = ctypes.POINTER(ctypes.c_int8)
        for name, stim_p in (("cm_sparsify_stim2_f64", f64p),
                             ("cm_sparsify_stim2_f32", f32p)):
            try:
                fn = getattr(lib, name)
            except AttributeError:
                continue
            fn.argtypes = [
                stim_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                f32p, ctypes.c_int64, ctypes.c_int64,
                i16p, i8p, f64p,
            ]
            fn.restype = ctypes.c_int64
        # fused trace-wire encoders (newer again — probe separately so
        # an older prebuilt .so only loses this accelerator)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        for name, src_p in (("cm_encode_traces_int4_f64", f64p),
                            ("cm_encode_traces_int4_f32", f32p),
                            ("cm_encode_traces_int8_f64", f64p),
                            ("cm_encode_traces_int8_f32", f32p)):
            try:
                fn = getattr(lib, name)
            except AttributeError:
                continue
            fn.argtypes = [
                src_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                u8p, f32p,
            ]
            fn.restype = ctypes.c_int64
        try:
            fn = lib.cm_decode_traces_int4
            fn.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                f32p, f32p,
            ]
            fn.restype = ctypes.c_int64
        except AttributeError:
            pass
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def _as_f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def extract_windows(timeline, stim_times, pre=100, width=900):
    """[K, W] response windows around stim times; zero-padded at edges."""
    timeline = _as_f32(timeline)
    stim_times = np.ascontiguousarray(stim_times, dtype=np.int64)
    K = stim_times.size
    lib = _get_lib()
    if lib is None:
        return _extract_windows_np(timeline, stim_times, pre, width)
    out = np.empty((K, width), dtype=np.float32)
    lib.cm_extract_windows(
        _ptr(timeline, ctypes.c_float), timeline.size,
        _ptr(stim_times, ctypes.c_int64), K, pre, width,
        _ptr(out, ctypes.c_float),
    )
    return out


def trapz_rows(traces):
    """Per-row trapezoidal charge of a [K, W] block (f64 accumulate)."""
    traces = _as_f32(traces)
    K, W = traces.shape
    lib = _get_lib()
    if lib is None:
        return np.trapezoid(traces.astype(np.float64), axis=-1)
    out = np.empty(K, dtype=np.float64)
    lib.cm_trapz_rows(_ptr(traces, ctypes.c_float), K, W,
                      _ptr(out, ctypes.c_double))
    return out


def extract_windows_with_charge(timeline, stim_times, pre=100, width=900):
    """Fused windows + charges in one parallel pass."""
    timeline = _as_f32(timeline)
    stim_times = np.ascontiguousarray(stim_times, dtype=np.int64)
    K = stim_times.size
    lib = _get_lib()
    if lib is None:
        w = _extract_windows_np(timeline, stim_times, pre, width)
        return w, np.trapezoid(w.astype(np.float64), axis=-1)
    windows = np.empty((K, width), dtype=np.float32)
    charges = np.empty(K, dtype=np.float64)
    lib.cm_extract_windows_with_charge(
        _ptr(timeline, ctypes.c_float), timeline.size,
        _ptr(stim_times, ctypes.c_int64), K, pre, width,
        _ptr(windows, ctypes.c_float), _ptr(charges, ctypes.c_double),
    )
    return windows, charges


def sparsify_stim(stim_np, levels_np, h_cap):
    """Native hologram sparsification of a dense [N, K] stim matrix.

    Returns (targets int16 [H, K], tbucket int8 [H, K],
    power_counts f64 [N, P]); None when the native library is
    unavailable or the dtype is unsupported (caller uses the numpy
    path); the string "overflow" when some column holds more than
    ``h_cap`` targets (caller goes straight to the dense upload).
    Raises ValueError when stim contains a value missing from the
    level table. One parallel pass, column-blocked so within-column
    target order stays ascending in neuron index — the same wire
    contract as solvers/_common._sparsify.
    """
    lib = _get_lib()
    if lib is None or not hasattr(lib, "cm_sparsify_stim2_f64"):
        return None
    # both memory layouts are handled natively: simulate() hands its
    # design back F-contiguous (a transposed build), and copying it to
    # C order cost ~180 ms for the 160 MB bench stim — more than the
    # sparsify pass itself
    if stim_np.flags["C_CONTIGUOUS"]:
        f_layout = 0
    elif stim_np.flags["F_CONTIGUOUS"]:
        f_layout = 1
    else:
        stim_np = np.ascontiguousarray(stim_np)
        f_layout = 0
    if stim_np.dtype == np.float64:
        fn, cptr = lib.cm_sparsify_stim2_f64, ctypes.c_double
    elif stim_np.dtype == np.float32:
        fn, cptr = lib.cm_sparsify_stim2_f32, ctypes.c_float
    else:
        return None
    N, K = stim_np.shape
    if N > 32766:  # targets are int16; the callers guard too, but this
        return None  # is a public util — never wrap silently
    levels = np.ascontiguousarray(levels_np, dtype=np.float32)
    P = levels.size - 1
    h_cap = int(max(h_cap, 1))
    targets = np.full((h_cap, K), -1, dtype=np.int16)
    tbucket = np.zeros((h_cap, K), dtype=np.int8)
    power_counts = np.zeros((N, P), dtype=np.float64)
    H = fn(
        _ptr(stim_np, cptr), N, K, f_layout,
        _ptr(levels, ctypes.c_float), levels.size, h_cap,
        _ptr(targets, ctypes.c_int16), _ptr(tbucket, ctypes.c_int8),
        _ptr(power_counts, ctypes.c_double),
    )
    if H == -2:
        raise ValueError(
            "stim contains stimulation values not covered by the level "
            f"table {levels[1:].tolist()}; pass the exact powers= used "
            "in the experiment (or omit powers=)"
        )
    if H == -1:
        return "overflow"
    if H == 0:
        return None  # no stimulation anywhere: caller handles
    return targets[:H], tbucket[:H], power_counts


def _encode_fn(lib, part, bits):
    """Pick the native encoder for ``part``'s dtype, or None."""
    name = f"cm_encode_traces_int{bits}_"
    if not hasattr(lib, name + "f64"):
        return None, None
    if part.dtype == np.float64:
        return getattr(lib, name + "f64"), ctypes.c_double
    if part.dtype == np.float32:
        return getattr(lib, name + "f32"), ctypes.c_float
    return None, None


def encode_traces_int4(part, decimate=1, out_rows=None):
    """Native fused int4 trace-wire encode of a C-contiguous [B, T]
    f32/f64 chunk: cast→(mean-pool by ``decimate``)→quantise→nibble
    pack in ONE streaming pass over the source. Bit-for-bit identical
    to utils/quant.quantise_pack_int4 composed with _pool2 (equality
    tested). Returns ``(packed uint8 [out_rows or B, ceil(T'/2)],
    scale f32 [B])``; None when the library/dtype/layout is
    unsupported (caller falls back to the numpy pipeline). Raises on
    non-finite samples, exactly like the numpy wire."""
    lib = _get_lib()
    if (lib is None or part.ndim != 2
            or not part.flags["C_CONTIGUOUS"]):
        return None
    fn, cptr = _encode_fn(lib, part, 4)
    if fn is None:
        return None
    B, T = part.shape
    rows = B if out_rows is None else int(out_rows)
    if rows < B:
        raise ValueError(f"out_rows={rows} smaller than the chunk ({B})")
    t2 = (T // 2 + (T % 2)) if decimate == 2 else T
    packed = np.zeros((rows, (t2 + 1) // 2), dtype=np.uint8)
    scale = np.empty(B, dtype=np.float32)
    rc = fn(_ptr(part, cptr), B, T, int(decimate),
            _ptr(packed, ctypes.c_uint8), _ptr(scale, ctypes.c_float))
    if rc == -1:
        raise ValueError(
            "traces contain non-finite samples (or peaks above float32 "
            "range); the int4 wire format requires finite traces")
    return packed, scale


def encode_traces_int8(part, out=None):
    """Native fused int8 trace-wire encode of a C-contiguous [B, T]
    f32/f64 chunk; the int8 twin of :func:`encode_traces_int4`
    (bit-identical to utils/quant.quantise_int8). ``out`` optionally
    receives the codes in place (C-contiguous int8 [B, T] — e.g. a
    leading slice of a padded upload buffer). Returns ``(codes, scale
    f32 [B])`` or None when unsupported."""
    lib = _get_lib()
    if (lib is None or part.ndim != 2
            or not part.flags["C_CONTIGUOUS"]):
        return None
    fn, cptr = _encode_fn(lib, part, 8)
    if fn is None:
        return None
    B, T = part.shape
    if out is None:
        out = np.empty((B, T), dtype=np.int8)
    elif (out.dtype != np.int8 or out.shape != (B, T)
          or not out.flags["C_CONTIGUOUS"]):
        return None
    scale = np.empty(B, dtype=np.float32)
    rc = fn(_ptr(part, cptr), B, T, 1,
            _ptr(out, ctypes.c_uint8), _ptr(scale, ctypes.c_float))
    if rc == -1:
        raise ValueError(
            "traces contain non-finite samples (or peaks above float32 "
            "range); the int8 trace wire requires finite traces")
    return out, scale


def decode_traces_int4(packed, scale, t_true, decimate=1):
    """Native fused int4 trace-wire decode: nibble-unpack + dequantise
    (+ the int4d2 wire's device-reference 2x linear upsample) in one
    pass per row, returning dense f32 [B, t_true]. Bit-for-bit equal
    to utils/quant's numpy decode (unpack_int4_codes * scale, then
    _upsample2 for decimate=2; equality tested). Returns None when the
    library is unavailable or inputs aren't the C-contiguous layout
    the kernel walks (caller falls back to numpy)."""
    lib = _get_lib()
    if (lib is None or not hasattr(lib, "cm_decode_traces_int4")
            or packed.ndim != 2 or packed.dtype != np.uint8
            or not packed.flags["C_CONTIGUOUS"]):
        return None
    scale = np.ascontiguousarray(scale, dtype=np.float32)
    B = packed.shape[0]
    if scale.shape != (B,):
        return None
    t2 = (t_true + 1) // 2 if decimate == 2 else t_true
    if packed.shape[1] != (t2 + 1) // 2:
        return None
    out = np.empty((B, t_true), dtype=np.float32)
    lib.cm_decode_traces_int4(
        _ptr(packed, ctypes.c_uint8), B, int(t_true), int(decimate),
        _ptr(scale, ctypes.c_float), _ptr(out, ctypes.c_float))
    return out


def _extract_windows_np(timeline, stim_times, pre, width):
    T = timeline.size
    idx = stim_times[:, None] - pre + np.arange(width)[None, :]
    valid = (idx >= 0) & (idx < T)
    out = np.where(valid, timeline[np.clip(idx, 0, T - 1)], 0.0)
    return out.astype(np.float32)


def native_available():
    return _get_lib() is not None
