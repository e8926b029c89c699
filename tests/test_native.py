"""Native windowing library: parity with numpy + edge handling."""

import numpy as np
import pytest

from circuitmap_tpu.utils import native


@pytest.fixture(scope="module")
def timeline(rng):
    return rng.normal(size=200_000).astype(np.float32)


class TestNative:
    def test_builds(self):
        assert native.native_available(), "g++ build of windowing.cpp failed"

    def test_windows_match_numpy(self, timeline, rng):
        stim_times = np.sort(rng.integers(1000, 190_000, size=300)).astype(np.int64)
        got = native.extract_windows(timeline, stim_times, pre=100, width=900)
        want = native._extract_windows_np(timeline, stim_times, 100, 900)
        np.testing.assert_array_equal(got, want)

    def test_edge_padding(self, timeline):
        stim_times = np.array([10, len(timeline) - 10], dtype=np.int64)
        w = native.extract_windows(timeline, stim_times, pre=100, width=900)
        # first window: 90 leading zeros; last window: trailing zeros
        assert np.all(w[0, :90] == 0.0)
        np.testing.assert_array_equal(w[0, 90:], timeline[:810])
        assert np.all(w[1, -(900 - 110):] == 0.0)

    def test_trapz_matches_numpy(self, rng):
        traces = rng.normal(size=(128, 900)).astype(np.float32)
        got = native.trapz_rows(traces)
        want = np.trapezoid(traces.astype(np.float64), axis=-1)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_fused(self, timeline, rng):
        stim_times = np.sort(rng.integers(1000, 190_000, size=64)).astype(np.int64)
        w, c = native.extract_windows_with_charge(timeline, stim_times)
        np.testing.assert_allclose(
            c, np.trapezoid(w.astype(np.float64), axis=-1), rtol=1e-6
        )

    def test_throughput_sanity(self, rng):
        """Hour-scale recording windowed in well under a second."""
        import time

        timeline = rng.normal(size=20_000 * 600).astype(np.float32)  # 10 min
        stim_times = np.arange(2000, timeline.size - 2000, 666, dtype=np.int64)
        t0 = time.time()
        w, c = native.extract_windows_with_charge(timeline, stim_times)
        dt = time.time() - t0
        assert w.shape[0] == stim_times.size
        assert dt < 2.0, f"native windowing too slow: {dt:.2f}s"


class TestEdgeCases:
    def test_far_out_of_range_stim_times(self, timeline):
        """Stim times far outside the recording must zero-fill, not
        overflow (regression: unclamped leading-fill wrote past the row)."""
        stim_times = np.array([-1500, len(timeline) + 1500], dtype=np.int64)
        w = native.extract_windows(timeline, stim_times, pre=100, width=900)
        assert np.all(w == 0.0)
        w2, c = native.extract_windows_with_charge(timeline, stim_times)
        assert np.all(w2 == 0.0) and np.all(c == 0.0)


class TestTraceEncoders:
    """The fused native trace-wire encoders must be bit-for-bit
    identical to the numpy pipeline they replace (cast-to-f32 →
    _pool2 → quantise → pack) — the QAT demixer checkpoints are
    trained against exactly that transform, so ANY code difference is
    an out-of-distribution wire."""

    def _numpy_int4(self, part, decimate=1, out_rows=None):
        from circuitmap_tpu.utils.quant import _pool2, quantise_pack_int4

        src = np.asarray(part, dtype=np.float32)
        if decimate == 2:
            src = _pool2(src)
        return quantise_pack_int4(src, out_rows=out_rows)

    def _traces(self, B=64, T=900, dtype=np.float64, seed=0):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(B, T)) * rng.gamma(2.0, 40.0, size=(B, 1))
        if B >= 6 and T >= 8:
            x[:4] = 0.0  # all-zero rows exercise the scale=1 branch
            # plant exact .5-boundary code values: peak 7 -> scale 0.25
            x[5, :8] = [7.0, 1.125, -1.125, 0.625, -0.625, 0.375,
                        3.625, 0]
        return np.ascontiguousarray(x.astype(dtype))

    @pytest.mark.parametrize("dtype", [np.float64, np.float32])
    @pytest.mark.parametrize("decimate", [1, 2])
    @pytest.mark.parametrize("T", [900, 901])
    def test_int4_matches_numpy(self, dtype, decimate, T):
        part = self._traces(T=T, dtype=dtype)
        nat = native.encode_traces_int4(part, decimate=decimate)
        if nat is None:
            pytest.skip("native encoder unavailable")
        ref = self._numpy_int4(part, decimate=decimate)
        np.testing.assert_array_equal(nat[0], ref[0])
        np.testing.assert_array_equal(nat[1], ref[1])
        assert nat[0].dtype == np.uint8 and nat[1].dtype == np.float32

    def test_int4_out_rows_padding(self):
        part = self._traces(B=13, T=640)
        nat = native.encode_traces_int4(part, decimate=2, out_rows=16)
        if nat is None:
            pytest.skip("native encoder unavailable")
        ref = self._numpy_int4(part, decimate=2, out_rows=16)
        np.testing.assert_array_equal(nat[0], ref[0])
        assert np.all(nat[0][13:] == 0)
        with pytest.raises(ValueError):
            native.encode_traces_int4(part, out_rows=8)

    @pytest.mark.parametrize("dtype", [np.float64, np.float32])
    def test_int8_matches_numpy(self, dtype, monkeypatch):
        from circuitmap_tpu.utils import quant
        import circuitmap_tpu.utils.native as nmod

        part = self._traces(T=777, dtype=dtype)
        nat = native.encode_traces_int8(part)
        if nat is None:
            pytest.skip("native encoder unavailable")
        # force quantise_int8 down the numpy path for the reference
        monkeypatch.setattr(nmod, "encode_traces_int8",
                            lambda *a, **k: None)
        ref = quant.quantise_int8(part)
        np.testing.assert_array_equal(nat[0], ref[0])
        np.testing.assert_array_equal(nat[1], ref[1])

    def test_int8_out_in_place(self):
        part = self._traces(B=8, T=200)
        buf = np.zeros((8, 200), dtype=np.int8)
        res = native.encode_traces_int8(part, out=buf)
        if res is None:
            pytest.skip("native encoder unavailable")
        assert res[0] is buf
        ref = native.encode_traces_int8(part)
        np.testing.assert_array_equal(buf, ref[0])

    @pytest.mark.parametrize("bad", [np.nan, np.inf, -np.inf, 1e200])
    def test_non_finite_raises(self, bad):
        part = self._traces(B=8, T=64)
        part[3, 10] = bad
        if native.encode_traces_int4(self._traces(B=1, T=4)) is None:
            pytest.skip("native encoder unavailable")
        with pytest.raises(ValueError):
            native.encode_traces_int4(part)
        with pytest.raises(ValueError):
            native.encode_traces_int8(part)

    @pytest.mark.parametrize("decimate", [1, 2])
    @pytest.mark.parametrize("T", [900, 901])
    def test_decode_matches_numpy(self, decimate, T):
        """The fused native int4 decode (unpack + dequantise + d2
        upsample) must reproduce the numpy/device reference decode
        bit for bit."""
        from circuitmap_tpu.utils.quant import (
            _upsample2, encode_int4_traces, unpack_int4_codes)

        part = self._traces(B=48, T=T, dtype=np.float32)
        packed, scale = encode_int4_traces(part, decimate=decimate)
        th = (T + 1) // 2 if decimate == 2 else T
        ref = unpack_int4_codes(packed, th).astype(np.float32)
        ref = ref * scale[:, None]
        if decimate == 2:
            ref = _upsample2(ref, T)
        nat = native.decode_traces_int4(packed, scale, T, decimate)
        if nat is None:
            pytest.skip("native decoder unavailable")
        np.testing.assert_array_equal(nat, ref)
        assert nat.dtype == np.float32

    def test_decode_dispatcher_native_equals_fallback(self, monkeypatch):
        from circuitmap_tpu.utils import quant
        import circuitmap_tpu.utils.native as nmod

        part = self._traces(B=16, T=333)
        for dec in (1, 2):
            packed, scale = quant.encode_int4_traces(part, decimate=dec)
            a = quant.decode_int4_traces(packed, scale, 333, dec)
            monkeypatch.setattr(nmod, "decode_traces_int4",
                                lambda *a_, **k_: None)
            b = quant.decode_int4_traces(packed, scale, 333, dec)
            monkeypatch.undo()
            np.testing.assert_array_equal(a, b)

    def test_packed_container(self):
        """PackedInt4Traces: shape contract, memoised dense, __array__
        fallback, and constructor validation."""
        from circuitmap_tpu.utils.quant import (PackedInt4Traces,
                                                encode_int4_traces)

        part = self._traces(B=16, T=301)
        packed, scale = encode_int4_traces(part, decimate=2)
        c = PackedInt4Traces(packed, scale, 301, 2)
        assert c.shape == (16, 301) and c.ndim == 2 and len(c) == 16
        d1 = c.dense()
        assert d1 is c.dense()  # memoised
        np.testing.assert_array_equal(np.asarray(c), d1)
        assert np.asarray(c, dtype=np.float64).dtype == np.float64
        with pytest.raises(ValueError, match="decimate"):
            PackedInt4Traces(packed, scale, 301, 3)
        with pytest.raises(ValueError, match="packed must be"):
            PackedInt4Traces(packed, scale, 301, 1)  # wrong width for d1
        with pytest.raises(ValueError, match="scale"):
            PackedInt4Traces(packed, scale[:4], 301, 2)
        # batch lead dims: [B, K, T] view over the same flat rows
        c3 = PackedInt4Traces(packed, scale, 301, 2, lead=(4, 4))
        assert c3.shape == (4, 4, 301) and c3.ndim == 3 and len(c3) == 4
        np.testing.assert_array_equal(c3.dense(),
                                      d1.reshape(4, 4, 301))
        flat = c3.flat()
        assert flat.shape == (16, 301) and flat.packed is c3.packed
        np.testing.assert_array_equal(flat.dense(), d1)
        # the memo is SHARED both ways: densifying the flat view must
        # fill the parent's memo too (and vice versa) — the flagship
        # decode would otherwise run twice per request
        c4 = PackedInt4Traces(packed, scale, 301, 2, lead=(4, 4))
        f4 = c4.flat()
        base = f4.dense()
        assert c4.dense().base is base or c4._dense[0] is base
        with pytest.raises(ValueError, match="lead"):
            PackedInt4Traces(packed, scale, 301, 2, lead=(3, 4))

    def test_dispatcher_native_equals_fallback(self, monkeypatch):
        """encode_int4_traces must return the same wire whether the
        native library is present or not (the serve/solver/demixer
        callers all route through it)."""
        from circuitmap_tpu.utils import quant
        import circuitmap_tpu.utils.native as nmod

        part = self._traces(B=32, T=901)
        for dec in (1, 2):
            a = quant.encode_int4_traces(part, decimate=dec)
            monkeypatch.setattr(nmod, "encode_traces_int4",
                                lambda *a_, **k_: None)
            b = quant.encode_int4_traces(part, decimate=dec)
            monkeypatch.undo()
            np.testing.assert_array_equal(a[0], b[0])
            np.testing.assert_array_equal(a[1], b[1])

    def test_dispatcher_validation(self):
        from circuitmap_tpu.utils import quant

        with pytest.raises(ValueError):
            quant.encode_int4_traces(np.zeros(8, np.float32))
        with pytest.raises(ValueError):
            quant.encode_int4_traces(np.zeros((2, 8), np.float32),
                                     decimate=3)

    def test_noncontiguous_falls_back(self):
        """A strided view must not be handed to the pointer-walking C
        code; the dispatcher's numpy fallback covers it."""
        from circuitmap_tpu.utils import quant

        base = self._traces(B=16, T=300)
        view = base[::2]
        assert not view.flags["C_CONTIGUOUS"]
        assert native.encode_traces_int4(view) is None
        a = quant.encode_int4_traces(view)
        b = quant.encode_int4_traces(np.ascontiguousarray(view))
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


class TestSparsifyStim:
    def _stim(self, N=137, K=700, H=6, seed=0):
        rng = np.random.default_rng(seed)
        stim = np.zeros((N, K))
        for k in range(3, K):
            tgt = rng.choice(N, size=rng.integers(1, H + 1), replace=False)
            stim[tgt, k] = rng.choice([45.0, 55.0, 65.0])
        return stim

    def test_matches_numpy_sparsifier(self, monkeypatch):
        """Native single-pass sparsify must produce the exact wire
        arrays of the numpy path (targets, buckets, power counts)."""
        from circuitmap_tpu.solvers import _common
        import circuitmap_tpu.utils.native as nmod

        stim = self._stim()
        levels = np.asarray([0.0, 45.0, 55.0, 65.0], np.float32)
        nat = native.sparsify_stim(stim, levels, h_cap=17)
        if nat is None:
            import pytest
            pytest.skip("native library unavailable")
        monkeypatch.setattr(nmod, "sparsify_stim", lambda *a, **k: None)
        ref = _common._sparsify(stim, levels)
        np.testing.assert_array_equal(nat[0], ref[0])
        np.testing.assert_array_equal(nat[1], ref[1])
        np.testing.assert_array_equal(nat[2], ref[2])

    def test_fortran_layout_matches_c_layout(self):
        """Both memory layouts are handled natively (simulate() hands
        its design back F-contiguous; copying it to C order cost more
        than the sparsify pass itself). The wire arrays must be
        identical bit for bit across layout and dtype."""
        stim_c = np.ascontiguousarray(self._stim(N=64, K=300, H=4, seed=2))
        stim_f = np.asfortranarray(stim_c)
        assert stim_f.flags["F_CONTIGUOUS"] and not stim_f.flags["C_CONTIGUOUS"]
        levels = np.asarray([0.0, 45.0, 55.0, 65.0], np.float32)
        a = native.sparsify_stim(stim_c, levels, h_cap=8)
        if a is None:
            import pytest
            pytest.skip("native library unavailable")
        for other in (stim_f, np.asfortranarray(stim_c.astype(np.float32))):
            b = native.sparsify_stim(other, levels, h_cap=8)
            for x, y in zip(a, b):
                np.testing.assert_array_equal(x, y)
        # overflow and level-mismatch report identically from the F path
        assert native.sparsify_stim(stim_f, levels, h_cap=1) == "overflow"
        bad = stim_f.copy(order="F")
        bad[3, 7] = 99.0
        import pytest
        with pytest.raises(ValueError):
            native.sparsify_stim(bad, levels, h_cap=8)

    def test_f32_input_and_overflow(self):
        stim = self._stim(N=64, K=300, H=4, seed=1)
        levels = np.asarray([0.0, 45.0, 55.0, 65.0], np.float32)
        a = native.sparsify_stim(stim, levels, h_cap=8)
        b = native.sparsify_stim(stim.astype(np.float32), levels, h_cap=8)
        if a is None:
            import pytest
            pytest.skip("native library unavailable")
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        # a too-small cap reports overflow rather than truncating
        assert native.sparsify_stim(stim, levels, h_cap=1) == "overflow"
        # all-zero stim: nothing to sparsify
        assert native.sparsify_stim(np.zeros((8, 16)), levels, 4) is None
