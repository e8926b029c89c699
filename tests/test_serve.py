"""Fit-server round trips: one subprocess server, stdlib client.

The server runs on the CPU backend in its own process (the production
shape: it owns the device; tests are the rig-side client). One server
serves the whole module — startup + first-fit compile dominate, so the
tests share shapes where they can reuse executables.
"""

import json
import os
import select
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N, K, T = 30, 256, 900
ITERS = 8
FIT_OPTS = dict(iters=ITERS, msrmp=0.3, num_mc_samples=20, seed=11,
                verbose=False)


@pytest.fixture(scope="module")
def sim():
    import circuitmap_tpu as cm

    np.random.seed(3)
    return cm.simulate(N=N, trials=K, H=4, connection_prob=0.1,
                       verbose=False)


def _start_server(*extra_args, force_devices=None):
    """Launch a fit-server subprocess on the CPU backend; returns
    (FitClient, Popen). Caller shuts it down."""
    import tempfile

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    if force_devices:
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={force_devices}")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    errlog = tempfile.NamedTemporaryFile(
        mode="w+", suffix="_serve_stderr.log", delete=False)
    proc = subprocess.Popen(
        [sys.executable, "-m", "circuitmap_tpu", "serve", "--port", "0",
         *extra_args],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=errlog,
        text=True)

    def _err_tail():
        try:
            with open(errlog.name) as fh:
                return fh.read()[-2000:]
        except OSError:
            return "<no stderr>"

    port = None
    deadline = time.time() + 120
    line = ""
    while time.time() < deadline:
        ready, _, _ = select.select([proc.stdout], [], [], 1.0)
        if not ready:
            if proc.poll() is not None:
                raise RuntimeError(
                    f"fit server died during startup:\n{_err_tail()}")
            continue
        line = proc.stdout.readline()
        if not line:  # EOF — the server exited
            proc.wait(timeout=10)
            raise RuntimeError(
                f"fit server exited before SERVING:\n{_err_tail()}")
        if line.startswith("STATUS"):
            # --status-port sidecar announces before SERVING
            proc.status_port = int(line.split("port=")[1].split()[0])
            continue
        if line.startswith("SERVING"):
            port = int(line.split("port=")[1].split()[0])
            break
    if port is None:
        proc.kill()
        raise RuntimeError(
            f"no SERVING line within 120s (last: {line!r})\n{_err_tail()}")

    from circuitmap_tpu.serve import FitClient

    return FitClient(f"http://127.0.0.1:{port}", timeout=600), proc


def _stop_server(client, proc):
    try:
        client.shutdown()
        proc.wait(timeout=30)
    except Exception:
        proc.kill()


@pytest.fixture(scope="module")
def server():
    client, proc = _start_server("--demixer", "default")
    yield client
    _stop_server(client, proc)


class TestServer:
    def test_health(self, server):
        h = server.health()
        assert h["status"] == "ok"
        assert h["platform"] == "cpu"
        assert h["demixer"] == "default"

    def test_fit_matches_local_and_recovers(self, server, sim):
        from circuitmap_tpu import Model

        state = server.fit(sim["psc"], sim["stim_matrix"], demix=False,
                           **FIT_OPTS)
        assert state["mu"].shape == (N,)
        assert state["lam"].shape == (N, K)
        assert float(state["fit_time_s"]) > 0

        local = Model(N).fit(sim["psc"], sim["stim_matrix"],
                             method="caviar", fit_options=dict(FIT_OPTS))
        np.testing.assert_allclose(state["mu"], local.state["mu"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(state["lam"], local.state["lam"],
                                   rtol=1e-4, atol=1e-5)

        # sanity only — the binding contract is the exact match above;
        # recovery quality at real configs is test_caviar's job (this
        # is a deliberately tiny raw-trace fit: N=30, K=256, 8 iters)
        from circuitmap_tpu.utils.metrics import r2_score

        assert r2_score(sim["weights"], state["mu"]) > 0.5

    def test_demix_fit_matches_local_chain(self, server, sim):
        """The server's demix=True chain (device-resident demixed
        traces feeding the solver) equals running the same demixer +
        fit locally — the server runs --demixer default (seed=0)."""
        from circuitmap_tpu import Model, NeuralDemixer

        state = server.fit(sim["psc"], sim["stim_matrix"], demix=True,
                           **FIT_OPTS)
        demixed = NeuralDemixer(seed=0)(sim["psc"], verbose=False,
                                        keep_on_device=True)
        local = Model(N).fit(demixed, sim["stim_matrix"],
                             method="caviar", fit_options=dict(FIT_OPTS))
        np.testing.assert_allclose(state["mu"], local.state["mu"],
                                   rtol=1e-4, atol=1e-5)

    def test_fit_many_matches_library_batch(self, server, sim):
        """POST /fit_many == caviar_many on the same stacked inputs
        (same seeds), through the default sparse-stims wire."""
        from circuitmap_tpu.model import default_priors
        from circuitmap_tpu.solvers import caviar_many

        rng = np.random.RandomState(2)
        pscs = np.stack([sim["psc"], sim["psc"][::-1]])
        stims = np.stack([sim["stim_matrix"],
                          sim["stim_matrix"][:, rng.permutation(K)]])
        opts = dict(FIT_OPTS)
        opts.pop("seed")
        out = server.fit_many(pscs, stims, demix=False, seeds=[4, 9],
                              **opts)
        assert out["mu"].shape == (2, N)
        assert out["lam"].shape == (2, N, K)
        pri = default_priors(N)
        res = caviar_many(pscs, stims, pri["mu"], pri["beta"],
                          pri["shape"], pri["rate"], pri["phi"],
                          pri["phi_cov"], seeds=[4, 9], **opts)
        np.testing.assert_allclose(
            out["mu"], np.stack([np.asarray(r["mu"]) for r in res]),
            rtol=1e-5, atol=1e-6)

    def test_fit_histories_on_request(self, server, sim):
        state = server.fit(sim["psc"], sim["stim_matrix"], demix=False,
                           save_histories=True, **FIT_OPTS)
        assert state["history_mu"].shape == (ITERS, N)
        # reference history-shape contract: scalars broadcast to (iters, K)
        assert state["history_shape"].shape == (ITERS, K)

    def test_demix_endpoint(self, server, sim):
        out = server.demix(sim["psc"][:8])
        assert out.shape == (8, T)
        assert np.isfinite(out).all()

    def test_stream_round_trip(self, server, sim):
        half = K // 2
        psc, stim = sim["psc"], sim["stim_matrix"]
        r1 = server.stream_update(
            "exp1", psc[:half], stim[:, :half], iters=4, demix=False,
            create={"num_mc_samples": 20, "analytic_mc": True,
                    "powers": [45.0, 55.0, 65.0]})
        assert r1["trial_count"] == half
        post = server.stream_posterior("exp1")
        assert post["mu"].shape == (N,)
        r2 = server.stream_update("exp1", psc[half:], stim[:, half:],
                                  iters=4, demix=False)
        assert r2["trial_count"] == K
        assert r2["iterations"] == 8
        res = server.stream_result("exp1")
        assert res["lam"].shape == (N, K)
        assert int(res["trial_count"]) == K
        assert server.health()["streams"]["exp1"]["trials"] == K
        server.stream_delete("exp1")
        assert "exp1" not in server.health()["streams"]

    def test_stream_create_only_first(self, server, sim):
        server.stream_update("exp2", sim["psc"][:128],
                             sim["stim_matrix"][:, :128], iters=1,
                             demix=False, create={"analytic_mc": True})
        with pytest.raises(RuntimeError, match="400.*already exists"):
            server.stream_update("exp2", sim["psc"][:128],
                                 sim["stim_matrix"][:, :128], iters=1,
                                 demix=False, create={"analytic_mc": True})
        server.stream_delete("exp2")

    def test_keepalive_client_cannot_wedge_server(self, server):
        """A keep-alive HTTP/1.1 client (requests/Go/curl semantics)
        must not hold the single-threaded server hostage between
        requests: responses are HTTP/1.0 (connection closes per
        request), so a second client gets served immediately."""
        import http.client
        from urllib.parse import urlparse

        u = urlparse(server.base_url)
        conn = http.client.HTTPConnection(u.hostname, u.port, timeout=30)
        try:
            conn.request("GET", "/health")  # http.client is keep-alive
            resp = conn.getresponse()
            assert resp.status == 200
            resp.read()
            # do NOT close conn — an idle keep-alive socket must not
            # block the next client
            t0 = time.time()
            assert server.health()["status"] == "ok"
            assert time.time() - t0 < 10
        finally:
            conn.close()

    def test_failed_first_update_does_not_burn_stream_name(self, server,
                                                           sim):
        with pytest.raises(RuntimeError, match="400"):
            server.stream_update(  # trial-count mismatch → update raises
                "exp3", sim["psc"][:16], sim["stim_matrix"][:, :8],
                iters=1, demix=False, create={"analytic_mc": True})
        assert "exp3" not in server.health()["streams"]
        # the name and its create options are retryable
        server.stream_update("exp3", sim["psc"][:128],
                             sim["stim_matrix"][:, :128], iters=1,
                             demix=False, create={"analytic_mc": True})
        server.stream_delete("exp3")

    def test_stream_name_with_special_chars(self, server, sim):
        name = "rig A/slice#2"
        server.stream_update(name, sim["psc"][:128],
                             sim["stim_matrix"][:, :128], iters=1,
                             demix=False, create={"analytic_mc": True})
        assert server.stream_posterior(name)["mu"].shape == (N,)
        assert name in server.health()["streams"]
        server.stream_delete(name)
        assert name not in server.health()["streams"]

    def test_solver_mismatched_options_are_client_errors(self, server,
                                                         sim):
        with pytest.raises(RuntimeError, match="400.*unknown method"):
            server.fit(sim["psc"], sim["stim_matrix"], demix=False,
                       method="bogus")
        with pytest.raises(RuntimeError, match="400.*caviar rejected"):
            server.fit(sim["psc"], sim["stim_matrix"], demix=False,
                       k=5, **FIT_OPTS)  # k is cosamp-only

    def test_client_errors(self, server, sim):
        with pytest.raises(RuntimeError, match="400.*unknown fit option"):
            server.fit(sim["psc"], sim["stim_matrix"], demix=False,
                       bogus_option=1)
        with pytest.raises(RuntimeError, match="400.*carries"):
            server.fit(sim["psc"][:5], sim["stim_matrix"], demix=False)
        with pytest.raises(RuntimeError, match="400.*no stream"):
            server.stream_posterior("never-created")
        with pytest.raises(RuntimeError, match="404"):
            server._request("GET", "/nonsense")
        # a failed request must not take the server down
        assert server.health()["status"] == "ok"

    def test_warm_endpoint(self, server):
        out = server.warm((N, K), iters=ITERS)
        assert f"{N}x{K}" in out["warmed"]
        # a warmed shape must not pay a fresh cold compile (generous
        # bound: same-shape fits already ran in this module, so both
        # calls here are warm — guard against regression to recompiles)
        again = server.warm((N, K), iters=ITERS)
        assert again["warmed"][f"{N}x{K}"] <= out["warmed"][f"{N}x{K}"] + 5.0
        # batch warm additionally compiles the /fit_many program
        b = server.warm((N, 64), iters=2, batch=2)
        assert f"2x{N}x64" in b["warmed"]


class TestMeshServer:
    """`--mesh N`: the resident server owns a host slice and dispatches
    the trial-sharded solver family (sharded-vs-local numerics are
    pinned in test_sharded; this binds the HTTP layer to that path)."""

    @pytest.fixture(scope="class")
    def mesh_server(self):
        client, proc = _start_server("--mesh", "4", force_devices=8)
        yield client
        _stop_server(client, proc)

    def test_sharded_fit_and_stream(self, mesh_server, sim):
        assert mesh_server.health()["mesh_devices"] == 4
        state = mesh_server.fit(sim["psc"], sim["stim_matrix"],
                                demix=False, **FIT_OPTS)
        # opt-out runs the local solver in the same process; posterior
        # agreement pins the sharded dispatch to the local one
        local = mesh_server.fit(sim["psc"], sim["stim_matrix"],
                                demix=False, sharded=False, **FIT_OPTS)
        np.testing.assert_allclose(state["mu"], local["mu"],
                                   rtol=1e-3, atol=1e-4)
        r = mesh_server.stream_update(
            "mesh-stream", sim["psc"][:128], sim["stim_matrix"][:, :128],
            iters=2, demix=False, create={"analytic_mc": True})
        assert r["trial_count"] == 128
        mesh_server.stream_delete("mesh-stream")

    def test_sharded_on_unmeshed_server_is_400(self, server, sim):
        with pytest.raises(RuntimeError, match="400.*no mesh"):
            server.fit(sim["psc"], sim["stim_matrix"], demix=False,
                       sharded=True, **FIT_OPTS)

    def test_sharded_cosamp_is_400_not_silent(self, mesh_server, sim):
        with pytest.raises(RuntimeError, match="400.*cosamp"):
            mesh_server.fit(sim["psc"], sim["stim_matrix"], demix=False,
                            method="cosamp", sharded=True)


class TestClosedLoopDesign:
    """Full closed-loop protocol over HTTP: the rig asks the server for
    the next design, acquires, streams the block back, repeat until the
    policy resolves every neuron (design.AdaptiveDesigner semantics)."""

    POWERS = [45.0, 55.0, 65.0]

    def test_design_acquire_update_until_resolved(self, server):
        import circuitmap_tpu as cm
        from circuitmap_tpu.utils.metrics import r2_score

        N2, H, blk = 20, 4, 192
        np.random.seed(11)
        pilot = cm.simulate(N=N2, trials=8, H=H, connection_prob=0.15,
                            verbose=False)
        truth = {k: pilot[k]
                 for k in ("weights", "phi_0", "phi_1", "tau_r", "tau_d")}
        name = "closed-loop"
        d = server.stream_design(
            name, trials=blk,
            designer={"N": N2, "H": H, "powers": self.POWERS,
                      "null_trials": 6, "conn_trials": 10})
        assert d["stim"].shape == (N2, blk)
        assert not bool(d["resolved"]) and d["pool"].size == N2
        create = {"analytic_mc": True, "powers": self.POWERS,
                  "num_mc_samples": 20}
        rounds = 0
        while not bool(d["resolved"]) and rounds < 5:
            stim = d["stim"]
            psc = cm.simulate(  # fixed ground-truth circuit, new trials
                N=N2, stim_matrix=stim, weights=truth["weights"],
                phi_0=truth["phi_0"], phi_1=truth["phi_1"],
                kernel=(truth["tau_r"], truth["tau_d"]),
                powers=self.POWERS, verbose=False)["psc"]
            server.stream_update(name, psc, stim, iters=6, demix=False,
                                 **({"create": create} if rounds == 0
                                    else {}))
            d = server.stream_design(name, trials=blk)
            rounds += 1
        assert bool(d["resolved"]), f"unresolved after {rounds} rounds"
        assert "stim" not in d  # complete: no further design
        res = server.stream_result(name)
        assert r2_score(truth["weights"], res["mu"]) > 0.7
        # designer spec only applies to the first call
        with pytest.raises(RuntimeError, match="400.*already has"):
            server.stream_design(name, trials=blk,
                                 designer={"N": N2, "H": H,
                                           "powers": self.POWERS})
        server.stream_delete(name)
        # delete drops the designer too: a fresh design needs a spec
        with pytest.raises(RuntimeError, match="400.*first design"):
            server.stream_design(name, trials=blk)

    def test_designer_validation(self, server, sim):
        with pytest.raises(RuntimeError, match="400.*designer needs"):
            server.stream_design("dv", trials=8, designer={"N": 4})
        with pytest.raises(RuntimeError, match="400.*unknown designer"):
            server.stream_design("dv", trials=8,
                                 designer={"N": 4, "H": 2,
                                           "powers": [55.0], "bogus": 1})
        # designer N must match an existing stream's N
        server.stream_update("dv", sim["psc"][:128],
                             sim["stim_matrix"][:, :128], iters=1,
                             demix=False, create={"analytic_mc": True})
        with pytest.raises(RuntimeError, match="400.*runs N="):
            server.stream_design("dv", trials=8,
                                 designer={"N": 4, "H": 2,
                                           "powers": [55.0]})
        server.stream_delete("dv")


class TestAuthToken:
    def test_bearer_token_required_and_honoured(self):
        from circuitmap_tpu.serve import FitClient

        client, proc = _start_server("--token", "s3cret")
        try:
            with pytest.raises(RuntimeError, match="401"):
                client.health()  # no token
            bad = FitClient(client.base_url, token="wrong")
            with pytest.raises(RuntimeError, match="401"):
                bad.health()
            good = FitClient(client.base_url, token="s3cret")
            assert good.health()["status"] == "ok"
        finally:
            _stop_server(FitClient(client.base_url, token="s3cret"), proc)


class TestMetricsLog:
    def test_request_log_lines(self, sim, tmp_path):
        mfile = tmp_path / "requests.jsonl"
        client, proc = _start_server("--metrics", str(mfile))
        try:
            client.health()
            with pytest.raises(RuntimeError, match="404"):
                client._request("GET", "/nope")
            client.fit(sim["psc"][:128], sim["stim_matrix"][:, :128],
                       demix=False, iters=2, num_mc_samples=20,
                       verbose=False)
        finally:
            _stop_server(client, proc)
        lines = [json.loads(l) for l in mfile.read_text().splitlines()]
        by_path = {(l["path"], l["status"]): l for l in lines}
        assert ("/health", 200) in by_path
        assert ("/nope", 404) in by_path
        fit = by_path[("/fit", 200)]
        assert fit["seconds"] > 0 and fit["bytes_in"] > 0
        assert fit["bytes_out"] > 0


class TestRunMainAgainstServer:
    def test_fit_cli_dispatches_to_server(self, server, sim, tmp_path):
        """`python -m circuitmap_tpu fit --server URL` runs the standard
        workflow (load .mat/.npz → demix+fit → export) on a rig box
        that owns no accelerator: the fit happens in the resident
        server, the outputs land locally."""
        import yaml

        np.savez(tmp_path / "expt.npz", psc=sim["psc"],
                 stimulus_matrix=sim["stim_matrix"])
        cfg = tmp_path / "cfg.yaml"
        # no demixer key: with --server the server's resident demixer
        # applies, the config only supplies fit knobs
        cfg.write_text(yaml.safe_dump({"msrmp": 0.3}))
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable, "-m", "circuitmap_tpu", "fit",
             "--data", str(tmp_path / "expt.npz"),
             "--config", str(cfg), "--out", str(tmp_path),
             "--iters", "5", "--server", server.base_url],
            capture_output=True, text=True, cwd=REPO, env=env,
            timeout=420)
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "server-side" in proc.stdout
        out = np.load(tmp_path / "expt_cmap.npz")
        assert out["weights"].shape == (N,)
        assert out["spikes"].shape == (N, K)


class TestStreamPersistence:
    """A daemon restart must not lose a live closed-loop experiment:
    save/load endpoints + auto-save on graceful shutdown."""

    def test_save_restart_load_continue(self, sim, tmp_path):
        state_dir = str(tmp_path / "streams")
        create = {"analytic_mc": True, "num_mc_samples": 20,
                  "powers": [45.0, 55.0, 65.0]}
        half = K // 2
        client, proc = _start_server("--state-dir", state_dir)
        try:
            client.stream_update("rigA", sim["psc"][:half],
                                 sim["stim_matrix"][:, :half], iters=3,
                                 demix=False, create=create)
            # attach a design policy: its evidence state must survive
            # the restart alongside the stream
            client.stream_design("rigA", trials=8,
                                 designer={"N": N, "H": 4,
                                           "powers": create["powers"]})
            saved = client.stream_save("rigA")
            assert saved["trial_count"] == half
            assert saved["designer"] is True
            before = client.stream_posterior("rigA")
            # also park a second stream WITHOUT an explicit save —
            # graceful shutdown must checkpoint it
            client.stream_update("rigB", sim["psc"][:128],
                                 sim["stim_matrix"][:, :128], iters=1,
                                 demix=False, create=create)
        finally:
            _stop_server(client, proc)

        client, proc = _start_server("--state-dir", state_dir)
        try:
            assert client.health()["streams"] == {}
            loaded = client.stream_load("rigA", create=create)
            assert loaded["trial_count"] == half
            assert loaded["designer"] is True
            after = client.stream_posterior("rigA")
            np.testing.assert_array_equal(before["mu"], after["mu"])
            # the restored designer answers without a fresh spec
            assert client.stream_design("rigA", trials=8)[
                "stim"].shape == (N, 8)
            # the restored stream keeps ingesting
            r = client.stream_update("rigA", sim["psc"][half:],
                                     sim["stim_matrix"][:, half:],
                                     iters=3, demix=False)
            assert r["trial_count"] == K
            # the auto-saved stream restores too
            assert client.stream_load("rigB", create=create)[
                "trial_count"] == 128
            # loading over a live stream is refused
            with pytest.raises(RuntimeError, match="400.*already live"):
                client.stream_load("rigA", create=create)
        finally:
            _stop_server(client, proc)

    def test_sigterm_autosaves_streams(self, sim, tmp_path):
        """Supervisors stop daemons with SIGTERM — the auto-save must
        fire on it, not only on POST /shutdown."""
        import signal

        state_dir = str(tmp_path / "sigterm_streams")
        client, proc = _start_server("--state-dir", state_dir)
        try:
            client.stream_update("live", sim["psc"][:128],
                                 sim["stim_matrix"][:, :128], iters=1,
                                 demix=False,
                                 create={"analytic_mc": True})
            proc.send_signal(signal.SIGTERM)
            proc.wait(timeout=60)
            assert os.path.exists(os.path.join(state_dir, "live.npz"))
        finally:
            if proc.poll() is None:
                proc.kill()

    def test_persistence_needs_state_dir(self, server, sim):
        server.stream_update("nosave", sim["psc"][:128],
                             sim["stim_matrix"][:, :128], iters=1,
                             demix=False, create={"analytic_mc": True})
        with pytest.raises(RuntimeError, match="400.*state-dir"):
            server.stream_save("nosave")
        server.stream_delete("nosave")


class TestServiceUnit:
    """HTTP-free FitService checks (in-process, CPU backend)."""

    def test_bad_npz_and_options(self):
        from circuitmap_tpu.serve import FitService, _BadRequest

        svc = FitService()
        with pytest.raises(_BadRequest, match="readable .npz"):
            svc.do_fit(b"not an npz", None)
        with pytest.raises(_BadRequest, match="valid JSON"):
            svc.do_fit(b"", "{nope")
        with pytest.raises(_BadRequest, match="demix"):
            buf = __import__("io").BytesIO()
            np.savez(buf, psc=np.zeros((4, 9)), stim=np.zeros((2, 4)))
            svc.do_fit(buf.getvalue(), json.dumps({"demix": True}))

    def test_wire_token_validation(self):
        from circuitmap_tpu.serve import FitService, _BadRequest

        svc = FitService()
        assert svc._wire_token({"trace_wire": "int8"}) is np.int8
        assert svc._wire_token({"trace_wire": "f32"}) is None
        assert svc._wire_token({}) is None
        with pytest.raises(_BadRequest, match="trace wire"):
            svc._wire_token({"trace_wire": "int2"})

    def test_failed_first_design_call_is_retryable(self):
        from circuitmap_tpu.serve import FitService, _BadRequest

        svc = FitService()
        spec = {"N": 6, "H": 2, "powers": [55.0]}
        with pytest.raises(_BadRequest, match="trials"):
            svc.do_stream_design("d", json.dumps({"designer": spec}))
        assert "d" not in svc.designers  # name not burned
        ctype, payload = svc.do_stream_design(
            "d", json.dumps({"designer": spec, "trials": 8}))
        assert ctype == "application/npz"
        assert "d" in svc.designers

    def test_stale_designer_sidecar_removed_on_save(self, tmp_path):
        """A name reused WITHOUT a designer must not resurrect the
        previous experiment's design policy on reload."""
        import os

        from circuitmap_tpu.serve import FitService, _npz_bytes

        svc = FitService(state_dir=str(tmp_path))
        rng = np.random.default_rng(0)
        psc = np.abs(rng.normal(size=(130, 900))).astype(np.float32)
        stim = np.zeros((6, 130))
        stim[rng.integers(0, 6, 130), np.arange(130)] = 55.0
        body = _npz_bytes(psc=psc, stim=stim)
        upd = json.dumps({"iters": 1, "demix": False,
                          "create": {"analytic_mc": True}})
        svc.do_stream_update("s", body, upd)
        svc.do_stream_design("s", json.dumps(
            {"designer": {"N": 6, "H": 2, "powers": [55.0]}, "trials": 8}))
        svc.do_stream_save("s")
        dpath = svc._designer_path("s")
        assert os.path.exists(dpath)
        svc.do_stream_delete("s")
        svc.do_stream_update("s", body, upd)  # reincarnated, no designer
        svc.do_stream_save("s")
        assert not os.path.exists(dpath)
        # and a reload attaches no designer
        svc.do_stream_delete("s")
        svc.do_stream_load("s", None)
        assert "s" not in svc.designers

    def test_sparse_stim_wire_is_exact_and_small(self, sim):
        """The client-side hologram encoding reconstructs the design
        BIT-exactly (it is lossless by construction) at a fraction of
        the dense bytes; dense/near-dense matrices fall back."""
        from circuitmap_tpu.serve import (_decode_arrays, _load_npz,
                                          _npz_bytes, encode_stim_sparse)

        stim = sim["stim_matrix"]
        enc = encode_stim_sparse(stim)
        assert enc is not None
        body = _npz_bytes(**enc)
        assert len(body) < stim.nbytes / 4
        out = _decode_arrays(_load_npz(body))
        assert np.array_equal(out["stim"], stim)
        assert out["stim"].dtype == stim.dtype
        # non-f32-representable values survive exactly (f64 parity path)
        odd = stim.copy()
        odd[odd != 0] = 45.000000001
        dec = _decode_arrays(_load_npz(_npz_bytes(**encode_stim_sparse(
            odd))))["stim"]
        assert np.array_equal(dec, odd)
        # dense matrices are not worth encoding
        assert encode_stim_sparse(np.random.RandomState(0)
                                  .randn(40, 40)) is None

    def test_sparse_stim_wire_validation(self):
        from circuitmap_tpu.serve import (_BadRequest, _decode_arrays,
                                          _load_npz, _npz_bytes,
                                          encode_stim_sparse)

        stim = np.zeros((6, 20))
        stim[2, ::2] = 55.0
        enc = encode_stim_sparse(stim)
        both = _npz_bytes(stim=stim, **enc)
        with pytest.raises(_BadRequest, match="both dense and sparse"):
            _decode_arrays(_load_npz(both))
        missing = {k: v for k, v in enc.items()
                   if k != "stim_sparse_levels"}
        with pytest.raises(_BadRequest, match="missing key"):
            _decode_arrays(_load_npz(_npz_bytes(**missing)))
        bad = dict(enc)
        bad["stim_sparse_n"] = np.int32(2)  # target 2 is out of range
        with pytest.raises(_BadRequest, match="out of range"):
            _decode_arrays(_load_npz(_npz_bytes(**bad)))
        bad = dict(enc)
        bad["stim_sparse_codes"] = enc["stim_sparse_codes"] + 7
        with pytest.raises(_BadRequest, match="out of range"):
            _decode_arrays(_load_npz(_npz_bytes(**bad)))
        # negative codes would wrap-index the level table (review fix)
        bad = dict(enc)
        bad["stim_sparse_codes"] = (
            enc["stim_sparse_codes"].astype(np.int16) - 1)
        with pytest.raises(_BadRequest, match="out of range"):
            _decode_arrays(_load_npz(_npz_bytes(**bad)))
        # a tiny body must not allocate an arbitrary dense matrix
        bad = dict(enc)
        bad["stim_sparse_n"] = np.int64(2**31)
        with pytest.raises(_BadRequest, match="32766"):
            _decode_arrays(_load_npz(_npz_bytes(**bad)))
        # crafted scales: NaN / negative are client errors, not NaN fits
        from circuitmap_tpu.serve import encode_psc_int8

        enc8 = encode_psc_int8(np.ones((3, 8), np.float32))
        for val in (np.nan, -1.0):
            bad8 = dict(enc8)
            bad8["psc_q8_scale"] = np.full(3, val, np.float32)
            with pytest.raises(_BadRequest, match="finite and positive"):
                _decode_arrays(_load_npz(_npz_bytes(**bad8)))

    def test_psc_int8_wire_requantises_identically(self):
        """Server-side dequantise → device-side int8 requantise is the
        identity (per-row max code is exactly 127), so the HTTP int8
        wire composes with the device int8 wire at no extra error."""
        from circuitmap_tpu.serve import (_decode_arrays, _load_npz,
                                          _npz_bytes, encode_psc_int8)

        rng = np.random.RandomState(1)
        psc = (rng.randn(16, 300) * rng.rand(16, 1) * 9).astype(
            np.float32)
        psc[3] = 0.0  # all-zero trace must survive
        enc = encode_psc_int8(psc)
        dec = _decode_arrays(_load_npz(_npz_bytes(**enc)))["psc"]
        re_enc = encode_psc_int8(dec)
        assert np.array_equal(enc["psc_q8"], re_enc["psc_q8"])
        np.testing.assert_allclose(enc["psc_q8_scale"],
                                   re_enc["psc_q8_scale"])
        assert np.array_equal(dec[3], psc[3])
        peak = np.abs(psc).max(axis=1, keepdims=True)
        assert np.abs(dec - psc).max() <= (peak / 127.0).max() * 0.5 + 1e-7
        with pytest.raises(ValueError, match="non-finite"):
            encode_psc_int8(np.array([[1.0, np.nan]]))

    def test_psc_int4_wire_matches_device_unpack(self):
        """The HTTP int4 wire uses the ONE pack (utils/quant) and its
        host unpack mirrors the device unpack bit-for-bit; dequantise →
        re-encode is the identity (composition with the device int4
        wire adds no error)."""
        import jax.numpy as jnp

        from circuitmap_tpu.demix.demixer import _unpack_int4_codes
        from circuitmap_tpu.serve import (_decode_arrays, _load_npz,
                                          _npz_bytes, encode_psc_int4)
        from circuitmap_tpu.utils.quant import unpack_int4_codes

        rng = np.random.RandomState(4)
        psc = (rng.randn(12, 301) * rng.rand(12, 1) * 5)  # odd T
        enc = encode_psc_int4(psc)
        assert enc["psc_q4"].shape == (12, 151)  # two codes per byte
        dec = _decode_arrays(_load_npz(_npz_bytes(**enc)))["psc"]
        assert dec.shape == psc.shape
        re_enc = encode_psc_int4(dec)
        assert np.array_equal(enc["psc_q4"], re_enc["psc_q4"])
        host = unpack_int4_codes(enc["psc_q4"], 301)
        dev = np.asarray(_unpack_int4_codes(jnp.asarray(enc["psc_q4"]),
                                            301))
        assert np.array_equal(host, dev)
        # batched [B, K, T] round-trips through the lead-dims key
        p3 = rng.randn(2, 6, 64).astype(np.float32)
        e3 = {"pscs" + k[len("psc"):]: v
              for k, v in encode_psc_int4(p3).items()}
        d3 = _decode_arrays(_load_npz(_npz_bytes(**e3)))["pscs"]
        assert d3.shape == p3.shape
        # malformed lead dims are a client error
        from circuitmap_tpu.serve import _BadRequest

        bad = dict(enc)
        bad["psc_q4_lead"] = np.asarray([5], np.int64)
        with pytest.raises(_BadRequest, match="packed rows"):
            _decode_arrays(_load_npz(_npz_bytes(**bad)))

    def test_psc_int4d2_wire_decodes_to_packed_container(self):
        """psc_wire='int4d2' pools 2x before quantising (the QAT
        train-time transform) and the server keeps the wire form: a
        2-D psc body decodes to PackedInt4Traces, whose dense
        reconstruction equals demixer.wire_transform(decimate=2)."""
        from circuitmap_tpu.demix.demixer import wire_transform
        from circuitmap_tpu.serve import (_BadRequest, _decode_arrays,
                                          _load_npz, _npz_bytes,
                                          _encode_psc)
        from circuitmap_tpu.utils.quant import PackedInt4Traces

        rng = np.random.RandomState(5)
        psc = rng.randn(10, 301) * rng.rand(10, 1) * 4  # odd T
        enc = _encode_psc(psc, "int4d2")
        assert int(enc["psc_q4_dec"]) == 2
        assert enc["psc_q4"].shape == (10, 76)  # ceil(ceil(301/2)/2)
        dec = _decode_arrays(_load_npz(_npz_bytes(**enc)))["psc"]
        assert isinstance(dec, PackedInt4Traces)
        assert dec.decimate == 2 and dec.shape == (10, 301)
        np.testing.assert_array_equal(
            dec.dense(), wire_transform(psc, bits=4, decimate=2))
        # the plain int4 wire also arrives packed now
        d1 = _decode_arrays(_load_npz(_npz_bytes(
            **_encode_psc(psc, "int4"))))["psc"]
        assert isinstance(d1, PackedInt4Traces) and d1.decimate == 1
        # a bad dec token is a client error
        bad = dict(enc)
        bad["psc_q4_dec"] = np.int64(3)
        with pytest.raises(_BadRequest, match="dec"):
            _decode_arrays(_load_npz(_npz_bytes(**bad)))

    def test_fit_int4_body_passthrough_equals_recode(self, sim):
        """An int4/int4d2 psc body reaches the solver in wire form (no
        host decode→re-encode): the fit is bit-identical to feeding
        the dense reconstruction through the equivalent path."""
        import circuitmap_tpu as cm
        from circuitmap_tpu.serve import (FitService, _encode_psc,
                                          _load_npz, _npz_bytes)
        from circuitmap_tpu.utils.quant import PackedInt4Traces

        from circuitmap_tpu.serve import _decode_arrays

        svc = FitService()
        psc = sim["psc"][:64]
        stim = sim["stim_matrix"][:, :64]
        opts = dict(FIT_OPTS, iters=2, demix=False)
        for wire, local_wire in (("int4", "int4"), ("int4d2", None)):
            enc = _encode_psc(psc, wire)
            _, out = svc.do_fit(_npz_bytes(stim=stim, **enc),
                                json.dumps(opts))
            got = _load_npz(out)
            cont = _decode_arrays(_load_npz(_npz_bytes(**enc)))["psc"]
            assert isinstance(cont, PackedInt4Traces)
            model = cm.Model(N)
            lo = dict(FIT_OPTS, iters=2)
            if local_wire:
                lo["trace_wire"] = local_wire
            model.fit(cont.dense(), stim, fit_options=lo)
            assert np.array_equal(got["mu"], model.state["mu"]), wire

    def test_demix_fit_int4d2_body_equals_local_wire_chain(self, sim):
        """demix=True over an int4d2 body: the packed codes feed the
        demixer's int4d2 device wire directly; the result equals the
        local demixer(transfer_dtype='int4d2') → fit chain on the raw
        traces (same codes end to end)."""
        import circuitmap_tpu as cm
        from circuitmap_tpu.demix import NeuralDemixer
        from circuitmap_tpu.serve import (FitService, _encode_psc,
                                          _load_npz, _npz_bytes)

        ckpt = os.path.join(REPO, "demixers",
                            "nwd_ie_ChroME2f_int4d2qat.npz")
        svc = FitService(demixer_path=ckpt)
        psc = sim["psc"][:64]
        stim = sim["stim_matrix"][:, :64]
        _, out = svc.do_fit(
            _npz_bytes(stim=stim, **_encode_psc(psc, "int4d2")),
            json.dumps(dict(FIT_OPTS, iters=2, demix=True)))
        got = _load_npz(out)
        dem = NeuralDemixer(path=ckpt)
        obs = dem(psc, verbose=False, transfer_dtype="int4d2")
        model = cm.Model(N)
        model.fit(obs, stim, fit_options=dict(FIT_OPTS, iters=2))
        assert np.array_equal(got["mu"], model.state["mu"])

    def test_fit_sparse_body_equals_dense_body(self, sim):
        """POST /fit with the sparse-hologram body is bit-identical to
        the dense body (service-level; the HTTP layer adds nothing)."""
        from circuitmap_tpu.serve import FitService, _load_npz, _npz_bytes
        from circuitmap_tpu.serve import encode_stim_sparse

        svc = FitService()
        opts = json.dumps(dict(FIT_OPTS, iters=2, demix=False))
        psc = sim["psc"][:64]
        stim = sim["stim_matrix"][:, :64]
        _, dense = svc.do_fit(_npz_bytes(psc=psc, stim=stim), opts)
        _, sparse = svc.do_fit(
            _npz_bytes(psc=psc, **encode_stim_sparse(stim)), opts)
        a, b = _load_npz(dense), _load_npz(sparse)
        assert set(a) == set(b)
        for key in set(a) - {"fit_time_s"}:  # wall-clock differs
            assert np.array_equal(a[key], b[key]), key

    def test_fit_many_int4_body_passthrough_equals_dense(self, sim):
        """/fit_many int4d2 pscs bodies stay in wire form end to end
        (PackedInt4Traces with batch lead dims -> caviar_many's one
        flattened device unpack): results are bit-identical to posting
        the dense reconstruction."""
        from circuitmap_tpu.serve import (FitService, _decode_arrays,
                                          _encode_psc, _load_npz,
                                          _npz_bytes)
        from circuitmap_tpu.utils.quant import PackedInt4Traces

        svc = FitService()
        B, k = 2, 64
        pscs = np.stack([sim["psc"][:k], sim["psc"][k:2 * k]])
        stims = np.stack([sim["stim_matrix"][:, :k],
                          sim["stim_matrix"][:, k:2 * k]])
        opts = json.dumps({"iters": 2, "seeds": [1, 2],
                           "num_mc_samples": 20})
        enc = {"pscs" + key[len("psc"):]: val
               for key, val in _encode_psc(pscs, "int4d2").items()}
        cont = _decode_arrays(_load_npz(_npz_bytes(**enc)))["pscs"]
        assert isinstance(cont, PackedInt4Traces)
        assert cont.shape == pscs.shape and cont.decimate == 2
        _, a = svc.do_fit_many(_npz_bytes(stims=stims, **enc), opts)
        _, b = svc.do_fit_many(
            _npz_bytes(stims=stims, pscs=cont.dense()), opts)
        da, db = _load_npz(a), _load_npz(b)
        assert set(da) == set(db)
        for key in da:
            assert np.array_equal(da[key], db[key]), key

    def test_fit_many_sparse_body_equals_dense(self, sim):
        """The batched sparse-stims wire ([N, B*K] hologram matrix +
        experiment count) reconstructs exactly: /fit_many results are
        bit-identical to the dense-shipped body."""
        from circuitmap_tpu.serve import (FitService, _load_npz,
                                          _npz_bytes, encode_stim_sparse)

        svc = FitService()
        B, n, k = 2, N, 64
        pscs = np.stack([sim["psc"][:k], sim["psc"][k:2 * k]])
        stims = np.stack([sim["stim_matrix"][:, :k],
                          sim["stim_matrix"][:, k:2 * k]])
        opts = json.dumps({"iters": 2, "seeds": [1, 2],
                           "num_mc_samples": 20})
        _, dense = svc.do_fit_many(_npz_bytes(pscs=pscs, stims=stims),
                                   opts)
        flat = stims.transpose(1, 0, 2).reshape(n, -1)
        sp = {key.replace("stim_", "stims_", 1): v
              for key, v in encode_stim_sparse(flat).items()}
        sp["stims_sparse_b"] = np.int32(B)
        _, sparse = svc.do_fit_many(_npz_bytes(pscs=pscs, **sp), opts)
        a, b = _load_npz(dense), _load_npz(sparse)
        assert set(a) == set(b)
        for key in a:
            assert np.array_equal(a[key], b[key]), key
        # validation: mismatched experiment count is a client error
        from circuitmap_tpu.serve import _BadRequest

        bad = dict(sp)
        bad["stims_sparse_b"] = np.int32(3)  # 128 columns % 3 != 0
        with pytest.raises(_BadRequest, match="does not divide"):
            svc.do_fit_many(_npz_bytes(pscs=pscs, **bad), opts)
        with pytest.raises(_BadRequest, match="experiments"):
            svc.do_fit_many(
                _npz_bytes(pscs=pscs[:1], stims=stims), opts)

    def test_fit_many_demix_batch_equals_local_chain(self, sim):
        """demix=True on /fit_many (one demixer call over the
        flattened [B*K, T] block) equals demixing per-batch locally
        and calling caviar_many on the result."""
        import jax.numpy as jnp

        from circuitmap_tpu.demix import NeuralDemixer
        from circuitmap_tpu.model import default_priors
        from circuitmap_tpu.serve import FitService, _load_npz, _npz_bytes
        from circuitmap_tpu.solvers import caviar_many

        B, k = 2, 64
        pscs = np.stack([sim["psc"][:k], sim["psc"][k:2 * k]])
        stims = np.stack([sim["stim_matrix"][:, :k],
                          sim["stim_matrix"][:, k:2 * k]])
        svc = FitService(demixer_path="default")
        opts = dict(iters=2, seeds=[1, 2], num_mc_samples=10,
                    trace_wire="int8")
        _, out = svc.do_fit_many(_npz_bytes(pscs=pscs, stims=stims),
                                 json.dumps(opts))
        assert svc.n_demixes == 1  # one flattened call, not B
        flat = NeuralDemixer(seed=0)(
            pscs.reshape(B * k, -1), verbose=False, keep_on_device=True,
            transfer_dtype=np.int8)
        obs = jnp.reshape(flat, (B, k, flat.shape[-1]))
        pri = default_priors(N)
        opts.pop("trace_wire")
        res = caviar_many(obs, stims, pri["mu"], pri["beta"],
                          pri["shape"], pri["rate"], pri["phi"],
                          pri["phi_cov"], verbose=False, **opts)
        np.testing.assert_allclose(
            _load_npz(out)["mu"],
            np.stack([np.asarray(r["mu"]) for r in res]),
            rtol=1e-5, atol=1e-6)

    def test_fit_many_method_dispatch(self, sim):
        """/fit_many method= routes to sns_many / mbcs_many; results
        equal the library calls; unknown or foreign-knob combinations
        are client errors."""
        from circuitmap_tpu.model import default_priors
        from circuitmap_tpu.serve import (FitService, _BadRequest,
                                          _load_npz, _npz_bytes)
        from circuitmap_tpu.solvers import mbcs_many, sns_many

        svc = FitService()
        B, k = 2, 64
        pscs = np.stack([sim["psc"][:k], sim["psc"][k:2 * k]])
        stims = np.stack([sim["stim_matrix"][:, :k],
                          sim["stim_matrix"][:, k:2 * k]])
        body = _npz_bytes(pscs=pscs, stims=stims)
        pri = default_priors(N)

        _, out = svc.do_fit_many(body, json.dumps(
            {"method": "cavi_sns", "iters": 3, "seeds": [1, 2],
             "num_mc_samples": 10, "analytic_mc": True}))
        ref = sns_many(pscs, stims, pri["mu"], pri["beta"], pri["alpha"],
                       pri["shape"], pri["rate"], pri["phi"],
                       pri["phi_cov"], iters=3, seeds=[1, 2],
                       num_mc_samples=10, analytic_mc=True, verbose=False)
        got = _load_npz(out)
        assert "alpha" in got
        np.testing.assert_allclose(
            got["mu"], np.stack([r["mu"] for r in ref]),
            rtol=1e-5, atol=1e-6)

        _, out = svc.do_fit_many(body, json.dumps(
            {"method": "mbcs", "iters": 3, "seeds": [1, 2],
             "analytic_noise": True}))
        ref = mbcs_many(pscs, stims, pri["mu"], pri["beta"], pri["shape"],
                        pri["rate"], iters=3, seeds=[1, 2],
                        analytic_noise=True, verbose=False)
        got = _load_npz(out)
        assert "receptive_fields" in got
        np.testing.assert_allclose(
            got["mu"], np.stack([r["mu"] for r in ref]),
            rtol=1e-5, atol=1e-6)

        with pytest.raises(_BadRequest, match="unknown fit_many method"):
            svc.do_fit_many(body, json.dumps({"method": "cosamp"}))
        with pytest.raises(_BadRequest, match="rejected the request"):
            # msrmp is a caviar knob: foreign to mbcs_many -> 400
            svc.do_fit_many(body, json.dumps(
                {"method": "mbcs", "iters": 2, "msrmp": 0.3}))
        # ragged + non-caviar methods run per-experiment sequential
        # fits (round-4 session 10; used to 400 as "caviar-only")
        _, out2 = svc.do_fit_many(_npz_bytes(
            psc=sim["psc"][:128], stim=sim["stim_matrix"][:, :128],
            k_trues=np.asarray([64, 64], np.int32)),
            json.dumps({"method": "mbcs", "iters": 2,
                        "analytic_noise": True}))
        got2 = _load_npz(out2)
        assert got2["mu"].shape == (2, N)
        assert np.isfinite(got2["mu"]).all()

    def test_fit_many_ragged_matches_library(self, sim):
        """A ragged /fit_many body (concatenated single-experiment
        wire + k_trues) equals the library's ragged caviar_many; lam/z
        return zero-padded to the shared K with k_trues echoed."""
        from circuitmap_tpu.model import default_priors
        from circuitmap_tpu.serve import (FitService, _load_npz,
                                          _npz_bytes, encode_stim_sparse)
        from circuitmap_tpu.solvers import caviar_many

        svc = FitService()
        ks = [64, 96]
        pscs = [sim["psc"][:64], sim["psc"][64:160]]
        stims = [sim["stim_matrix"][:, :64], sim["stim_matrix"][:, 64:160]]
        opts = dict(iters=3, seeds=[1, 2], num_mc_samples=20)
        body = _npz_bytes(
            psc=np.concatenate(pscs, axis=0),
            k_trues=np.asarray(ks, np.int32),
            **encode_stim_sparse(np.concatenate(stims, axis=1)))
        _, out = svc.do_fit_many(body, json.dumps(opts))
        got = _load_npz(out)
        np.testing.assert_array_equal(got["k_trues"], ks)
        pri = default_priors(N)
        ref = caviar_many(pscs, stims, pri["mu"], pri["beta"],
                          pri["shape"], pri["rate"], pri["phi"],
                          pri["phi_cov"], verbose=False, **opts)
        k_pad = 128  # max(ks)=96 -> one 128 bucket
        assert got["lam"].shape == (2, N, k_pad)
        for b in range(2):
            np.testing.assert_allclose(got["mu"][b], ref[b]["mu"],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(got["lam"][b][:, :ks[b]],
                                       ref[b]["lam"], rtol=1e-5,
                                       atol=1e-5)
            assert np.abs(got["lam"][b][:, ks[b]:]).max() == 0.0

    def test_fit_many_ragged_int4_passthrough(self, sim):
        """Ragged int4 bodies pad at the WIRE level and keep the device
        pass-through: bit-identical to posting the dense
        reconstruction."""
        from circuitmap_tpu.serve import (FitService, _decode_arrays,
                                          _encode_psc, _load_npz,
                                          _npz_bytes)
        from circuitmap_tpu.utils.quant import PackedInt4Traces

        svc = FitService()
        ks = np.asarray([64, 96], np.int32)
        cat = np.concatenate([sim["psc"][:64], sim["psc"][64:160]], 0)
        stim_flat = sim["stim_matrix"][:, :160]
        opts = json.dumps({"iters": 2, "seeds": [1, 2],
                           "num_mc_samples": 20})
        enc = _encode_psc(cat, "int4")
        cont = _decode_arrays(_load_npz(_npz_bytes(**enc)))["psc"]
        assert isinstance(cont, PackedInt4Traces)
        _, a = svc.do_fit_many(
            _npz_bytes(k_trues=ks, stim=stim_flat, **enc), opts)
        _, b = svc.do_fit_many(
            _npz_bytes(k_trues=ks, stim=stim_flat, psc=cont.dense()),
            opts)
        da, db = _load_npz(a), _load_npz(b)
        assert set(da) == set(db)
        for key in da:
            assert np.array_equal(da[key], db[key]), key

    def test_fit_many_ragged_with_demix(self, sim):
        """Ragged bodies + server-side demixing: one flattened demixer
        call over the padded stack; zero padding rows demix harmlessly
        (their charge is masked by k_true anyway)."""
        from circuitmap_tpu.serve import (FitService, _load_npz,
                                          _npz_bytes)

        svc = FitService(demixer_path="default")
        ks = np.asarray([64, 96], np.int32)
        body = _npz_bytes(
            psc=np.concatenate([sim["psc"][:64], sim["psc"][64:160]], 0),
            stim=sim["stim_matrix"][:, :160], k_trues=ks)
        _, out = svc.do_fit_many(body, json.dumps(
            {"iters": 2, "seeds": [1, 2], "num_mc_samples": 10,
             "demix": True, "trace_wire": "int8"}))
        got = _load_npz(out)
        assert svc.n_demixes == 1  # one flattened call over the stack
        assert got["mu"].shape == (2, N)
        assert np.isfinite(got["mu"]).all()

    def test_fit_many_ragged_sns_matches_library(self, sim):
        """Ragged /fit_many with method='cavi_sns' splits the flat body
        and runs per-experiment true-shape sequential fits — equal to
        the library's ragged sns_many, trial fields padded + k_trues
        echoed."""
        from circuitmap_tpu.model import default_priors
        from circuitmap_tpu.serve import (FitService, _load_npz,
                                          _npz_bytes, encode_stim_sparse)
        from circuitmap_tpu.solvers import sns_many

        svc = FitService()
        ks = [64, 96]
        pscs = [sim["psc"][:64], sim["psc"][64:160]]
        stims = [sim["stim_matrix"][:, :64], sim["stim_matrix"][:, 64:160]]
        opts = dict(iters=3, seeds=[1, 2], num_mc_samples=20,
                    analytic_mc=True)
        body = _npz_bytes(
            psc=np.concatenate(pscs, axis=0),
            k_trues=np.asarray(ks, np.int32),
            **encode_stim_sparse(np.concatenate(stims, axis=1)))
        _, out = svc.do_fit_many(
            body, json.dumps(dict(opts, method="cavi_sns")))
        got = _load_npz(out)
        np.testing.assert_array_equal(got["k_trues"], ks)
        pri = default_priors(N)
        ref = sns_many(pscs, stims, pri["mu"], pri["beta"], pri["alpha"],
                       pri["shape"], pri["rate"], pri["phi"],
                       pri["phi_cov"], verbose=False, **opts)
        assert got["lam"].shape == (2, N, 128)
        for b in range(2):
            np.testing.assert_allclose(got["mu"][b], ref[b]["mu"],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(got["lam"][b][:, :ks[b]],
                                       ref[b]["lam"], rtol=1e-5,
                                       atol=1e-5)
            assert np.abs(got["lam"][b][:, ks[b]:]).max() == 0.0

    def test_fit_many_ragged_validation(self, sim):
        from circuitmap_tpu.serve import (FitService, _BadRequest,
                                          _npz_bytes)

        svc = FitService()
        cat = sim["psc"][:160]
        stim_flat = sim["stim_matrix"][:, :160]
        opts = json.dumps({"iters": 2})
        with pytest.raises(_BadRequest, match="positive integer"):
            svc.do_fit_many(_npz_bytes(
                psc=cat, stim=stim_flat,
                k_trues=np.asarray([64.0, 96.0])), opts)
        with pytest.raises(_BadRequest, match="sum"):
            svc.do_fit_many(_npz_bytes(
                psc=cat, stim=stim_flat,
                k_trues=np.asarray([64, 64], np.int32)), opts)
        with pytest.raises(_BadRequest, match="ragged fit_many"):
            svc.do_fit_many(_npz_bytes(
                psc=cat, k_trues=np.asarray([64, 96], np.int32)), opts)

    def test_fit_many_ragged_pad_amplification_rejected(self):
        """One giant + many tiny k_trues pads EVERY experiment to the
        giant's width server-side: a few-MB wire body must not drive a
        multi-TB allocation (the sparse-stim decode's named cap applies
        to the padded stack too)."""
        from circuitmap_tpu.serve import (FitService, _BadRequest,
                                          _npz_bytes)

        svc = FitService()
        ks = np.asarray([128001] + [1] * 4999, np.int64)
        sum_k = int(ks.sum())
        body = _npz_bytes(
            psc=np.zeros((sum_k, 4), np.float64),
            stim=np.zeros((2, sum_k), np.float64),
            k_trues=ks.astype(np.int32))
        with pytest.raises(_BadRequest, match="would pad"):
            svc.do_fit_many(body, json.dumps({"iters": 2}))

    def test_client_ragged_fit_many_loopback(self, sim):
        """FitClient.fit_many with ragged lists returns a LIST of
        per-experiment dicts at true widths, through a real HTTP
        loopback."""
        import threading
        from http.server import HTTPServer

        from circuitmap_tpu.serve import (FitClient, FitService,
                                          _make_handler)

        svc = FitService()
        box = [None]
        httpd = HTTPServer(("127.0.0.1", 0), _make_handler(svc, box))
        box[0] = httpd
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            cli = FitClient(
                f"http://127.0.0.1:{httpd.server_address[1]}")
            ks = [64, 96]
            pscs = [sim["psc"][:64], sim["psc"][64:160]]
            stims = [sim["stim_matrix"][:, :64],
                     sim["stim_matrix"][:, 64:160]]
            res = cli.fit_many(pscs, stims, psc_wire="int4",
                               iters=3, seeds=[1, 2], num_mc_samples=20)
            assert isinstance(res, list) and len(res) == 2
            for b in range(2):
                assert res[b]["lam"].shape == (N, ks[b])
                assert res[b]["z"].shape == (ks[b],)
                assert res[b]["mu"].shape == (N,)
            with pytest.raises(ValueError, match="matching list"):
                cli.fit_many(pscs, np.stack(
                    [s[:, :64] for s in stims]), iters=2)
            with pytest.raises(ValueError, match="stim carries"):
                cli.fit_many(pscs, [stims[0], stims[0]], iters=2)
            # a LIST input whose trial counts happen to COINCIDE must
            # still return a list (review fix: it used to silently flip
            # to the stacked-dict return the day two folds recorded the
            # same K) — and an array input keeps the stacked dict
            pscs_eq = [sim["psc"][:64], sim["psc"][64:128]]
            stims_eq = [sim["stim_matrix"][:, :64],
                        sim["stim_matrix"][:, 64:128]]
            res_eq = cli.fit_many(pscs_eq, stims_eq, iters=2,
                                  seeds=[1, 2], num_mc_samples=10)
            assert isinstance(res_eq, list) and len(res_eq) == 2
            assert res_eq[0]["lam"].shape == (N, 64)
            assert res_eq[0]["mu"].shape == (N,)
            res_arr = cli.fit_many(np.stack(pscs_eq), np.stack(stims_eq),
                                   iters=2, seeds=[1, 2],
                                   num_mc_samples=10)
            assert isinstance(res_arr, dict)
            assert res_arr["lam"].shape == (2, N, 64)
        finally:
            httpd.shutdown()
            httpd.server_close()

    def test_nonfinite_wire_bodies_are_400(self, sim):
        """NaN/inf smuggled in a dense wire body must 400 with the
        repair options named, not fit to silently-NaN posteriors on
        the daemon (round-5 adversarial-fixture item)."""
        from circuitmap_tpu.serve import (FitService, _BadRequest,
                                          _npz_bytes)

        svc = FitService()
        psc = np.array(sim["psc"][:64])
        psc[3, 10] = np.nan
        stim = np.array(sim["stim_matrix"][:, :64])
        with pytest.raises(_BadRequest, match="non-finite"):
            svc.do_fit(_npz_bytes(psc=psc, stim=stim),
                       json.dumps({"iters": 2}))
        bad_stim = np.array(sim["stim_matrix"][:, :64])
        bad_stim[0, 0] = np.inf
        with pytest.raises(_BadRequest, match="non-finite"):
            svc.do_fit(_npz_bytes(psc=np.array(sim["psc"][:64]),
                                  stim=bad_stim),
                       json.dumps({"iters": 2}))
        with pytest.raises(_BadRequest, match="non-finite"):
            svc.do_fit_many(
                _npz_bytes(pscs=np.stack([psc] * 2),
                           stims=np.stack([stim] * 2)),
                json.dumps({"iters": 2}))
        with pytest.raises(_BadRequest, match="non-finite"):
            svc.do_fit_many(
                _npz_bytes(psc=psc, stim=stim,
                           k_trues=np.asarray([32, 32], np.int32)),
                json.dumps({"iters": 2}))

    def test_ragged_wire_meta_retry_on_old_server(self, sim, monkeypatch):
        """New-client→OLD-server skew: a pre-capability server rejects
        'wire_meta' as an unknown option; the client must resend
        without it (the 400 means the fit never ran, so the replay is
        safe) and fall back to legacy lam/z slicing — not hard-fail
        every ragged batch (review finding)."""
        import threading
        from http.server import HTTPServer

        import circuitmap_tpu.serve as srv

        monkeypatch.setattr(
            srv, "_FIT_MANY_OPTION_KEYS",
            frozenset(srv._FIT_MANY_OPTION_KEYS - {"wire_meta"}))
        svc = srv.FitService()
        box = [None]
        httpd = HTTPServer(("127.0.0.1", 0), srv._make_handler(svc, box))
        box[0] = httpd
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            cli = srv.FitClient(
                f"http://127.0.0.1:{httpd.server_address[1]}")
            ks = [64, 96]
            res = cli.fit_many(
                [sim["psc"][:64], sim["psc"][64:160]],
                [sim["stim_matrix"][:, :64], sim["stim_matrix"][:, 64:160]],
                iters=2, seeds=[1, 2], num_mc_samples=10)
            assert isinstance(res, list) and len(res) == 2
            for b in range(2):
                assert res[b]["lam"].shape == (N, ks[b])
                assert not any(k.startswith("_") for k in res[b])
        finally:
            httpd.shutdown()
            httpd.server_close()

    def test_nonfinite_stream_and_demix_bodies_400(self, sim):
        """The NaN-body guard covers the STREAMING path (a poisoned
        posterior would be persisted by --state-dir auto-save) and
        /demix, not just the batch fits (review finding)."""
        from circuitmap_tpu.serve import (FitService, _BadRequest,
                                          _npz_bytes)

        svc = FitService(demixer_path="default")
        psc = np.array(sim["psc"][:32])
        psc[1, 3] = np.inf
        stim = np.array(sim["stim_matrix"][:, :32])
        with pytest.raises(_BadRequest, match="non-finite"):
            svc.do_stream_update("s1", _npz_bytes(psc=psc, stim=stim),
                                 json.dumps({"iters": 2}))
        assert "s1" not in svc.streams  # nothing half-created
        with pytest.raises(_BadRequest, match="non-finite"):
            svc.do_demix(_npz_bytes(psc=psc), None)
        bad_stim = stim.copy()
        bad_stim[0, 0] = np.nan
        with pytest.raises(_BadRequest, match="non-finite"):
            svc.do_stream_update(
                "s2", _npz_bytes(psc=np.array(sim["psc"][:32]),
                                 stim=bad_stim),
                json.dumps({"iters": 2}))

    def test_non_numeric_body_is_400_not_500(self, sim):
        """np.savez round-trips STRING arrays without pickle, and
        np.isfinite on them raises TypeError — which must surface as
        a 400, not escape as a daemon 500 (review finding)."""
        from circuitmap_tpu.serve import (FitService, _BadRequest,
                                          _npz_bytes)

        svc = FitService()
        stim = np.zeros((2, 2))
        with pytest.raises(_BadRequest, match="numeric"):
            svc.do_fit(_npz_bytes(psc=np.array([["a", "b"], ["c", "d"]]),
                                  stim=stim),
                       json.dumps({"iters": 2}))

    def test_sparse_levels_must_be_finite(self, sim):
        from circuitmap_tpu.serve import (FitService, _BadRequest,
                                          _npz_bytes, encode_stim_sparse)

        svc = FitService()
        enc = encode_stim_sparse(np.asarray(sim["stim_matrix"][:, :64]))
        enc["stim_sparse_levels"] = np.array(
            [np.nan] * len(enc["stim_sparse_levels"]))
        with pytest.raises(_BadRequest, match="finite"):
            svc.do_fit(_npz_bytes(psc=np.asarray(sim["psc"][:64]), **enc),
                       json.dumps({"iters": 2}))

    def test_response_wire_demix_and_fit(self, sim):
        """response_wire quantises the RESPONSE: /demix returns the
        demixed block in the request wire vocabulary (int4 = 1/16th
        the bytes) and /fit returns lam as per-row int8 peak codes —
        both decoded transparently by the client."""
        import threading
        from http.server import HTTPServer

        from circuitmap_tpu.serve import (FitClient, FitService,
                                          _make_handler)

        svc = FitService(demixer_path="default")
        box = [None]
        httpd = HTTPServer(("127.0.0.1", 0), _make_handler(svc, box))
        box[0] = httpd
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            cli = FitClient(
                f"http://127.0.0.1:{httpd.server_address[1]}")
            psc = np.asarray(sim["psc"][:64])
            plain = cli.demix(psc)
            q8 = cli.demix(psc, response_wire="int8")
            q4 = cli.demix(psc, response_wire="int4")
            f16 = cli.demix(psc, response_wire="f16")
            # dtype contract: every response wire decodes to f32
            assert f16.dtype == q8.dtype == q4.dtype == np.float32
            assert np.abs(f16 - plain).max() <= 2e-3 * np.abs(plain).max()
            assert q8.shape == plain.shape == q4.shape
            peak = np.abs(plain).max(axis=1, keepdims=True)
            assert np.abs(q8 - plain).max() <= (peak / 127).max() * 0.51
            assert np.abs(q4 - plain).max() <= (peak / 7).max() * 0.51

            stim = np.asarray(sim["stim_matrix"][:, :64])
            full = cli.fit(psc, stim, iters=3, verbose=False,
                           num_mc_samples=20, seed=2, demix=False)
            coded = cli.fit(psc, stim, iters=3, verbose=False,
                            num_mc_samples=20, seed=2, demix=False,
                            response_wire="int8")
            assert set(coded) == set(full)  # q8 keys decoded away
            row_peak = np.abs(full["lam"]).max(axis=1, keepdims=True)
            tol = np.maximum(row_peak, 1.0) / 127 * 0.51
            assert (np.abs(coded["lam"] - full["lam"]) <= tol).all()
            np.testing.assert_array_equal(coded["mu"], full["mu"])
            with pytest.raises(RuntimeError, match="response_wire"):
                cli.fit(psc, stim, iters=2, response_wire="int4",
                        demix=False)
        finally:
            httpd.shutdown()
            httpd.server_close()

    def test_fit_return_fields_trims_response(self, sim):
        """return_fields keeps only the named state fields (plus
        fit_time_s) — the response-wire lever for [N]-sized summary
        callers — with values equal to the unfiltered fit's."""
        from circuitmap_tpu.serve import FitService, _load_npz, _npz_bytes

        svc = FitService()
        body = _npz_bytes(psc=sim["psc"][:128],
                          stim=sim["stim_matrix"][:, :128])
        full_opts = dict(FIT_OPTS, iters=3)
        _, full = svc.do_fit(body, json.dumps(full_opts))
        _, trimmed = svc.do_fit(body, json.dumps(
            {**full_opts, "return_fields": ["mu", "beta"]}))
        full, trimmed = _load_npz(full), _load_npz(trimmed)
        assert set(trimmed) == {"mu", "beta", "fit_time_s"}
        np.testing.assert_array_equal(trimmed["mu"], full["mu"])
        np.testing.assert_array_equal(trimmed["beta"], full["beta"])
        assert len(_npz_bytes(**trimmed)) < len(_npz_bytes(**full)) / 10

    def test_fit_return_fields_unknown_is_400(self, sim):
        from circuitmap_tpu.serve import (FitService, _BadRequest,
                                          _npz_bytes)

        svc = FitService()
        body = _npz_bytes(psc=sim["psc"][:64],
                          stim=sim["stim_matrix"][:, :64])
        with pytest.raises(_BadRequest, match="available"):
            svc.do_fit(body, json.dumps(
                {**FIT_OPTS, "iters": 2, "return_fields": ["muu"]}))
        with pytest.raises(_BadRequest, match="list of field names"):
            svc.do_fit(body, json.dumps(
                {**FIT_OPTS, "iters": 2, "return_fields": 7}))

    def test_fit_many_return_fields(self, sim):
        from circuitmap_tpu.serve import FitService, _load_npz, _npz_bytes

        svc = FitService()
        pscs = np.stack([sim["psc"][:64]] * 2)
        stims = np.stack([sim["stim_matrix"][:, :64]] * 2)
        _, out = svc.do_fit_many(
            _npz_bytes(pscs=pscs, stims=stims),
            json.dumps({"iters": 2, "seeds": [1, 2],
                        "num_mc_samples": 10,
                        "return_fields": ["mu"]}))
        got = _load_npz(out)
        assert set(got) == {"mu"}
        assert got["mu"].shape == (2, N)

    def test_ragged_metadata_gated_on_wire_meta(self, sim):
        """A ragged response carries the _k_fields/_shape_fields
        metadata arrays ONLY when the client advertises the capability
        (wire_meta) — a pre-metadata FitClient iterates every response
        key per experiment, so unconditional emission crashed it
        (IndexError at B >= 3)."""
        from circuitmap_tpu.serve import FitService, _load_npz, _npz_bytes

        svc = FitService()
        ks = np.asarray([64, 96], np.int32)
        body = _npz_bytes(
            psc=np.concatenate([sim["psc"][:64], sim["psc"][64:160]], 0),
            stim=sim["stim_matrix"][:, :160], k_trues=ks)
        opts = dict(iters=2, seeds=[1, 2], num_mc_samples=10)
        _, legacy = svc.do_fit_many(body, json.dumps(opts))
        legacy = _load_npz(legacy)
        assert not any(k.startswith("_") for k in legacy)
        # the legacy-protocol keys all stack [B, ...]: the old client's
        # val[b] iteration works for every one of them
        assert all(v.shape[0] == 2 for k, v in legacy.items()
                   if k != "k_trues")
        _, meta = svc.do_fit_many(body, json.dumps(
            {**opts, "wire_meta": 1}))
        meta = _load_npz(meta)
        assert "_k_fields" in meta and "_shape_fields" in meta
        assert {"lam", "z"} <= {str(k) for k in meta["_k_fields"]}

    def test_ragged_shape_fields_restore_true_shapes(self, sim):
        """Non-trial padded fields (mbcs receptive_fields [N, P_b]
        over different per-experiment level tables) come back at TRUE
        shape through the metadata-aware client — the library ragged
        *_many contract, closing the advisor's padded-response gap."""
        import threading
        from http.server import HTTPServer

        from circuitmap_tpu.serve import (FitClient, FitService,
                                          _make_handler)

        svc = FitService()
        box = [None]
        httpd = HTTPServer(("127.0.0.1", 0), _make_handler(svc, box))
        box[0] = httpd
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            cli = FitClient(
                f"http://127.0.0.1:{httpd.server_address[1]}")
            ks = [64, 96]
            pscs = [sim["psc"][:64], sim["psc"][64:160]]
            s0 = sim["stim_matrix"][:, :64]
            # experiment 1 collapses one power level -> its level table
            # (and receptive_fields last dim) is one entry shorter
            s1 = sim["stim_matrix"][:, 64:160].copy()
            s1[s1 == 65.0] = 55.0
            p0 = len(np.unique(s0[s0 > 0]))
            p1 = len(np.unique(s1[s1 > 0]))
            assert p0 != p1
            res = cli.fit_many(pscs, [s0, s1], method="mbcs", iters=2,
                               num_mc_samples_noise_model=10)
            assert res[0]["receptive_fields"].shape[-1] == p0 + 1
            assert res[1]["receptive_fields"].shape[-1] == p1 + 1
            for b in range(2):
                assert res[b]["lam"].shape == (N, ks[b])
        finally:
            httpd.shutdown()
            httpd.server_close()

    def test_profile_endpoint_captures_a_trace(self, sim, tmp_path):
        """POST /profile start -> fit -> stop writes an xplane trace of
        the live request; double-start and stop-without-start are 400s."""
        from circuitmap_tpu.serve import (FitService, _BadRequest,
                                          _npz_bytes)

        svc = FitService()
        d = str(tmp_path / "trace")
        _, out = svc.do_profile(json.dumps({"action": "start", "dir": d}))
        assert json.loads(out)["profiling"] is True
        with pytest.raises(_BadRequest, match="already active"):
            svc.do_profile(json.dumps({"action": "start"}))
        svc.do_fit(
            _npz_bytes(psc=sim["psc"][:64],
                       stim=sim["stim_matrix"][:, :64]),
            json.dumps({"iters": 2, "num_mc_samples": 10}))
        _, out = svc.do_profile(json.dumps({"action": "stop"}))
        payload = json.loads(out)
        assert payload["profiling"] is False and payload["dir"] == d
        import glob

        assert glob.glob(os.path.join(d, "**", "*.xplane.pb"),
                         recursive=True), "no xplane trace written"
        with pytest.raises(_BadRequest, match="no active profile"):
            svc.do_profile(json.dumps({"action": "stop"}))
        with pytest.raises(_BadRequest, match="action"):
            svc.do_profile(json.dumps({"action": "bogus"}))

    def test_profile_dir_is_confined(self, monkeypatch, tmp_path):
        """A client-named profile dir is a SERVER filesystem path: only
        locations under the temp dir (or --state-dir) are accepted —
        a wire request must not write at an arbitrary server path
        (the _stream_path policy, review fix)."""
        import jax

        from circuitmap_tpu.serve import FitService, _BadRequest

        svc = FitService()
        with pytest.raises(_BadRequest, match="temp dir"):
            svc.do_profile(json.dumps(
                {"action": "start", "dir": "/etc/cron.d/x"}))
        # ../ traversal out of the temp dir is caught by realpath
        import tempfile

        escape = os.path.join(tempfile.gettempdir(), "..", "etc", "x")
        with pytest.raises(_BadRequest, match="temp dir"):
            svc.do_profile(json.dumps({"action": "start", "dir": escape}))
        # a dir under --state-dir is allowed
        svc2 = FitService(state_dir=str(tmp_path / "state"))
        seen = {}
        monkeypatch.setattr(jax.profiler, "start_trace",
                            lambda d, *a, **k: seen.setdefault("d", d))
        monkeypatch.setattr(jax.profiler, "stop_trace", lambda: None)
        d = str(tmp_path / "state" / "prof")
        _, out = svc2.do_profile(json.dumps({"action": "start", "dir": d}))
        assert json.loads(out)["dir"] == d and seen["d"] == d
        svc2.do_profile(json.dumps({"action": "stop"}))

    def test_profile_start_failure_surfaces_root_cause(self, monkeypatch,
                                                       tmp_path):
        """A start_trace failure that is NOT a stale live session must
        surface its own message — the self-heal's stop_trace would
        mask it with 'no trace running' (review fix) — and must not
        call stop_trace at all."""
        import jax

        from circuitmap_tpu.serve import FitService, _BadRequest

        svc = FitService()

        def bad_start(d, *a, **k):
            raise RuntimeError("profiler plugin unavailable")

        def never(*a, **k):
            raise AssertionError("stop_trace must not run")

        monkeypatch.setattr(jax.profiler, "start_trace", bad_start)
        monkeypatch.setattr(jax.profiler, "stop_trace", never)
        with pytest.raises(_BadRequest, match="plugin unavailable"):
            svc.do_profile(json.dumps(
                {"action": "start", "dir": str(tmp_path / "t")}))
        assert svc._profile_dir is None

    def test_fit_many_ragged_pad_cap_floors_stim_dtype(self):
        """The ragged pad cap bounds the f32 fit/output allocations, so
        a narrow (int8) stim body must hit the cap at the same k_trues
        as an f32 one (review fix: itemsize=1 used to undercut it 4x)."""
        from circuitmap_tpu.serve import (FitService, _BadRequest,
                                          _npz_bytes)

        svc = FitService()
        # chosen so the STIM term is the binding one: psc f32 term is
        # 2000*128128*4 B ~ 1 GB (under the cap); the f32-floored stim
        # term is 2000*20*128128*4 B ~ 20 GB (over), while the raw
        # int8 itemsize would read it as ~5 GB and let it through
        ks = np.asarray([128001] + [1] * 1999, np.int64)
        sum_k = int(ks.sum())
        body = _npz_bytes(
            psc=np.zeros((sum_k, 1), np.float32),
            stim=np.zeros((20, sum_k), np.int8),
            k_trues=ks.astype(np.int32))
        with pytest.raises(_BadRequest, match="would pad"):
            svc.do_fit_many(body, json.dumps({"iters": 2}))

    def test_profile_stop_failure_never_wedges(self, monkeypatch,
                                               tmp_path):
        """A failed stop_trace is a 500 (not a 400) and must not wedge
        /profile: the service flag clears, and a later start self-heals
        a still-live jax profiler session (review fix: the flag used to
        clear BEFORE stop_trace, so a stop failure left no API path to
        recovery short of a daemon restart)."""
        import jax

        from circuitmap_tpu.serve import FitService

        svc = FitService()
        monkeypatch.setattr(jax.profiler, "start_trace",
                            lambda d, *a, **k: None)
        svc.do_profile(json.dumps(
            {"action": "start", "dir": str(tmp_path / "a")}))

        def boom():
            raise RuntimeError("finalise failed")

        monkeypatch.setattr(jax.profiler, "stop_trace", boom)
        with pytest.raises(RuntimeError, match="may be incomplete"):
            svc.do_profile(json.dumps({"action": "stop"}))
        assert svc._profile_dir is None  # service no longer wedged

        # jax's global session survived the failed stop: the next
        # start must close it and retry instead of 400ing forever
        state = {"live": True}

        def start2(d, *a, **k):
            if state["live"]:
                raise RuntimeError("profiler already started")

        def stop2():
            state["live"] = False

        monkeypatch.setattr(jax.profiler, "start_trace", start2)
        monkeypatch.setattr(jax.profiler, "stop_trace", stop2)
        _, out = svc.do_profile(json.dumps(
            {"action": "start", "dir": str(tmp_path / "b")}))
        assert json.loads(out)["profiling"] is True
        assert not state["live"]  # the stale session was closed

    def test_decode_fuzz_never_escapes_bad_request(self):
        """Arbitrary structurally-plausible bodies must surface as
        _BadRequest (HTTP 400), never an unhandled exception class that
        the handler would map to 500 — the decoders see untrusted rig
        input first."""
        from circuitmap_tpu.serve import (_BadRequest, _decode_arrays,
                                          _load_npz, _npz_bytes)

        rng = np.random.RandomState(7)
        wire_keys = ["stim_sparse_targets", "stim_sparse_codes",
                     "stim_sparse_levels", "stim_sparse_n",
                     "stims_sparse_targets", "stims_sparse_codes",
                     "stims_sparse_levels", "stims_sparse_n",
                     "stims_sparse_b", "psc_q8", "psc_q8_scale",
                     "psc_q4", "psc_q4_scale", "psc_q4_t", "psc_q4_lead",
                     "psc_q4_dec", "psc", "stim"]
        dtypes = [np.int8, np.uint8, np.int16, np.int64, np.float32,
                  np.float64]
        for trial in range(60):
            n_keys = rng.randint(1, 6)
            arrays = {}
            for key in rng.choice(wire_keys, n_keys, replace=False):
                shape = tuple(rng.randint(0, 5)
                              for _ in range(rng.randint(0, 3)))
                dt = dtypes[rng.randint(len(dtypes))]
                arrays[key] = (rng.randint(-9, 9, size=shape) *
                               rng.randn()).astype(dt)
            try:
                from circuitmap_tpu.utils.quant import PackedInt4Traces

                out = _decode_arrays(_load_npz(_npz_bytes(**arrays)))
                for v in out.values():  # dense or the packed container
                    assert isinstance(v, (np.ndarray, PackedInt4Traces))
            except _BadRequest:
                pass  # the intended failure mode
            except Exception as exc:  # pragma: no cover
                raise AssertionError(
                    f"fuzz trial {trial} escaped with "
                    f"{type(exc).__name__}: {exc} (keys: {sorted(arrays)})")

    def test_resolve_transfer_dtype(self):
        """One vocabulary across serve / warm-cache / run_main — incl.
        'f32', which once crashed warm-cache deep in the demixer."""
        from circuitmap_tpu.demix.demixer import resolve_transfer_dtype

        assert resolve_transfer_dtype(None) is None
        assert resolve_transfer_dtype("f32") is None
        assert resolve_transfer_dtype("float32") is None
        assert resolve_transfer_dtype("f16") is np.float16
        assert resolve_transfer_dtype("int8") is np.int8
        assert resolve_transfer_dtype("int4") == "int4"
        assert resolve_transfer_dtype("int4d2") == "int4d2"
        assert resolve_transfer_dtype(np.int8) is np.int8  # passthrough
        with pytest.raises(ValueError, match="trace wire"):
            resolve_transfer_dtype("int2")


class _FakeSvc:
    """Minimal stand-in for FitService in watchdog unit tests."""

    def __init__(self):
        self.inflight = None
        self.state_dir = None
        self.streams = {}
        self.metrics_fh = None
        self.saved = 0

    def save_all_streams(self):
        self.saved += 1
        return {}


class TestOperations:
    """Liveness sidecar + wedge watchdog (--status-port /
    --request-timeout-s): the dead-device-tunnel failure mode."""

    def test_status_sidecar_busy_idle_and_404(self):
        import urllib.error
        import urllib.request

        from circuitmap_tpu.serve import FitService, start_status_server

        svc = FitService()
        httpd = start_status_server(svc, port=0)
        try:
            port = httpd.server_address[1]

            def get(path):
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}{path}", timeout=10) as r:
                    return json.loads(r.read())

            h = get("/health")
            assert h["status"] == "ok" and h["busy"] is False
            assert "inflight" not in h
            # /status is an alias; inflight surfaces method/path/elapsed
            svc.inflight = ("POST", "/fit", time.monotonic() - 3)
            h = get("/status")
            assert h["busy"] is True
            assert h["inflight"]["method"] == "POST"
            assert h["inflight"]["path"] == "/fit"
            assert h["inflight"]["seconds"] >= 3
            with pytest.raises(urllib.error.HTTPError) as ei:
                get("/fit")  # sidecar is read-only: no other routes
            assert ei.value.code == 404
        finally:
            httpd.shutdown()
            httpd.server_close()

    def test_handler_sets_and_clears_inflight(self):
        import threading
        import urllib.request
        from http.server import HTTPServer

        from circuitmap_tpu.serve import FitService, _make_handler

        svc = FitService()
        seen = []
        orig = svc.do_health

        def spy():
            seen.append(svc.inflight)
            return orig()

        svc.do_health = spy
        box = [None]
        httpd = HTTPServer(("127.0.0.1", 0), _make_handler(svc, box))
        box[0] = httpd
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            port = httpd.server_address[1]
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=10) as r:
                json.loads(r.read())
            assert len(seen) == 1 and seen[0] is not None
            method, path, t0 = seen[0]
            assert (method, path) == ("GET", "/health")
            assert svc.inflight is None  # cleared after the response
        finally:
            httpd.shutdown()
            httpd.server_close()

    def test_watchdog_fires_only_past_timeout(self):
        from circuitmap_tpu.serve import (WATCHDOG_EXIT_CODE,
                                          start_watchdog)

        svc = _FakeSvc()
        fired = []
        stop = start_watchdog(svc, 0.5, exit_fn=fired.append)
        try:
            time.sleep(0.8)  # idle: must not fire
            assert fired == []
            svc.inflight = ("POST", "/fit", time.monotonic())
            assert fired == []  # just started: under the bound
            deadline = time.time() + 15
            while not fired and time.time() < deadline:
                time.sleep(0.05)
            assert fired == [WATCHDOG_EXIT_CODE]
        finally:
            stop.set()

    def test_watchdog_cancel(self):
        from circuitmap_tpu.serve import start_watchdog

        svc = _FakeSvc()
        fired = []
        stop = start_watchdog(svc, 0.1, exit_fn=fired.append)
        stop.set()
        svc.inflight = ("POST", "/fit", time.monotonic() - 60)
        time.sleep(0.5)
        assert fired == []

    def test_watchdog_saves_streams_before_exit(self, tmp_path):
        from circuitmap_tpu.serve import (WATCHDOG_EXIT_CODE,
                                          start_watchdog)

        svc = _FakeSvc()
        svc.state_dir = str(tmp_path)
        svc.streams = {"live": object()}
        fired = []
        stop = start_watchdog(svc, 0.1, exit_fn=fired.append, grace_s=10)
        try:
            svc.inflight = ("POST", "/stream/live/update",
                            time.monotonic() - 60)
            deadline = time.time() + 10
            while not fired and time.time() < deadline:
                time.sleep(0.05)
            assert fired == [WATCHDOG_EXIT_CODE]
            assert svc.saved == 1  # bounded best-effort checkpoint ran
        finally:
            stop.set()


class TestOperationsCLI:
    """--status-port / --request-timeout-s through the real daemon."""

    def test_status_port_works_and_watchdog_kills_wedged_daemon(self, sim):
        import urllib.request

        from circuitmap_tpu.serve import WATCHDOG_EXIT_CODE

        # 2 s bound: the first /fit's cold trace+compile far exceeds it,
        # standing in for a wedged device dispatch
        client, proc = _start_server(
            "--status-port", "0", "--request-timeout-s", "2")
        try:
            sp = getattr(proc, "status_port", None)
            assert sp, "no STATUS line before SERVING"
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{sp}/health", timeout=10) as r:
                h = json.loads(r.read())
            assert h["status"] == "ok" and h["busy"] is False
            with pytest.raises(Exception):
                client.fit(sim["psc"][:64], sim["stim_matrix"][:, :64],
                           iters=2, verbose=False)
            assert proc.wait(timeout=60) == WATCHDOG_EXIT_CODE
        finally:
            if proc.poll() is None:
                proc.kill()


class TestClientRetries:
    """FitClient connection-level retries + wait_ready: the rig-side
    half of the supervisor-restart story."""

    class _FakeResp:
        headers = {"Content-Type": "application/json"}

        def read(self):
            return b'{"ok": true}'

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def test_retries_stateless_endpoints_only(self, monkeypatch):
        import urllib.error
        import urllib.request

        from circuitmap_tpu.serve import FitClient

        calls = []

        def fake_urlopen(req, timeout=None):
            calls.append(req.selector)
            if len(calls) < 3:
                raise urllib.error.URLError(
                    ConnectionRefusedError(111, "refused"))
            return self._FakeResp()

        monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
        cli = FitClient("http://127.0.0.1:1", retries=2,
                        retry_backoff_s=0.01)
        assert cli.health() == {"ok": True}
        assert len(calls) == 3  # two refused attempts, then success

        # stream mutations are NOT replay-safe: exactly one attempt
        calls.clear()
        with pytest.raises(OSError):
            cli.stream_save("exp")
        assert len(calls) == 1

        # default client: no retries anywhere
        calls.clear()
        with pytest.raises(OSError):
            FitClient("http://127.0.0.1:1").health()
        assert len(calls) == 1

    def test_read_timeouts_never_retried(self, monkeypatch):
        """A client-side read timeout means the single-threaded server
        may still be WORKING on the original request — replaying would
        queue a duplicate fit behind it. Both the bare socket.timeout
        (read phase) and a URLError-wrapped one (connect phase) must
        raise immediately, even with retries enabled."""
        import socket
        import urllib.error
        import urllib.request

        from circuitmap_tpu.serve import FitClient

        calls = []

        def raw_timeout(req, timeout=None):
            calls.append(1)
            raise socket.timeout("timed out")

        monkeypatch.setattr(urllib.request, "urlopen", raw_timeout)
        cli = FitClient("http://127.0.0.1:1", retries=5,
                        retry_backoff_s=0.01)
        with pytest.raises(OSError):
            cli.health()
        assert len(calls) == 1

        def wrapped_timeout(req, timeout=None):
            calls.append(1)
            raise urllib.error.URLError(socket.timeout("timed out"))

        calls.clear()
        monkeypatch.setattr(urllib.request, "urlopen", wrapped_timeout)
        with pytest.raises(OSError):
            cli.health()
        assert len(calls) == 1

    def test_http_errors_never_retried(self, monkeypatch):
        import urllib.error
        import urllib.request

        from circuitmap_tpu.serve import FitClient

        calls = []

        import io

        def fake_urlopen(req, timeout=None):
            calls.append(1)
            raise urllib.error.HTTPError(
                req.full_url, 400, "Bad Request", {},
                io.BytesIO(b'{"error": "bad"}'))

        monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
        cli = FitClient("http://127.0.0.1:1", retries=5,
                        retry_backoff_s=0.01)
        with pytest.raises(RuntimeError, match="HTTP 400: bad"):
            cli.health()
        assert len(calls) == 1  # the server answered: no replay

    def test_wait_ready_rides_out_a_restart(self):
        import threading
        from http.server import HTTPServer

        from circuitmap_tpu.serve import (FitClient, FitService,
                                          _make_handler)

        svc = FitService()
        box = [None]
        httpd = HTTPServer(("127.0.0.1", 0), _make_handler(svc, box))
        box[0] = httpd
        port = httpd.server_address[1]
        cli = FitClient(f"http://127.0.0.1:{port}")
        # not serving yet: wait_ready must block, then succeed once
        # the accept loop starts 0.3 s later
        threading.Timer(0.3, lambda: threading.Thread(
            target=httpd.serve_forever, daemon=True).start()).start()
        try:
            h = cli.wait_ready(timeout_s=30, poll_s=0.1)
            assert h["status"] == "ok"
        finally:
            httpd.shutdown()
            httpd.server_close()

    def test_wait_ready_times_out(self):
        from circuitmap_tpu.serve import FitClient

        cli = FitClient("http://127.0.0.1:1", timeout=1)
        with pytest.raises(TimeoutError, match="not ready"):
            cli.wait_ready(timeout_s=0.3, poll_s=0.05)
