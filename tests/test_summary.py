"""summarize(): the posterior, answered as the experiment reports it."""

import numpy as np
import pytest

import circuitmap_tpu as cm
from circuitmap_tpu.summary import format_summary, summarize

N, K = 30, 300


@pytest.fixture(scope="module")
def fitted():
    np.random.seed(21)
    sim = cm.simulate(N=N, trials=K, H=4, connection_prob=0.15,
                      verbose=False)
    model = cm.Model(N)
    model.fit(sim["psc"], sim["stim_matrix"], method="caviar",
              fit_options={"iters": 15, "verbose": False, "seed": 0})
    return sim, model


class TestSummarize:
    def test_connected_calls_match_solver_pruning(self, fitted):
        sim, model = fitted
        s = summarize(model)
        # the summary's call IS the solver's (mu != 0) — same decision
        # design.AdaptiveDesigner.observe uses
        assert np.array_equal(s["connected"],
                              np.flatnonzero(model.state["mu"] != 0))
        assert s["n_neurons"] == N and s["n_trials"] == K
        # weight_sd is sqrt(beta) (posterior variance diagonal)
        np.testing.assert_allclose(
            s["weight_sd"] ** 2, model.state["beta"], rtol=1e-6)
        assert s["noise_std"] > 0
        assert 0 <= s["spont_trials"] <= K
        # recovery sanity: most true connections are in the call set
        true = np.flatnonzero(sim["weights"])
        hit = np.intersect1d(true, s["connected"]).size
        assert hit >= 0.7 * true.size

    def test_per_power_rates(self, fitted):
        sim, model = fitted
        s = summarize(model, stim=sim["stim_matrix"])
        P = s["powers"].size
        assert P >= 1 and s["spike_rate"].shape == (N, P)
        assert (s["spike_rate"] >= 0).all() and (s["spike_rate"] <= 1).all()
        # per-neuron counts add up to the design's nonzero columns
        assert s["stim_trials"].sum() == np.count_nonzero(
            sim["stim_matrix"])
        # connected neurons spike more at the max power than nulls
        conn, null = s["connected"], np.setdiff1d(np.arange(N),
                                                  s["connected"])
        if conn.size and null.size:
            assert (s["spike_rate"][conn, -1].mean()
                    > s["spike_rate"][null, -1].mean())

    def test_accepts_state_dict_and_client_style_response(self, fitted):
        _, model = fitted
        # plain dict of numpy arrays — what FitClient.fit returns
        response = {k: np.asarray(v) for k, v in model.state.items()
                    if isinstance(v, np.ndarray)}
        s = summarize(response)
        assert np.array_equal(s["connected"],
                              summarize(model)["connected"])

    def test_model_summary_prints(self, fitted, capsys):
        sim, model = fitted
        out = model.summary(stim=sim["stim_matrix"])
        text = capsys.readouterr().out
        assert f"{N} neurons" in text and "connected" in text
        assert "spike rate @" in text
        assert out["connected"].size > 0
        # quiet mode prints nothing
        model.summary(verbose=False)
        assert capsys.readouterr().out == ""

    def test_validation(self, fitted):
        sim, model = fitted
        with pytest.raises(TypeError, match="fitted Model"):
            summarize(42)
        with pytest.raises(ValueError, match="neurons x trials"):
            summarize(model, stim=sim["stim_matrix"][:, :10])
        batched = {"mu": np.zeros((2, N)), "lam": np.zeros((2, N, K))}
        with pytest.raises(ValueError, match="fit_many"):
            summarize(batched)

    def test_cosamp_point_weights_summarise(self, fitted):
        """cosamp leaves no spike posterior (model.py _fit_cosamp) —
        the summary degrades to point weights instead of refusing."""
        sim, _ = fitted
        model = cm.Model(N)
        model.fit(sim["psc"], sim["stim_matrix"], method="cosamp",
                  fit_options={"k": 5})
        s = summarize(model, stim=sim["stim_matrix"])
        assert s["n_trials"] is None
        assert "expected_spikes" not in s and "spike_rate" not in s
        # cosamp computed no posterior beyond mu — priors must not be
        # presented as uncertainty/noise estimates (review finding)
        assert "weight_sd" not in s and "noise_std" not in s
        assert s["stim_trials"].sum() == np.count_nonzero(
            sim["stim_matrix"])
        text = format_summary(s)
        assert "connected" in text and "E[spikes]" not in text
        assert "±" not in text

    def test_cavi_sns_uses_alpha_call(self, fitted):
        """CAVI-SnS is spike-and-slab: mu is nonzero almost everywhere;
        the connected call is the posterior slab probability alpha
        (review finding — mu != 0 reported ~all neurons connected)."""
        sim, _ = fitted
        model = cm.Model(N)
        model.fit(sim["psc"], sim["stim_matrix"], method="cavi_sns",
                  fit_options={"iters": 15, "verbose": False, "seed": 0})
        s = summarize(model)
        assert np.array_equal(
            s["connected"], np.flatnonzero(model.state["alpha"] > 0.5))
        # the alpha call is selective, not the near-full mu != 0 roster
        assert s["connected"].size < 0.5 * N
        true = np.flatnonzero(sim["weights"])
        assert np.intersect1d(true, s["connected"]).size >= 0.6 * true.size
        text = format_summary(s)
        assert "P(conn)" in text
        # raw-dict path needs the method hint
        resp = {k: np.asarray(v) for k, v in model.state.items()
                if isinstance(v, np.ndarray)}
        s2 = summarize(resp, method="cavi_sns")
        assert np.array_equal(s2["connected"], s["connected"])

    def test_format_summary_truncates(self, fitted):
        _, model = fitted
        s = summarize(model)
        if s["connected"].size > 1:
            text = format_summary(s, max_rows=1)
            assert "more connected" in text
