"""Build (and execute) the two companion narrative notebooks —
experimental-data analysis and PSC-template calibration — mirroring the
reference's other worked examples (demo_experimental_data.ipynb,
fit_sum_of_psc_templates.ipynb). Run from the repo root:

  python examples/build_companion_notebooks.py
"""

import os

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))
md = nbf.v4.new_markdown_cell
code = nbf.v4.new_code_cell


def expt_notebook():
    nb = nbf.v4.new_notebook()
    nb.cells = [
        md("""# Analysing an experimental recording: single-target vs ensemble

This walkthrough mirrors the reference's `demo_experimental_data.ipynb`:
given a recorded experiment (`pscs [K, 900]` + `stimulus_matrix [N, K]`
from a `.mat`/`.npz`), demix, **split single-target from ensemble
trials, fit each independently, and check that the two fits agree** —
the field's strongest internal-consistency test on real data, since
single-target maps are near-unambiguous while ensemble maps carry the
compressed-sensing speedup.

The reference repo ships no experimental `.mat`, so this executed copy
synthesises an experiment with the same mixed design (900 single-target
+ 900 ten-target trials, shared ground-truth weights). Point
`load_experiment` at your own file to reproduce the real-data analysis
(`examples/demo_experimental_data.py` is the CLI version)."""),
        code("""import numpy as np
import matplotlib.pyplot as plt
import jax
try:
    jax.config.update('jax_platforms', 'cpu')
except RuntimeError:
    pass
import circuitmap_tpu as cm
from circuitmap_tpu.pipelines import split_single_ensemble, connection_waveforms
from circuitmap_tpu.utils.metrics import r2_score

np.random.seed(0)
N = 100
sim_single = cm.simulate(N=N, trials=900, H=1, connection_prob=0.08,
                         verbose=False)
sim_ens = cm.simulate(N=N, trials=900, H=10, connection_prob=0.08,
                      weights=sim_single['weights'],
                      phi_0=sim_single['phi_0'], phi_1=sim_single['phi_1'],
                      kernel=(sim_single['tau_r'], sim_single['tau_d']),
                      verbose=False)
psc = np.concatenate([sim_single['psc'], sim_ens['psc']], axis=0)
stim = np.concatenate([sim_single['stim_matrix'], sim_ens['stim_matrix']],
                      axis=1)
perm = np.random.permutation(psc.shape[0])
psc, stim = psc[perm], stim[:, perm]
true_weights = sim_single['weights']
print('experiment:', psc.shape, stim.shape)"""),
        md("""## Split the trial types and fit each

`split_single_ensemble` classifies trials by how many neurons each
hologram targets. Both fits use the experimental operating point
`msrmp=0.4` (the reference notebook's cell 15)."""),
        code("""single_locs, ensemble_locs = split_single_ensemble(stim)
print(f'{len(single_locs)} single-target, {len(ensemble_locs)} ensemble')

opts = {'iters': 50, 'msrmp': 0.4, 'verbose': False}
model_single = cm.Model(N)
model_single.fit(psc[single_locs], stim[:, single_locs],
                 method='caviar', fit_options=dict(opts))
model_ens = cm.Model(N)
model_ens.fit(psc[ensemble_locs], stim[:, ensemble_locs],
              method='caviar', fit_options=dict(opts))
print(f'fits: {model_single.time:.1f}s + {model_ens.time:.1f}s')"""),
        md("""## Do the two fits agree?

The stem plot overlays the two weight maps; R² between them is the
consistency metric of record (reference notebook cells 16-19)."""),
        code("""mu_s, mu_e = model_single.state['mu'], model_ens.state['mu']
plt.figure(figsize=(12, 2.5))
plt.stem(np.arange(N), mu_s, label='single-target')
plt.scatter(np.arange(N), mu_e, marker='x', color='r', label='ensemble',
            zorder=3)
plt.xlabel('neuron'); plt.ylabel('weight'); plt.legend()
print(f'single-vs-ensemble weight R2: {r2_score(mu_s, mu_e):.3f}')
print(f'truth R2: single {r2_score(true_weights, mu_s):.3f}, '
      f'ensemble {r2_score(true_weights, mu_e):.3f}')"""),
        md("""## Waveform cross-check

Ridge-regressing each connection's PSC waveform from its trials gives
an amplitude estimate independent of the model's weight scale; agreeing
amplitudes across the two trial types is further evidence the ensemble
fit found real synapses (reference notebook cell 19,
`run_1v10_pipeline` machinery)."""),
        code("""cnx_s, wf_s = connection_waveforms(psc[single_locs], stim[:, single_locs],
                                   model_single.state)
cnx_e, wf_e = connection_waveforms(psc[ensemble_locs], stim[:, ensemble_locs],
                                   model_ens.state)
common = np.intersect1d(cnx_s, cnx_e)
amp_s = np.max(wf_s[np.searchsorted(cnx_s, common)], axis=1)
amp_e = np.max(wf_e[np.searchsorted(cnx_e, common)], axis=1)
plt.figure(figsize=(3.5, 3.5))
plt.scatter(amp_s, amp_e, s=14)
lim = max(amp_s.max(), amp_e.max()) * 1.05
plt.plot([0, lim], [0, lim], 'k--', lw=0.5)
plt.xlabel('amplitude (single)'); plt.ylabel('amplitude (ensemble)')
print(f'{common.size} common connections, amplitude r = '
      f'{np.corrcoef(amp_s, amp_e)[0, 1]:.3f}')"""),
    ]
    return nb


def template_notebook():
    nb = nbf.v4.new_notebook()
    nb.cells = [
        md("""# Calibrating the demixer simulator from recorded PSC shapes

Mirror of the reference's `fit_sum_of_psc_templates.ipynb`: fit a sum
of bi-exponential PSC templates to each recorded trace, inspect the
population of rise/decay constants, and turn them into
`generate_training_data` parameter ranges — so a demixer trained on
simulation matches YOUR opsin/cell type.

The reference fits each trace separately with `scipy.optimize`; here
all traces are fitted simultaneously by one vmapped Adam optimisation
(`demix.template_fit`), with multi-restart peak seeding."""),
        code("""import numpy as np
import matplotlib.pyplot as plt
import jax
try:
    jax.config.update('jax_platforms', 'cpu')
except RuntimeError:
    pass
import circuitmap_tpu as cm
from circuitmap_tpu.demix.template_fit import (fit_psc_templates,
                                               suggest_datagen_ranges)

np.random.seed(0)
sim = cm.simulate(N=30, trials=200, H=3, connection_prob=0.3,
                  spont_prob=0.0, gp_scale=1e-3, verbose=False)
# calibrate on traces that actually contain events: trials whose targets
# didn't spike carry only noise, and fitting templates to noise says
# nothing about the opsin kinetics. The median trial peak IS the noise
# floor here (most trials are event-free), so gate several noise floors up.
peaks = sim['psc'].max(1)
active = np.flatnonzero(peaks > 5 * np.median(peaks))
traces = sim['psc'][active[:64]]
fit = fit_psc_templates(traces, n_kernels=10, steps=800, seed=0)
print(f'fitted {traces.shape[0]} traces, median R2 = '
      f'{np.median(fit["r2"]):.3f}')"""),
        code("""k = int(np.argmax(fit['r2']))
t_ms = np.arange(traces.shape[1]) / 20.0
plt.figure(figsize=(6, 3))
plt.plot(t_ms, traces[k], lw=1, label='trace')
plt.plot(t_ms, fit['reconstruction'][k], lw=1, label='template sum')
plt.xlabel('ms'); plt.legend(); plt.title(f'trace {k}, R2={fit["r2"][k]:.3f}')"""),
        md("""## Population statistics → simulator ranges"""),
        code("""keep = fit['amp'] > 0.1
tau_r = fit['tau_r'][keep]
tau_d = (fit['tau_r'] + fit['tau_diff'])[keep]
fig, ax = plt.subplots(1, 2, figsize=(8, 2.5))
ax[0].hist(tau_r, bins=20); ax[0].set(title='tau_rise (frames)')
ax[1].hist(tau_d, bins=20); ax[1].set(title='tau_decay (frames)')
ranges = suggest_datagen_ranges(fit)
print('suggested generate_training_data kwargs (frames @ 20 kHz):')
for kk, v in ranges.items():
    print(f'  {kk} = {v:.1f}')"""),
        md("""Feed these straight into a demixer training run:

```python
demix = cm.NeuralDemixer()
demix.generate_training_data(size=50_000, **{k: round(v) for k, v in ranges.items()})
demix.train(epochs=500)
```

(`scripts_tpu/train_demixer.py` wraps the same flow with the per-opsin
presets the reference documents.)"""),
    ]
    return nb


for name, nb in [("demo_experimental_data.ipynb", expt_notebook()),
                 ("fit_sum_of_psc_templates.ipynb", template_notebook())]:
    out = os.path.join(HERE, name)
    nbf.write(nb, out)
    print("wrote", out)
    try:
        from nbclient import NotebookClient

        cwd = os.path.dirname(HERE)
        os.chdir(cwd)
        NotebookClient(nb, timeout=2400, kernel_name="python3").execute()
        nbf.write(nb, out)
        print("executed", out)
    except ImportError:
        print("nbclient unavailable; written unexecuted")
