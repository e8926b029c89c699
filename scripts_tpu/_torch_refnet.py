"""Independent torch build of the reference NWD U-Net, for baseline
measurement and parity checks.

The reference ships the architecture as a pytorch-lightning module
(neural_waveform_demixing.py:204-306); lightning is not installed in
this image, so this module reconstructs the same layer graph in plain
torch (shapes from neural_waveform_demixing.py:259-269) and loads the
shipped Lightning state dicts into it. Used by
scripts_tpu/measure_reference_baseline.py; tests/test_demixer.py keeps
its own copy so the suite stays self-contained.
"""

from __future__ import annotations

import numpy as np


def build_reference_net(state_dict=None):
    """The reference NWDUNet in plain torch. eval() mode."""
    import torch
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
    if state_dict is not None:
        clean = {k: v for k, v in state_dict.items()
                 if "num_batches_tracked" not in k}
        net.load_state_dict(clean, strict=False)
    net.eval()
    return net


def reference_demix(net, traces, batch_size=4096):
    """The reference's full __call__ semantics in plain torch.

    tmax-normalise -> forward -> rescale -> host monotone-decay filter
    (neural_waveform_demixing.py:36-54, 337-348). Returns numpy [K, T].
    """
    import torch

    traces = np.asarray(traces, dtype=np.float32)
    tmax = traces.max(axis=1, keepdims=True)
    safe = np.where(tmax != 0, tmax, 1.0)
    outs = []
    with torch.no_grad():
        for k0 in range(0, traces.shape[0], batch_size):
            x = torch.from_numpy(traces[k0:k0 + batch_size] / safe[k0:k0 + batch_size])
            outs.append(net(x[:, None, :])[:, 0, :].numpy())
    out = np.concatenate(outs, axis=0) * tmax
    # running-min monotone decay from t=500 (reference :337-348; the
    # reference's first update compares t=500 against t=499, so the
    # accumulation window starts one bin early)
    filt = out.copy()
    np.minimum.accumulate(filt[:, 499:], axis=1, out=filt[:, 499:])
    return filt
