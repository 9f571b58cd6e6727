"""CREPE numerical oracle (VERDICT r2 #5).

The reference validates its CREPE port against torchcrepe on sine +
sweep signals (`/root/reference/tests/pitch/test_parity.py:69-193`).
torchcrepe isn't installed here, so the oracle is an in-test torch
reimplementation of torchcrepe's exact architecture and state-dict
layout (conv1..conv6 with manual same-padding, relu -> BatchNorm
(eps=1e-3) -> MaxPool(2,1), permute-flatten, classifier -> sigmoid —
torchcrepe `model.py`). This exercises `convert_crepe_state_dict`
against the real layout and pins activation + end-to-end f0 parity,
which the behavioral tests never did.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from rvc_tpu.models.crepe import (CREPE, CREPEModel, CENTS, FMIN_REF,
                                  decode_probabilities, frame_audio)
from rvc_tpu.utils.weights import convert_crepe_state_dict

_LAYOUTS = {
    "full": dict(in_ch=[1, 1024, 128, 128, 128, 256],
                 out_ch=[1024, 128, 128, 128, 256, 512], in_features=2048),
    "tiny": dict(in_ch=[1, 128, 16, 16, 16, 32],
                 out_ch=[128, 16, 16, 16, 32, 64], in_features=256),
}


class TorchCrepe(torch.nn.Module):
    """torchcrepe's Crepe module, reconstructed from its public source
    (same layer names, shapes, padding, and flatten order)."""

    def __init__(self, model="full"):
        super().__init__()
        lay = _LAYOUTS[model]
        self.in_features = lay["in_features"]
        kernels = [(512, 1)] + 5 * [(64, 1)]
        strides = [(4, 1)] + 5 * [(1, 1)]
        for i in range(6):
            setattr(self, f"conv{i + 1}",
                    torch.nn.Conv2d(lay["in_ch"][i], lay["out_ch"][i],
                                    kernels[i], strides[i]))
            setattr(self, f"conv{i + 1}_BN",
                    torch.nn.BatchNorm2d(lay["out_ch"][i], eps=1e-3))
        self.classifier = torch.nn.Linear(self.in_features, 360)

    def _layer(self, x, i, padding):
        x = F.pad(x, padding)
        x = getattr(self, f"conv{i}")(x)
        x = F.relu(x)
        x = getattr(self, f"conv{i}_BN")(x)
        return F.max_pool2d(x, (2, 1), (2, 1))

    def forward(self, x):
        x = x[:, None, :, None]
        x = self._layer(x, 1, (0, 0, 254, 254))
        for i in range(2, 7):
            x = self._layer(x, i, (0, 0, 31, 32))
        x = x.permute(0, 2, 1, 3).reshape(-1, self.in_features)
        return torch.sigmoid(self.classifier(x))


def _make_oracle(variant, seed=0):
    torch.manual_seed(seed)
    net = TorchCrepe(variant).eval()
    # randomize the BN running stats too, so a converter that drops or
    # misroutes them cannot pass
    g = torch.Generator().manual_seed(seed + 1)
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
    return net


def _torch_frames(audio: np.ndarray) -> np.ndarray:
    """torchcrepe-style framing: center reflect pad, 1024-window/160-hop
    unfold, per-frame mean/std normalization (independent of ours)."""
    a = torch.from_numpy(np.pad(audio, 512, mode="reflect"))
    frames = a.unfold(0, 1024, 160)
    frames = frames - frames.mean(dim=1, keepdim=True)
    frames = frames / torch.clamp(frames.std(dim=1, keepdim=True), min=1e-10)
    return frames.float()


@pytest.mark.parity
@pytest.mark.parametrize("variant", ["full", "tiny"])
def test_crepe_activation_parity(variant, rng):
    net = _make_oracle(variant)
    params, stats = convert_crepe_state_dict(
        {k: v.numpy() for k, v in net.state_dict().items()})
    model = CREPEModel(variant)
    frames = rng.standard_normal((8, 1024)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(frames)).numpy()
    out = np.asarray(model.apply({"params": params, "batch_stats": stats},
                                 jnp.asarray(frames)))
    assert out.shape == ref.shape == (8, 360)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)


@pytest.mark.parity
def test_crepe_f0_parity_sine_and_sweep():
    """End-to-end: our CREPE.get_f0 (framing + conv stack + decode +
    filters) vs an independent torch-frames -> torch-model -> numpy
    decode chain on sine + sweep. Mirrors the reference's parity recipe
    (`tests/pitch/test_parity.py:69-193`) with a fixed-seed oracle."""
    net = _make_oracle("tiny")
    params, stats = convert_crepe_state_dict(
        {k: v.numpy() for k, v in net.state_dict().items()})
    crepe = CREPE("tiny", params=params, batch_stats=stats)

    sr, dur = 16000, 0.6
    t = np.arange(int(sr * dur)) / sr
    signals = [
        0.5 * np.sin(2 * np.pi * 220.0 * t),                     # sine
        0.5 * np.sin(2 * np.pi * np.cumsum(                      # sweep
            np.linspace(110.0, 440.0, len(t))) / sr),
    ]
    for sig in signals:
        sig = sig.astype(np.float32)
        got = crepe.get_f0(sig, 50.0, 1100.0, threshold=0.0)

        frames = _torch_frames(sig)
        with torch.no_grad():
            probs = net(frames).numpy()
        # independent numpy decode: masked argmax + weighted +-4-bin
        # average in cents, then the 3-tap mean filter
        cents = CENTS
        valid = (cents >= 1200 * np.log2(50.0 / FMIN_REF)) & (
            cents <= 1200 * np.log2(1100.0 / FMIN_REF))
        p = np.where(valid[None, :], probs, 0.0)
        peak = p.argmax(axis=1)
        pp = np.pad(p, ((0, 0), (4, 4)))
        cp = np.pad(cents, (4, 4))
        idx = peak[:, None] + np.arange(9)[None, :]
        w = np.take_along_axis(pp, idx, axis=1)
        wsum = w.sum(axis=1)
        fc = np.where(wsum > 0, (w * cp[idx]).sum(axis=1) / np.maximum(wsum, 1e-12), 0.0)
        ref = FMIN_REF * 2.0 ** (fc / 1200.0)
        ref = np.convolve(np.pad(ref, 1, mode="edge"),
                          np.ones(3) / 3, mode="valid")

        n = min(len(got), len(ref))
        assert n > 30
        np.testing.assert_allclose(got[:n], ref[:n], rtol=5e-3)
