"""End-to-end numerical parity of our Synthesizer vs the reference torch
implementation (imported from /root/reference as a test oracle, with
random-initialized weights converted through our weight converter).

This is the same methodology as the reference's own MLX<->PyTorch parity
suite (`benchmarks/benchmark_components.py`): identical weights + inputs,
compare intermediate latents tightly and final audio by correlation (the
decoder injects 0.003-amplitude source noise, so exact equality is not
expected there).
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.parity

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    import importlib.machinery as _mach

    _ta = types.ModuleType("torchaudio")
    _ta.__spec__ = _mach.ModuleSpec("torchaudio", None)
    sys.modules.setdefault("torchaudio", _ta)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from rvc.lib.algorithm.synthesizers import Synthesizer as TorchSynth

    return TorchSynth


@pytest.fixture(scope="module")
def pair(ref_modules):
    """Reference torch synthesizer + our synthesizer with converted weights."""
    from rvc_tpu.configs import get_config
    from rvc_tpu.models.synthesizer import build_synthesizer
    from rvc_tpu.utils.weights import convert_synthesizer_state_dict

    torch.manual_seed(0)
    spk = 4
    tnet = ref_modules(
        1025, 36, 192, 192, 768, 2, 6, 3, 0, "1",
        [3, 7, 11], [[1, 3, 5]] * 3, [12, 10, 2, 2], 512, [24, 20, 4, 4],
        spk, 256, 48000, True, vocoder="HiFi-GAN",
    ).eval()

    cfg = get_config(48000, model_spk_embed_dim=spk)
    net = build_synthesizer(cfg)
    params = {"params": convert_synthesizer_state_dict(
        {k: v.numpy() for k, v in tnet.state_dict().items()}
    )}
    return tnet, net, params


def _ref_infer(tnet, phone, pitch, pitchf, sid, zero_noise=True):
    """Run the torch oracle's infer; optionally zero its prior noise
    (it uses noise_scale=0.66666, `rvc/lib/algorithm/synthesizers.py:228`)
    so deterministic paths can be compared exactly."""
    orig = torch.randn_like
    if zero_noise:
        torch.randn_like = lambda t, **kw: torch.zeros_like(t)
    try:
        with torch.no_grad():
            o, x_mask, (z, z_p, m_p, logs_p) = tnet.infer(
                torch.from_numpy(phone),
                torch.tensor([phone.shape[1]]),
                torch.from_numpy(pitch),
                torch.from_numpy(pitchf),
                torch.tensor(sid),
            )
    finally:
        torch.randn_like = orig
    return (o.numpy(), z.numpy(), m_p.numpy(), logs_p.numpy())


def test_infer_parity(pair, rng):
    tnet, net, params = pair
    B, T = 1, 50
    phone = rng.standard_normal((B, T, 768)).astype(np.float32)
    pitch = rng.integers(1, 255, (B, T)).astype(np.int64)
    pitchf = np.full((B, T), 220.0, dtype=np.float32)
    sid = [0]

    ref_o, ref_z, ref_m_p, ref_logs_p = _ref_infer(tnet, phone, pitch, pitchf, sid)

    # our forward, capturing the same latents
    m_p, logs_p, x_mask = net.apply(
        params, jnp.asarray(phone), jnp.asarray(pitch), jnp.array([T]),
        method=lambda s, ph, pi, l: s.enc_p(ph, pi, l),
    )
    np.testing.assert_allclose(
        np.asarray(m_p).transpose(0, 2, 1), ref_m_p, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(logs_p).transpose(0, 2, 1), ref_logs_p, rtol=1e-3, atol=2e-4)

    o, _ = net.apply(
        params, jnp.asarray(phone), jnp.array([T]), jnp.asarray(pitch),
        jnp.asarray(pitchf), jnp.array(sid), method=net.infer,
    )
    ours = np.asarray(o)[0, :, 0]
    theirs = ref_o[0, 0, :]
    assert ours.shape == theirs.shape
    # source-noise differs (random draws) -> compare by correlation
    corr = np.corrcoef(ours, theirs)[0, 1]
    assert corr > 0.99, f"waveform corr {corr:.4f}"
    np.testing.assert_allclose(ours, theirs, atol=0.05)


def test_flow_latent_parity(pair, rng):
    """z after flow-reverse must match tightly (fully deterministic path)."""
    tnet, net, params = pair
    B, T = 1, 40
    phone = rng.standard_normal((B, T, 768)).astype(np.float32)
    pitch = rng.integers(1, 255, (B, T)).astype(np.int64)
    pitchf = np.full((B, T), 150.0, dtype=np.float32)
    _, ref_z, _, _ = _ref_infer(tnet, phone, pitch, pitchf, [1])

    def jax_z(s, ph, pi, l, sid):
        g = s.emb_g(sid)[:, None, :]
        m_p, logs_p, x_mask = s.enc_p(ph, pi, l)
        z_p = m_p * x_mask
        return s.flow(z_p, x_mask, g=g, reverse=True)

    z = net.apply(params, jnp.asarray(phone), jnp.asarray(pitch), jnp.array([T]),
                  jnp.array([1]), method=jax_z)
    np.testing.assert_allclose(
        np.asarray(z).transpose(0, 2, 1), ref_z, rtol=1e-3, atol=5e-4)
