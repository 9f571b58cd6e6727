"""RefineGAN vocoder runtime parity vs the reference torch implementation.

The reference (`rvc/lib/algorithm/generators/refinegan.py:268`) depends on
torchaudio only for `functional.resample` (kaiser-windowed sinc); we stub
torchaudio with a faithful pure-torch implementation of that resampler
(validated against scipy's polyphase resampler below) so the oracle runs
in this torchaudio-less environment.
"""

import math
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

pytestmark = [pytest.mark.parity, pytest.mark.slow]


def _sinc_resample(waveform: torch.Tensor, orig_freq: int, new_freq: int,
                   lowpass_filter_width: int = 6, rolloff: float = 0.99,
                   resampling_method: str = "sinc_interp_hann",
                   beta: float = None) -> torch.Tensor:
    """Pure-torch torchaudio.functional.resample (polyphase windowed sinc)."""
    g = math.gcd(int(orig_freq), int(new_freq))
    orig_freq, new_freq = int(orig_freq) // g, int(new_freq) // g
    if orig_freq == new_freq:
        return waveform
    dtype = waveform.dtype
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = torch.arange(-width, width + orig_freq, dtype=torch.float64)[None, None] / orig_freq
    t = torch.arange(0, -new_freq, -1, dtype=torch.float64)[:, None, None] / new_freq + idx
    t = (t * base_freq).clamp_(-lowpass_filter_width, lowpass_filter_width)
    if resampling_method == "sinc_interp_hann":
        window = torch.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    else:  # sinc_interp_kaiser
        b = torch.tensor(float(beta), dtype=torch.float64)
        window = torch.i0(b * torch.sqrt(1 - (t / lowpass_filter_width) ** 2)) / torch.i0(b)
    tpi = t * math.pi
    kernels = torch.where(tpi == 0, torch.tensor(1.0, dtype=torch.float64),
                          tpi.sin() / tpi)
    kernels = kernels * window * (base_freq / orig_freq)

    shape = waveform.shape
    wav = waveform.reshape(-1, shape[-1])
    n, length = wav.shape
    wav = torch.nn.functional.pad(wav, (width, width + orig_freq))
    out = torch.nn.functional.conv1d(wav[:, None].to(torch.float64),
                                     kernels, stride=orig_freq)
    out = out.transpose(1, 2).reshape(n, -1)
    target_length = int(math.ceil(new_freq * length / orig_freq))
    return out[..., :target_length].reshape(
        shape[:-1] + (target_length,)).to(dtype)


def test_stub_resample_matches_scipy():
    """Sanity: the stub resampler agrees with scipy's polyphase kaiser."""
    from scipy.signal import resample_poly

    # bandlimited signal (tones below the decimated Nyquist): white noise
    # would mostly measure the two resamplers' transition-band differences
    t = np.arange(4096) / 4096.0
    x = sum(np.sin(2 * np.pi * f * 4096 / 16 * t + 0.1 * f)
            for f in (0.11, 0.37, 0.71)).astype(np.float64)
    got = _sinc_resample(torch.from_numpy(x)[None], 8, 1,
                         lowpass_filter_width=64,
                         rolloff=0.9475937167399596,
                         resampling_method="sinc_interp_kaiser",
                         beta=14.769656459379492)[0].numpy()
    ref = resample_poly(x, 1, 8, window=("kaiser", 14.769656459379492))
    n = min(len(got), len(ref))
    corr = np.corrcoef(got[8:n - 8], ref[8:n - 8])[0, 1]
    assert corr > 0.999, f"stub vs scipy corr {corr:.5f}"


@pytest.fixture(scope="module")
def pair():
    import importlib.machinery as mach

    ta = sys.modules.get("torchaudio")
    if ta is None:
        ta = types.ModuleType("torchaudio")
        ta.__spec__ = mach.ModuleSpec("torchaudio", None)
        sys.modules["torchaudio"] = ta
    if not hasattr(ta, "functional"):
        ta.functional = types.SimpleNamespace()
    ta.functional.resample = _sinc_resample
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from rvc.lib.algorithm.generators.refinegan import (
        RefineGANGenerator as TorchRefineGAN,
    )

    from rvc_tpu.models.generators_extra import RefineGANGenerator
    from rvc_tpu.utils.weights import convert_synthesizer_state_dict

    torch.manual_seed(0)
    # gin must be 256: the reference hardcodes cond's input width
    # (`refinegan.py:359`: nn.Conv1d(256, channels // 2, 1))
    tnet = TorchRefineGAN(sample_rate=32000, upsample_rates=(8, 8, 2, 2),
                          num_mels=64, gin_channels=256,
                          upsample_initial_channel=512).eval()
    net = RefineGANGenerator(sample_rate=32000, upsample_rates=(8, 8, 2, 2),
                             num_mels=64, gin_channels=256,
                             upsample_initial_channel=512)
    sd = {f"dec.{k}": v.numpy() for k, v in tnet.state_dict().items()}
    params = convert_synthesizer_state_dict(sd)["dec"]
    return tnet, net, {"params": params}


def test_refinegan_parity(pair, rng):
    tnet, net, variables = pair
    B, T = 1, 12
    mel = rng.standard_normal((B, T, 64)).astype(np.float32)
    f0 = np.full((B, T), 220.0, dtype=np.float32)
    g = rng.standard_normal((B, 1, 256)).astype(np.float32)

    # zero torch randomness (sine initial phases, source noise, AdaIN noise)
    orig_rand, orig_randn = torch.rand, torch.randn_like
    torch.rand = lambda *a, **k: torch.zeros(
        *a, **{kk: vv for kk, vv in k.items() if kk != "device"})
    torch.randn_like = lambda t, **k: torch.zeros_like(t)
    try:
        with torch.no_grad():
            ref = tnet(torch.from_numpy(mel).transpose(1, 2),
                       torch.from_numpy(f0),
                       torch.from_numpy(g).transpose(1, 2)).numpy()
    finally:
        torch.rand, torch.randn_like = orig_rand, orig_randn

    out = np.asarray(net.apply(variables, jnp.asarray(mel), jnp.asarray(f0),
                               jnp.asarray(g)))
    assert out.shape[1] == ref.shape[2], (out.shape, ref.shape)
    ours, theirs = out[0, :, 0], ref[0, 0]
    corr = np.corrcoef(ours, theirs)[0, 1]
    assert corr > 0.999, f"RefineGAN corr {corr:.5f}"
    np.testing.assert_allclose(ours, theirs, atol=5e-3)
