"""MRF HiFi-GAN vocoder parity vs the reference torch implementation
(converted weights, zeroed source noise/phase)."""

import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

pytestmark = [pytest.mark.parity, pytest.mark.slow]


@pytest.fixture(scope="module")
def pair():
    import importlib.machinery as mach

    ta = types.ModuleType("torchaudio")
    ta.__spec__ = mach.ModuleSpec("torchaudio", None)
    sys.modules.setdefault("torchaudio", ta)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from rvc.lib.algorithm.generators.hifigan_mrf import (
        HiFiGANMRFGenerator as TorchMRF,
    )

    from rvc_tpu.models.generators_extra import HiFiGANMRFGenerator
    from rvc_tpu.utils.weights import convert_synthesizer_state_dict

    torch.manual_seed(0)
    tnet = TorchMRF(in_channel=64, upsample_initial_channel=128,
                    upsample_rates=[10, 8, 2, 2],
                    upsample_kernel_sizes=[20, 16, 4, 4],
                    resblock_kernel_sizes=[3, 7, 11],
                    resblock_dilations=[[1, 3, 5]] * 3,
                    gin_channels=32, sample_rate=32000,
                    harmonic_num=8).eval()
    net = HiFiGANMRFGenerator(in_channel=64, upsample_initial_channel=128,
                              upsample_rates=(10, 8, 2, 2),
                              upsample_kernel_sizes=(20, 16, 4, 4),
                              resblock_kernel_sizes=(3, 7, 11),
                              resblock_dilations=((1, 3, 5),) * 3,
                              gin_channels=32, sample_rate=32000,
                              harmonic_num=8)
    sd = {f"dec.{k}": v.numpy() for k, v in tnet.state_dict().items()}
    params = convert_synthesizer_state_dict(sd)["dec"]
    return tnet, net, {"params": params}


def test_mrf_parity(pair, rng):
    tnet, net, variables = pair
    B, T = 1, 12
    x = rng.standard_normal((B, T, 64)).astype(np.float32)
    f0 = np.full((B, T), 220.0, dtype=np.float32)
    g = rng.standard_normal((B, 1, 32)).astype(np.float32)

    # zero torch's sine randomness (initial phases + noise)
    orig_rand, orig_randn = torch.rand, torch.randn_like
    torch.rand = lambda *a, **k: torch.zeros(*a, **{kk: vv for kk, vv in k.items() if kk != "device"})
    torch.randn_like = lambda t, **k: torch.zeros_like(t)
    try:
        with torch.no_grad():
            ref = tnet(torch.from_numpy(x).transpose(1, 2),
                       torch.from_numpy(f0),
                       torch.from_numpy(g).transpose(1, 2)).numpy()
    finally:
        torch.rand, torch.randn_like = orig_rand, orig_randn

    out = np.asarray(net.apply(variables, jnp.asarray(x), jnp.asarray(f0),
                               jnp.asarray(g)))
    assert out.shape[1] == ref.shape[2]
    ours = out[0, :, 0]
    theirs = ref[0, 0]
    corr = np.corrcoef(ours, theirs)[0, 1]
    assert corr > 0.999, f"MRF corr {corr:.5f}"
    np.testing.assert_allclose(ours, theirs, atol=5e-3)
