"""Frozen serving mode (RVC_TPU_FREEZE=1): weights baked into the
executable as jit constants. Must be numerically identical to the packed
dispatch path (VERDICT round-1 item 10)."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_frozen_matches_packed(monkeypatch):
    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config

    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64)
    rvc = RVC(config=cfg, seed=0)

    sr = 16000
    t = np.arange(int(2.0 * sr)) / sr
    rng = np.random.default_rng(0)
    audio = (0.4 * np.sin(2 * np.pi * 200 * t)
             + 0.01 * rng.standard_normal(len(t))).astype(np.float32)

    kw = dict(sid=0, pitch=0.0, f0_method="rmvpe", index_rate=0.0,
              protect=0.5)

    monkeypatch.delenv("RVC_TPU_FREEZE", raising=False)
    packed = rvc.infer(audio, **kw)

    monkeypatch.setenv("RVC_TPU_FREEZE", "1")
    frozen = rvc.infer(audio, **kw)

    assert frozen.shape == packed.shape
    assert np.isfinite(frozen).all()
    # identical math modulo constant-folding reassociation; f16 output
    # transfer quantization bounds the difference
    np.testing.assert_allclose(frozen, packed, atol=2e-3)
    corr = np.corrcoef(frozen, packed)[0, 1]
    assert corr > 0.9999
