"""Robustness on real speech: the reference's golden 13.5 s fixture
(`/root/reference/ios_test_data/input_audio.npy`) through our pipeline
(random weights — validates numerics/stability on real audio, not
weight-level parity, which needs the pretrained checkpoints)."""

import os

import numpy as np
import pytest

FIXTURE = "/root/reference/ios_test_data/input_audio.npy"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture unavailable")
def test_reference_clip_through_pipeline():
    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config

    audio = np.load(FIXTURE).astype(np.float32)
    if audio.ndim > 1:
        audio = audio.mean(axis=-1)
    # keep CPU test fast: first 2 s only
    audio = audio[: 2 * 16000]

    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64)
    rvc = RVC(config=cfg, seed=0)
    out = rvc.infer(audio, f0_method="rmvpe", index_rate=0.0)
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1.0
    assert len(out) > len(audio)  # 32 kHz out vs 16 kHz in


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture unavailable")
def test_reference_clip_f0_plausible():
    """RMVPE-random is meaningless, but the DSP extractors should find
    speech-range f0 on the real clip."""
    from rvc_tpu.pitch import PitchExtractor

    audio = np.load(FIXTURE).astype(np.float32)
    if audio.ndim > 1:
        audio = audio.mean(axis=-1)
    f0 = PitchExtractor("harvest").extract(audio[: 5 * 16000])
    v = f0[f0 > 0]
    assert len(v) > 0.2 * len(f0)
    assert 60 < np.median(v) < 500  # speech range
