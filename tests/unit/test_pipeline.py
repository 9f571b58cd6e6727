"""Offline pipeline end-to-end (random weights, tiny config): shapes,
pitch path, retrieval path, protect, RMS envelope, chunking."""

import numpy as np
import pytest

from rvc_tpu.api import RVC
from rvc_tpu.configs import get_config
from rvc_tpu.pipelines.offline import coarse_f0
from rvc_tpu.retrieval import build_index


@pytest.fixture(scope="module")
def tiny_rvc():
    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=2,
                     model_upsample_initial_channel=128)
    return RVC(config=cfg, seed=0)


def test_coarse_f0_range():
    f0 = np.array([0.0, 50.0, 220.0, 1100.0, 2000.0], dtype=np.float32)
    c = coarse_f0(f0)
    assert c.min() >= 1 and c.max() <= 255
    assert c[0] == 1       # unvoiced -> 1
    assert c[1] == 1       # f0_min -> 1
    assert c[3] == 255     # f0_max -> 255


def test_pipeline_end_to_end(tiny_rvc, sine_wave):
    y, sr = sine_wave
    out = tiny_rvc.infer(y[:8000], f0_method="pm")  # 0.5 s, DSP pitch (fast)
    assert out.ndim == 1
    expected = (8000 + 2 * 16000) // 160 * (32000 // 100) - 2 * 32000
    # output trimmed to ~0.5 s at 32 kHz
    assert abs(len(out) - 16000) < 3300
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1.0


def test_pipeline_with_index(tiny_rvc, sine_wave, rng):
    y, sr = sine_wave
    vecs = rng.standard_normal((300, 768)).astype(np.float32)
    tiny_rvc.index = build_index(vecs, nlist=4)
    out = tiny_rvc.infer(y[:8000], f0_method="pm", index_rate=0.75)
    tiny_rvc.index = None
    assert np.isfinite(out).all()


def test_pipeline_no_pitch_guidance(tiny_rvc, sine_wave):
    y, _ = sine_wave
    out = tiny_rvc.infer(y[:8000], pitch_guidance=True, f0_method="dio",
                         protect=0.2)
    assert np.isfinite(out).all()


def test_pipeline_volume_envelope(tiny_rvc, sine_wave):
    y, _ = sine_wave
    out = tiny_rvc.infer(y[:8000], f0_method="pm", volume_envelope=0.5)
    assert np.isfinite(out).all()


def test_infer_file_roundtrip(tiny_rvc, sine_wave, tmp_path):
    from rvc_tpu.utils.audio import save_wav, load_wav

    y, sr = sine_wave
    inp = str(tmp_path / "in.wav")
    outp = str(tmp_path / "out.wav")
    save_wav(inp, y[:8000], sr)
    tiny_rvc.infer_file(inp, outp, f0_method="pm")
    audio, out_sr = load_wav(outp)
    assert out_sr == 32000
    assert len(audio) > 8000


@pytest.mark.slow  # 45-70s: nightly tier
def test_source_noise_at_inference(tiny_rvc, monkeypatch):
    """The NSF source must carry noise at inference like the reference
    (`rvc_mlx/lib/mlx/generators.py:105-116`): unvoiced frames get their
    whole excitation as noise at sine_amp/3 — with rng=None they would be
    silent. RVC_TPU_SOURCE_NOISE=0 must disable it (oracle comparisons)."""
    import jax.numpy as jnp
    from rvc_tpu.models.generators import sine_source
    import jax

    f0 = jnp.zeros((1, 8))  # all unvoiced
    src_off, _ = sine_source(f0, 10, 48000)
    src_on, _ = sine_source(f0, 10, 48000, rng=jax.random.PRNGKey(1))
    assert float(jnp.abs(src_off).max()) == 0.0
    rms = float(jnp.sqrt(jnp.mean(src_on ** 2)))
    assert 0.01 < rms < 0.07  # noise at ~sine_amp/3 = 0.033

    # pipeline wiring: identical calls differ between noise on and off
    audio = (0.3 * np.random.default_rng(0).standard_normal(16000)).astype(np.float32)
    kwargs = dict(sid=0, index_rate=0.0, protect=0.5)
    monkeypatch.setenv("RVC_TPU_SOURCE_NOISE", "0")
    tiny_rvc.pipeline._fused.clear()
    out_off = np.asarray(tiny_rvc.infer(audio, **kwargs))
    monkeypatch.setenv("RVC_TPU_SOURCE_NOISE", "1")
    tiny_rvc.pipeline._fused.clear()
    out_on = np.asarray(tiny_rvc.infer(audio, **kwargs))
    tiny_rvc.pipeline._fused.clear()
    assert out_on.shape == out_off.shape
    assert not np.allclose(out_on, out_off)
