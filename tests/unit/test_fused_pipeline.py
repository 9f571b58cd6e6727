"""Fused single-program conversion path: must agree with the staged path."""

import numpy as np
import pytest

from rvc_tpu.api import RVC
from rvc_tpu.configs import get_config


@pytest.fixture(scope="module")
def tiny_rvc():
    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64)
    return RVC(config=cfg, seed=0)


@pytest.mark.slow
def test_fused_matches_staged(tiny_rvc, sine_wave):
    y, sr = sine_wave
    chunk = y[:14080]  # len+2*t_pad = 46080 = exactly 3 buckets
    # fused (rmvpe) vs staged (forced by giving input_f0 through get_f0 path)
    out_fused = tiny_rvc.pipeline.pipeline(
        chunk, sid=0, f0_method="rmvpe", index=None, index_rate=0.0,
        volume_envelope=1.0, protect=0.5)
    # staged path: explicitly run the same f0 extractor then voice_conversion
    p = tiny_rvc.pipeline
    from rvc_tpu.utils.audio import highpass_filter
    a = highpass_filter(chunk, 16000, 48.0, 5)  # noqa
    ap = np.pad(a, (p.t_pad, p.t_pad), mode="reflect")
    p_len = len(ap) // p.window
    pitch, pitchf = p.get_f0(ap, p_len, "rmvpe", 0.0)
    conv = p.voice_conversion(ap, pitch, pitchf, 0, None, 0.0, 0.5)
    pad_tgt = int(p.t_pad * (p.tgt_sr / 16000))
    out_staged = conv[pad_tgt:-pad_tgt]
    from rvc_tpu.utils.audio import peak_normalize
    out_staged = peak_normalize(out_staged, 0.99)

    n = min(len(out_fused), len(out_staged))
    assert n > 0
    # same weights + same f0 estimator -> near-identical output
    corr = np.corrcoef(out_fused[:n], out_staged[:n])[0, 1]
    assert corr > 0.99, f"fused/staged corr {corr:.4f}"


@pytest.mark.slow
def test_fused_with_index(tiny_rvc, sine_wave, rng):
    from rvc_tpu.retrieval import build_index

    y, _ = sine_wave
    vecs = rng.standard_normal((200, 768)).astype(np.float32)
    tiny_rvc.index = build_index(vecs, nlist=4)
    out = tiny_rvc.infer(y[:8000], f0_method="rmvpe", index_rate=0.75)
    tiny_rvc.index = None
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_fused_autotune_and_shift(tiny_rvc, sine_wave):
    y, _ = sine_wave
    out = tiny_rvc.infer(y[:8000], f0_method="rmvpe", pitch=2.0,
                         f0_autotune=True, f0_autotune_strength=1.0)
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_f16_input_matches_f32(tiny_rvc, sine_wave, monkeypatch):
    """RVC_TPU_F16_IN=1 (default; f16 audio upload) must be waveform-
    indistinguishable from uploading f32: the input is in [-1, 1] where
    f16 quantization is ~1e-4 absolute."""
    y, _ = sine_wave
    chunk = y[:14080]
    monkeypatch.setenv("RVC_TPU_F16_OUT", "0")
    monkeypatch.setenv("RVC_TPU_F16_IN", "0")
    out32 = tiny_rvc.infer(chunk, f0_method="rmvpe")
    monkeypatch.setenv("RVC_TPU_F16_IN", "1")
    out16 = tiny_rvc.infer(chunk, f0_method="rmvpe")

    # the final 2 frames are synthesized from edge-replicated features
    # (grid-coverage fix) and extrapolate, so they amplify input
    # quantization noise — score the real-feature region at the tight
    # bar and the tail at a looser one
    n = min(len(out32), len(out16))
    spf = 480  # 48 kHz, 10 ms frames
    corr = np.corrcoef(out32[: n - 2 * spf], out16[: n - 2 * spf])[0, 1]
    assert corr > 0.9999, f"f16-in/f32-in waveform corr {corr:.6f}"
    corr_full = np.corrcoef(out32[:n], out16[:n])[0, 1]
    assert corr_full > 0.999, f"full-length corr {corr_full:.6f}"


@pytest.mark.slow
def test_one_dispatch_matches_two_program(tiny_rvc, sine_wave, monkeypatch):
    """RVC_TPU_ONE_DISPATCH=1 (f0 + conversion merged into a single
    executable) must produce the same waveform as the two-program path
    up to the source-noise RNG draw (same rng key -> bit-equal graphs,
    so correlation should be ~1)."""
    y, _ = sine_wave
    chunk = y[:14080]
    monkeypatch.setenv("RVC_TPU_ONE_DISPATCH", "0")
    out_two = tiny_rvc.infer(chunk, f0_method="rmvpe")
    monkeypatch.setenv("RVC_TPU_ONE_DISPATCH", "1")
    out_one = tiny_rvc.infer(chunk, f0_method="rmvpe")

    n = min(len(out_two), len(out_one))
    assert n > 0
    corr = np.corrcoef(out_two[:n], out_one[:n])[0, 1]
    assert corr > 0.9999, f"one-dispatch/two-program corr {corr:.6f}"


@pytest.mark.slow
def test_bf16_policy_matches_f32(tiny_rvc, sine_wave, monkeypatch):
    """RVC_TPU_BF16=1 (bf16 HuBERT/enc_p/flow, f32 decoder activations)
    must be spectrally indistinguishable from the f32 path."""
    from rvc_tpu.monitoring.voice_metrics import spectrogram_correlation

    y, _ = sine_wave
    chunk = y[:14080]
    monkeypatch.setenv("RVC_TPU_F16_OUT", "0")
    monkeypatch.setenv("RVC_TPU_BF16", "0")
    out32 = tiny_rvc.infer(chunk, f0_method="rmvpe")
    monkeypatch.setenv("RVC_TPU_BF16", "1")
    out16 = tiny_rvc.infer(chunk, f0_method="rmvpe")
    monkeypatch.setenv("RVC_TPU_BF16", "0")

    n = min(len(out32), len(out16))
    corr = np.corrcoef(out32[:n], out16[:n])[0, 1]
    assert corr > 0.999, f"bf16/f32 waveform corr {corr:.6f}"
    sc = spectrogram_correlation(out32[:n], out16[:n])
    assert sc > 0.99, f"bf16/f32 spec corr {sc:.4f}"


@pytest.mark.slow
def test_bench_config_routes_through_ivf_search(tiny_rvc, sine_wave, rng,
                                                monkeypatch):
    """The driver bench's config (index present, index_rate=0.75, rmvpe,
    fused path) must actually trace `_ivf_search` into the device program
    — guards BENCH_r03's index-on number against silently benching a
    retrieval-free graph (VERDICT r2 #1)."""
    import rvc_tpu.retrieval.ivf as ivf
    from rvc_tpu.retrieval import build_index

    calls = []
    real = ivf._ivf_search

    def spy(*args, **kw):
        calls.append(1)
        return real(*args, **kw)

    monkeypatch.setattr(ivf, "_ivf_search", spy)
    y, _ = sine_wave
    vecs = rng.standard_normal((300, 768)).astype(np.float32)
    tiny_rvc.index = build_index(vecs, nlist=4)
    tiny_rvc.pipeline.refresh()  # drop programs built without the spy
    try:
        out = tiny_rvc.infer(y[:8000], f0_method="rmvpe", index_rate=0.75)
    finally:
        tiny_rvc.index = None
        tiny_rvc.pipeline.refresh()
    assert np.isfinite(out).all()
    assert calls, "index_rate=0.75 conversion never traced _ivf_search"
