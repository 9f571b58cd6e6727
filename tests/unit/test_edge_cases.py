"""Degenerate-input robustness battery for the offline pipeline.

The reference never tests these (silence, sub-second clips, clipping,
DC offset, chunk-boundary reassembly, extreme pitch shifts); a serving
framework must not crash or emit non-finite audio on any of them.
Most cases ride the staged path with a user-supplied f0 curve so the
battery stays fast on CPU (no RMVPE compile)."""

import numpy as np
import pytest

from rvc_tpu.api import RVC
from rvc_tpu.configs import get_config

SR = 16000


@pytest.fixture(scope="module")
def rvc():
    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64)
    return RVC(config=cfg, seed=0)


def _convert(rvc, audio, **kw):
    kw.setdefault("input_f0", np.full(len(audio) // 160 + 1, 200.0,
                                      dtype=np.float32))
    kw.setdefault("index_rate", 0.0)
    return rvc.infer(np.asarray(audio, dtype=np.float32), **kw)


def _check(out, n_in, tgt_sr=32000):
    assert np.isfinite(out).all()
    assert out.dtype == np.float32
    assert np.abs(out).max() <= 1.0 + 1e-4
    # length tracks the input duration to within one feature frame
    expect = n_in * tgt_sr // SR
    assert abs(len(out) - expect) <= 2 * (tgt_sr // 100), (len(out), expect)


def test_silence_input(rvc):
    n = SR  # 1 s of digital silence
    out = _convert(rvc, np.zeros(n), input_f0=np.zeros(n // 160 + 1,
                                                       dtype=np.float32))
    _check(out, n)


def test_short_clip(rvc):
    n = 2000  # 125 ms, far below the 1 s reflect-pad context
    out = _convert(rvc, 0.5 * np.sin(2 * np.pi * 220 * np.arange(n) / SR))
    _check(out, n)


def test_subframe_clip(rvc):
    n = 400  # 25 ms -> 2 feature frames
    out = _convert(rvc, 0.5 * np.sin(2 * np.pi * 220 * np.arange(n) / SR))
    assert np.isfinite(out).all() and len(out) > 0


def test_clipped_square_with_dc(rvc):
    t = np.arange(SR) / SR
    audio = np.clip(np.sign(np.sin(2 * np.pi * 110 * t)) * 2.0 + 0.4,
                    -1.0, 1.0)
    out = _convert(rvc, audio)
    _check(out, SR)


def test_extreme_pitch_shift(rvc):
    t = np.arange(SR) / SR
    audio = 0.5 * np.sin(2 * np.pi * 220 * t)
    for shift in (-24.0, 24.0):
        out = _convert(rvc, audio, pitch=shift)
        _check(out, SR)


def test_long_audio_chunking(rvc):
    """Shrink the chunking thresholds so a 5 s clip splits, and check the
    reassembled output matches the single-pass conversion everywhere but
    the chunk boundary (`rvc/infer/pipeline.py:441-545` semantics)."""
    p = rvc.pipeline
    t = np.arange(5 * SR) / SR
    audio = (0.4 * np.sin(2 * np.pi * 180 * t)
             * (0.6 + 0.4 * np.sin(2 * np.pi * 0.7 * t))).astype(np.float32)
    f0 = np.full(len(audio) // 160 + 1, 180.0, dtype=np.float32)

    whole = rvc.infer(audio, input_f0=f0, index_rate=0.0)

    orig = (p.t_query, p.t_center, p.t_max)
    p.t_query, p.t_center, p.t_max = SR, 2 * SR, 3 * SR
    try:
        chunked = rvc.infer(audio, input_f0=f0, index_rate=0.0)
    finally:
        p.t_query, p.t_center, p.t_max = orig
    assert np.isfinite(chunked).all()
    # reassembled chunks must cover exactly the same samples
    assert len(chunked) == len(whole)

    # chunked synthesis restarts the NSF sine phase per chunk, so later
    # chunks drift in phase vs the single pass (reference behavior) and
    # bit-parity is not expected; waveform correlation still catches any
    # ordering/shift/trim bug (those drop it to ~0). The first chunk is
    # phase-aligned with the single pass, so it gets a tighter bar.
    def corr(a, b):
        return np.corrcoef(a.astype(np.float64), b.astype(np.float64))[0, 1]

    assert corr(chunked, whole) > 0.85
    assert corr(chunked[:48000], whole[:48000]) > 0.9


def test_full_index_blend(rvc, rng):
    """index_rate=1.0 replaces features entirely with retrieved blends."""
    from rvc_tpu.retrieval import build_index

    vecs = rng.standard_normal((64, 768)).astype(np.float32)
    rvc.index = build_index(vecs, nlist=4)
    try:
        n = SR // 2
        audio = 0.5 * np.sin(2 * np.pi * 220 * np.arange(n) / SR)
        out = _convert(rvc, audio, index_rate=1.0)
    finally:
        rvc.index = None
    _check(out, n)


def test_audio_utils_degenerate():
    from rvc_tpu.utils.audio import change_rms, peak_normalize

    assert peak_normalize(np.zeros(100, np.float32)).max() == 0.0
    loud = np.full(100, 3.0, np.float32)
    assert abs(peak_normalize(loud).max() - 0.99) < 1e-6
    # silent target must not divide by zero
    out = change_rms(np.ones(1600, np.float32), SR,
                     np.zeros(3200, np.float32), 32000, 1.0)
    assert np.isfinite(out).all()


def test_chunk_s_env_pipelined_split(rvc, monkeypatch):
    """RVC_TPU_CHUNK_S forces fine-grained chunks (fetch/compute
    overlap on the tunneled link); output must reassemble to the same
    waveform as the single pass within the phase-restart tolerance of
    test_long_audio_chunking."""
    t = np.arange(5 * SR) / SR
    audio = (0.4 * np.sin(2 * np.pi * 180 * t)
             * (0.6 + 0.4 * np.sin(2 * np.pi * 0.7 * t))).astype(np.float32)
    f0 = np.full(len(audio) // 160 + 1, 180.0, dtype=np.float32)

    whole = rvc.infer(audio, input_f0=f0, index_rate=0.0)

    monkeypatch.setenv("RVC_TPU_CHUNK_S", "2.0")
    pts = rvc.pipeline._find_split_points(audio)
    assert len(pts) >= 1  # the 5 s clip actually splits
    chunked = rvc.infer(audio, input_f0=f0, index_rate=0.0)

    assert np.isfinite(chunked).all()
    assert len(chunked) == len(whole)

    def corr(a, b):
        return np.corrcoef(a.astype(np.float64), b.astype(np.float64))[0, 1]

    assert corr(chunked, whole) > 0.85
    assert corr(chunked[:48000], whole[:48000]) > 0.9


def test_chunk_batch_env_matches_pipelined(rvc, monkeypatch):
    """RVC_TPU_CHUNK_BATCH=1 converts same-bucket chunks as one batched
    dispatch (fewer link RPCs); the waveform must match the per-chunk
    deferred-dispatch path — same graph, batch dim 2 vs two calls —
    including the flattened batched retrieval."""
    from rvc_tpu.retrieval.ivf import build_index

    t = np.arange(5 * SR) / SR
    audio = (0.4 * np.sin(2 * np.pi * 180 * t)
             * (0.6 + 0.4 * np.sin(2 * np.pi * 0.7 * t))).astype(np.float32)
    rng = np.random.default_rng(3)
    rvc.index = build_index(
        rng.standard_normal((512, 768)).astype(np.float32), kmeans_iters=2)

    # noise-free NSF source: a (2,T,C) noise draw differs from two
    # (1,T,C) draws of the same key (measured corr 0.993 noise-on, a
    # benign rng-shape artifact); disabling it isolates the graph
    monkeypatch.setenv("RVC_TPU_SOURCE_NOISE", "0")
    monkeypatch.setenv("RVC_TPU_CHUNK_S", "2.0")
    per_chunk = rvc.infer(audio, f0_method="rmvpe", index_rate=0.5)
    monkeypatch.setenv("RVC_TPU_CHUNK_BATCH", "1")
    batched = rvc.infer(audio, f0_method="rmvpe", index_rate=0.5)

    assert np.isfinite(batched).all()
    assert len(batched) == len(per_chunk)
    corr = np.corrcoef(batched.astype(np.float64),
                       per_chunk.astype(np.float64))[0, 1]
    assert corr > 0.999, corr


@pytest.mark.slow  # 45-70s: nightly tier
def test_output_length_exact_at_bucket_boundary(rvc):
    """With near-exact bucket padding (slack < 320 samples) the HuBERT
    x2 grid used to cap p_len and silently drop the final 10 ms frames
    of a chunk (the reference has the same truncation,
    `rvc/infer/pipeline.py` p_len = min(.., feats*2)); the feature grid
    is now edge-padded so output length is exactly n//160 frames."""
    p = rvc.pipeline
    b = p.config.frame_bucket * p.window
    spf = p.tgt_sr // 100
    for n in (b, b - 160, 2 * b):  # slack 0 / 160 / 0 after bucketing
        t = np.arange(n) / 16000
        chunk = (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
        out = p.fused_convert(chunk, 0, 0.0, 0.0, 0.5, None, 0.0)
        assert len(out) == (n // p.window) * spf, (n, len(out))


def test_input_f0_chunk_alignment(rvc, monkeypatch):
    """A user f0 curve (index 0 = audio frame 0) must land on the right
    frames in every chunk: chunk i consumes the padded-curve slice at
    its own offset, not the start of the curve."""
    p = rvc.pipeline
    n = 5 * SR
    t = np.arange(n) / SR
    audio = (0.4 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
    curve = np.linspace(100.0, 300.0, n // 160 + 1).astype(np.float32)

    captured = []
    orig = p.voice_conversion

    def spy(audio0, pitch, pitchf, *a, **k):
        captured.append(None if pitchf is None else pitchf.copy())
        return orig(audio0, pitch, pitchf, *a, **k)

    monkeypatch.setattr(p, "voice_conversion", spy)
    monkeypatch.setenv("RVC_TPU_CHUNK_S", "2.0")
    rvc.infer(audio, input_f0=curve, index_rate=0.0)
    assert len(captured) >= 2

    pw = p.t_pad // p.window
    padded = np.pad(curve, (pw, pw), mode="edge")
    from rvc_tpu.utils.audio import highpass_filter

    a = highpass_filter(audio, 16000, 48.0, 5)
    pts = [(x // p.window) * p.window for x in p._find_split_points(a)]
    bounds = list(zip([0] + pts, pts + [n]))
    assert len(bounds) == len(captured)
    for (s, e), pf in zip(bounds, captured):
        expect = padded[s // 160 : (e + 2 * p.t_pad) // 160]
        m = min(len(expect), len(pf))
        np.testing.assert_allclose(pf[:m], expect[:m], rtol=1e-6)
