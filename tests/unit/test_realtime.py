"""Realtime engine: circular buffers, VAD, SOLA continuity, FX chain."""

import numpy as np
import pytest

from rvc_tpu.realtime.buffer import circular_write
from rvc_tpu.realtime.vad import VADProcessor
from rvc_tpu.realtime.fx import build_fx_chain


def test_circular_write():
    buf = np.zeros(10, dtype=np.float32)
    circular_write(np.arange(1, 4, dtype=np.float32), buf)
    np.testing.assert_array_equal(buf[-3:], [1, 2, 3])
    circular_write(np.arange(4, 7, dtype=np.float32), buf)
    np.testing.assert_array_equal(buf[-6:], [1, 2, 3, 4, 5, 6])
    # oversized write keeps the tail
    circular_write(np.arange(100, dtype=np.float32), buf)
    np.testing.assert_array_equal(buf, np.arange(90, 100))


def test_vad_energy(sine_wave):
    y, sr = sine_wave
    vad = VADProcessor(sensitivity_mode=3, sample_rate=sr)
    # feed silence first so the noise floor adapts
    for _ in range(5):
        assert not vad.is_speech(np.zeros(480, dtype=np.float32) + 1e-5)
    assert vad.is_speech(y[:4800])


def test_fx_chain_runs(sine_wave):
    y, sr = sine_wave
    chain = build_fx_chain(reverb=True, limiter=True, gain=True, gain_db=-3,
                           distortion=True, chorus=True, bitcrush=True,
                           clipping=True, compressor=True, compressor_ratio=4,
                           delay=True, delay_seconds=0.05)
    out = chain(y[:8000], sr)
    assert out.shape == (8000,)
    assert np.isfinite(out).all()


def _fft_peak_hz(x, sr):
    w = np.hanning(len(x))
    spec = np.abs(np.fft.rfft(x * w))
    freqs = np.fft.rfftfreq(len(x), 1 / sr)
    k = int(np.argmax(spec))
    # parabolic interpolation for sub-bin accuracy
    if 0 < k < len(spec) - 1:
        a, b, c = np.log(spec[k - 1] + 1e-12), np.log(spec[k] + 1e-12), \
            np.log(spec[k + 1] + 1e-12)
        k = k + 0.5 * (a - c) / (a + c - 2 * b)
    return float(k * sr / len(x))


@pytest.mark.parametrize("semitones", [3.0, -4.0])
def test_fx_pitch_shift_semitones(semitones):
    """PitchShift FX (`rvc/infer/infer.py:146-148` parity): measured
    spectral peak moves by the requested semitones within 15 cents and
    the duration is preserved exactly."""
    from rvc_tpu.realtime.fx import pitch_shift_fx

    sr = 16000
    t = np.arange(int(1.0 * sr)) / sr
    x = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out = pitch_shift_fx(semitones)(x, sr)
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    # analyze the interior (edges carry OLA ramp-in)
    f_in = _fft_peak_hz(x[2000:-2000], sr)
    f_out = _fft_peak_hz(out[2000:-2000], sr)
    cents = 1200 * np.log2(f_out / (f_in * 2 ** (semitones / 12)))
    assert abs(cents) < 15, f"shift off by {cents:.1f} cents"
    # energy preserved within 3 dB
    assert 0.5 < np.sqrt(np.mean(out**2)) / np.sqrt(np.mean(x**2)) < 1.5


def test_fx_pitch_shift_zero_is_identity():
    from rvc_tpu.realtime.fx import pitch_shift_fx

    x = np.random.default_rng(0).standard_normal(4000).astype(np.float32)
    np.testing.assert_array_equal(pitch_shift_fx(0.0)(x, 16000), x)


def test_fx_chain_includes_pitch_shift():
    chain = build_fx_chain(pitch_shift=True, pitch_shift_semitones=2.0)
    assert len(chain.effects) == 1
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    out = chain(x, sr)
    f = _fft_peak_hz(out[2000:-2000], sr)
    assert abs(1200 * np.log2(f / (200 * 2 ** (2 / 12)))) < 20


def test_fx_gain_math():
    chain = build_fx_chain(gain=True, gain_db=-6.0)
    x = np.ones(100, dtype=np.float32)
    out = chain(x, 16000)
    np.testing.assert_allclose(out, 10 ** (-6 / 20), rtol=1e-5)


@pytest.mark.slow
def test_voice_changer_stream(sine_wave):
    """Stream a sine through the full realtime stack (random weights):
    output blocks keep size; engine stays finite; SOLA state advances."""
    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config
    from rvc_tpu.realtime.core import VoiceChanger, AUDIO_SAMPLE_RATE

    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64)
    rvc = RVC(config=cfg, seed=0)
    vc = VoiceChanger(rvc, read_chunk_size=48, cross_fade_overlap_size=0.05,
                      extra_convert_size=0.2, f0_method="pm")
    block = vc.block_frame  # 48*128 = 6144 samples @48k
    t = np.arange(4 * block) / AUDIO_SAMPLE_RATE
    audio = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    outs = []
    for i in range(4):
        out, vol, timings = vc.on_request(audio[i * block : (i + 1) * block])
        assert out.shape == (block,)
        assert np.isfinite(out).all()
        outs.append(out)
    assert vol >= 0


@pytest.mark.slow
def test_silence_short_circuit_no_dispatch(monkeypatch):
    """A gated (silent) block must not dispatch ANY device work
    (reference short-circuits before converting, `core.py:215-243`), and
    conversion must resume cleanly — same block size, finite output,
    pitch state rolled by the silent gap."""
    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config
    from rvc_tpu.realtime.core import Realtime, AUDIO_SAMPLE_RATE

    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64)
    rvc = RVC(config=cfg, seed=0)
    monkeypatch.setenv("RVC_TPU_RT_FUSED", "1")
    rt = Realtime(rvc, f0_method="rmvpe", silent_threshold=-40)
    rt.realloc(48 * 128, int(0.2 * AUDIO_SAMPLE_RATE),
               int(0.05 * AUDIO_SAMPLE_RATE), AUDIO_SAMPLE_RATE // 100)

    block = 48 * 128
    t = np.arange(block) / AUDIO_SAMPLE_RATE
    speech = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    silence = np.zeros(block, dtype=np.float32)

    out0, vol0 = rt.inference(speech, index_rate=0.0)
    assert np.isfinite(out0).all() and vol0 > 0
    n_out = out0.shape[0]

    # one transition block: the rolling volume buffer still holds speech,
    # so the gate correctly stays open while the tail drains
    rt.inference(silence, index_rate=0.0)
    assert rt._pending_zero_frames == 0

    # silent blocks: forbid every conversion entry point
    def boom(*a, **k):
        raise AssertionError("device dispatch on a gated block")

    monkeypatch.setattr(rt, "_get_block_program", boom)
    monkeypatch.setattr(rt, "_update_pitch", boom)
    monkeypatch.setattr(rt.rvc.pipeline, "voice_conversion", boom)
    bf = rt.block_16k // rt.window_size
    for i in range(3):
        out, vol = rt.inference(silence, index_rate=0.0)
        assert out.shape == (n_out,)
        assert (out == 0).all()
        assert rt._pending_zero_frames == min((i + 1) * bf,
                                              rt.convert_feature_size)
    assert (rt.pitchf_buffer[-3 * bf:] == 0).all()

    # speech resumes: dispatch allowed again, pending roll consumed
    monkeypatch.undo()
    monkeypatch.setenv("RVC_TPU_RT_FUSED", "1")
    out1, vol1 = rt.inference(speech, index_rate=0.0)
    assert out1.shape == (n_out,)
    assert np.isfinite(out1).all()
    assert rt._pending_zero_frames == 0


@pytest.mark.slow
def test_fused_block_matches_staged(monkeypatch):
    """The fused realtime block program (tail f0 + device pitch state +
    synth in ONE dispatch) must match the staged path block for block."""
    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config
    from rvc_tpu.realtime.core import Realtime, AUDIO_SAMPLE_RATE

    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64)
    rvc = RVC(config=cfg, seed=0)

    def mk(env):
        monkeypatch.setenv("RVC_TPU_RT_FUSED", env)
        rt = Realtime(rvc, f0_method="rmvpe", silent_threshold=-90)
        rt.realloc(48 * 128, int(0.2 * AUDIO_SAMPLE_RATE),
                   int(0.05 * AUDIO_SAMPLE_RATE), AUDIO_SAMPLE_RATE // 100)
        return rt

    rng = np.random.default_rng(0)
    t = np.arange(3 * 48 * 128) / AUDIO_SAMPLE_RATE
    audio = (0.4 * np.sin(2 * np.pi * 220 * t)
             + 0.01 * rng.standard_normal(len(t))).astype(np.float32)

    blocks = [audio[i * 48 * 128: (i + 1) * 48 * 128] for i in range(3)]
    monkeypatch.setenv("RVC_TPU_RT_FUSED", "0")
    rt_staged = mk("0")
    staged = [rt_staged.inference(b, index_rate=0.0)[0] for b in blocks]
    monkeypatch.setenv("RVC_TPU_RT_FUSED", "1")
    rt_fused = mk("1")
    fused = [rt_fused.inference(b, index_rate=0.0)[0] for b in blocks]

    assert any(np.abs(f).max() > 1e-4 for f in fused), "outputs all gated"
    for s, f in zip(staged, fused):
        assert s.shape == f.shape
        assert np.isfinite(f).all()
        # identical math up to f16 I/O quantization and reduction order
        np.testing.assert_allclose(f, s, atol=5e-3)
        if s.std() > 0 and f.std() > 0:
            assert np.corrcoef(s, f)[0, 1] > 0.999


@pytest.mark.slow
def test_fused_block_with_index_matches_staged(monkeypatch, tmp_path):
    """Fused realtime block with retrieval blending must match the staged
    path (index search + 1/d^2 blend inside the block program)."""
    import jax.numpy as jnp
    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config
    from rvc_tpu.realtime.core import Realtime, AUDIO_SAMPLE_RATE
    from rvc_tpu.retrieval import build_index

    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64)
    rvc = RVC(config=cfg, seed=0)
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((256, 768)).astype(np.float32)
    rvc.index = build_index(vecs, nlist=4)

    def mk():
        rt = Realtime(rvc, f0_method="rmvpe", silent_threshold=-90)
        rt.realloc(48 * 128, int(0.2 * AUDIO_SAMPLE_RATE),
                   int(0.05 * AUDIO_SAMPLE_RATE), AUDIO_SAMPLE_RATE // 100)
        return rt

    t = np.arange(2 * 48 * 128) / AUDIO_SAMPLE_RATE
    audio = (0.4 * np.sin(2 * np.pi * 220 * t)
             + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
    blocks = [audio[i * 48 * 128: (i + 1) * 48 * 128] for i in range(2)]

    monkeypatch.setenv("RVC_TPU_RT_FUSED", "0")
    staged = [mk_rt.inference(b, index_rate=0.7)[0]
              for mk_rt in [mk()] for b in blocks]
    monkeypatch.setenv("RVC_TPU_RT_FUSED", "1")
    fused = [mk_rt.inference(b, index_rate=0.7)[0]
             for mk_rt in [mk()] for b in blocks]

    assert any(np.abs(f).max() > 1e-4 for f in fused), "outputs all gated"
    for s, f in zip(staged, fused):
        assert s.shape == f.shape
        np.testing.assert_allclose(f, s, atol=5e-3)


@pytest.mark.slow
def test_voice_changer_pool_matches_single_streams(monkeypatch):
    """Pool (N streams, one batched block program) must produce the same
    audio per stream as N single-stream VoiceChangers. Noise disabled:
    batched RNG draws differ from single-stream draws by shape."""
    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config
    from rvc_tpu.realtime.core import VoiceChanger, AUDIO_SAMPLE_RATE
    from rvc_tpu.realtime.pool import VoiceChangerPool

    monkeypatch.setenv("RVC_TPU_SOURCE_NOISE", "0")
    monkeypatch.setenv("RVC_TPU_RT_FUSED", "1")
    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64)
    rvc = RVC(config=cfg, seed=0)

    kw = dict(read_chunk_size=48, cross_fade_overlap_size=0.05,
              extra_convert_size=0.2)
    pool = VoiceChangerPool(rvc, n_streams=2, silent_threshold=-90, **kw)
    singles = [VoiceChanger(rvc, silent_threshold=-90, **kw)
               for _ in range(2)]

    rng = np.random.default_rng(0)
    block = 48 * 128
    t = np.arange(2 * block) / AUDIO_SAMPLE_RATE
    streams = np.stack([
        (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
        (0.3 * np.sin(2 * np.pi * 330 * t)
         + 0.01 * rng.standard_normal(len(t))).astype(np.float32),
    ])

    got_any = False
    for i in range(2):
        blocks = streams[:, i * block : (i + 1) * block]
        pooled, vols = pool.process(blocks)
        for s in range(2):
            single, _, _ = singles[s].on_request(blocks[s])
            assert pooled[s].shape == single.shape
            np.testing.assert_allclose(pooled[s], single, atol=5e-3)
            if np.abs(single).max() > 1e-4:
                got_any = True
    assert got_any, "outputs all gated/silent"
