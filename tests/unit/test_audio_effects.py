"""Noise reduction, split/merge, formant shift utilities."""

import numpy as np
import pytest

from rvc_tpu.utils.noise import reduce_noise
from rvc_tpu.utils.split_audio import merge_audio, split_silence_nonsilent
from rvc_tpu.utils.formant import formant_shift


def test_reduce_noise_attenuates_noise_floor(sine_wave):
    y, sr = sine_wave
    rng = np.random.default_rng(0)
    noisy = y + 0.02 * rng.standard_normal(len(y)).astype(np.float32)
    clean = reduce_noise(noisy, sr, strength=0.9)
    assert clean.shape == noisy.shape
    # noise floor in a high band (no signal there) should drop
    def band_energy(a):
        spec = np.abs(np.fft.rfft(a))
        freqs = np.fft.rfftfreq(len(a), 1 / sr)
        return spec[(freqs > 4000)].mean()
    assert band_energy(clean) < band_energy(noisy) * 0.9
    # the 220 Hz tone survives
    spec = np.abs(np.fft.rfft(clean))
    freqs = np.fft.rfftfreq(len(clean), 1 / sr)
    tone = spec[np.argmin(np.abs(freqs - 220))]
    assert tone > 0.8 * np.abs(np.fft.rfft(y))[np.argmin(np.abs(freqs - 220))]


def test_split_and_merge(voiced_unvoiced_wave):
    sr = 16000
    t = np.arange(sr) / sr
    sig = np.concatenate([
        0.5 * np.sin(2 * np.pi * 200 * t[: sr // 4]),
        np.zeros(sr // 4, dtype=np.float64),
        0.5 * np.sin(2 * np.pi * 300 * t[: sr // 4]),
    ]).astype(np.float32)
    intervals, segs = split_silence_nonsilent(sig, sr, min_silence_ms=150)
    assert len(segs) == 2
    # identity merge at same rate restores speech at right positions
    out = merge_audio(intervals, segs, len(sig), sr, sr)
    s0 = intervals[0]
    np.testing.assert_allclose(out[s0[0]: s0[0] + 100], sig[s0[0]: s0[0] + 100], atol=1e-6)


def test_formant_shift_preserves_pitch(sine_wave):
    y, sr = sine_wave
    out = formant_shift(y, sr, quefrency=1.0, timbre=1.3)
    assert out.shape == y.shape
    # dominant frequency unchanged (pitch preserved)
    def domfreq(a):
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        return np.fft.rfftfreq(len(a), 1 / sr)[np.argmax(spec[1:]) + 1]
    assert abs(domfreq(out) - domfreq(y)) < 5.0
    # timbre=1 is identity
    np.testing.assert_allclose(formant_shift(y, sr, 1.0, 1.0), y)
