"""DSP pitch extractors: accuracy on synthetic signals (the reference's
pitch test strategy, `tests/pitch/` there: sines, chirps, voiced/unvoiced)."""

import numpy as np
import pytest

from rvc_tpu.pitch.dsp import autocorr_f0, harvest_like_f0, yin_f0, stonemask_refine
from rvc_tpu.pitch.autotune import autotune_f0


@pytest.mark.parametrize("fn", [yin_f0, autocorr_f0, harvest_like_f0])
def test_sine_pitch(fn, sine_wave):
    y, sr = sine_wave  # 220 Hz
    f0 = fn(y, sr)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.7 * len(f0)
    err = np.abs(np.median(voiced) - 220.0)
    assert err < 5.0, f"{fn.__name__}: median {np.median(voiced):.1f}"


@pytest.mark.parametrize("fn", [yin_f0, autocorr_f0])
def test_chirp_tracks(fn, chirp_wave):
    y, sr = chirp_wave  # 100 -> 400 Hz
    f0 = fn(y, sr)
    n = len(f0)
    early = f0[n // 8 : n // 4]
    late = f0[3 * n // 4 : 7 * n // 8]
    early, late = early[early > 0], late[late > 0]
    assert len(early) and len(late)
    assert np.median(late) > np.median(early) + 80


@pytest.mark.parametrize("fn", [yin_f0, autocorr_f0, harvest_like_f0])
def test_unvoiced_regions(fn, voiced_unvoiced_wave):
    y, sr = voiced_unvoiced_wave
    f0 = fn(y, sr)
    n = len(f0)
    q1 = f0[: n // 4]           # voiced 200 Hz
    q2 = f0[n // 4 : n // 2]    # noise
    assert (q1 > 0).mean() > 0.6
    assert (q2 > 0).mean() < 0.4


def test_stonemask_refines(sine_wave):
    y, sr = sine_wave
    coarse = autocorr_f0(y, sr)
    refined = stonemask_refine(y, coarse, sr)
    v = refined[refined > 0]
    assert np.abs(np.median(v) - 220.0) < 3.0


def test_autotune_snaps():
    f0 = np.array([0.0, 218.0, 441.5, 100.0], dtype=np.float32)
    out = autotune_f0(f0, 1.0)
    assert out[0] == 0.0
    np.testing.assert_allclose(out[1], 220.0)
    np.testing.assert_allclose(out[2], 440.0)
    np.testing.assert_allclose(out[3], 98.0)
    half = autotune_f0(f0, 0.5)
    np.testing.assert_allclose(half[1], 219.0)


def test_facade_dsp_methods(sine_wave):
    from rvc_tpu.pitch import PitchExtractor

    y, sr = sine_wave
    for m in ["dio", "pm", "harvest"]:
        f0 = PitchExtractor(m).extract(y)
        v = f0[f0 > 0]
        assert len(v) > 0 and abs(np.median(v) - 220) < 8, m
