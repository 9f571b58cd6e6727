"""Hybrid f0 combination and proposed-pitch auto-shift."""

import numpy as np
import pytest

from rvc_tpu.pitch import PitchExtractor


def test_hybrid_dsp_methods(sine_wave):
    y, sr = sine_wave
    ext = PitchExtractor("hybrid[dio+pm]")
    f0 = ext.extract(y)
    v = f0[f0 > 0]
    assert len(v) > 0.5 * len(f0)
    assert abs(np.median(v) - 220.0) < 8


def test_hybrid_majority_voicing():
    # one method voiced, one unvoiced -> 2-way majority requires 1 -> voiced;
    # construct via monkeypatched extractors
    ext = PitchExtractor("hybrid[dio+pm+harvest]")

    class Fake:
        def __init__(self, f0):
            self.f0 = f0

        def extract(self, a, lo, hi):
            return self.f0

    ext._sub = [Fake(np.array([100.0, 0, 200])),
                Fake(np.array([110.0, 0, 0])),
                Fake(np.array([0.0, 0, 0]))]
    f0 = ext.extract(np.zeros(480, np.float32))
    assert f0[0] > 0        # 2/3 voiced -> majority
    assert f0[1] == 0
    assert f0[2] == 0       # 1/3 voiced -> unvoiced
    np.testing.assert_allclose(f0[0], 105.0)  # median of 100,110


def test_unknown_hybrid_component():
    with pytest.raises(ValueError):
        PitchExtractor("hybrid[dio+nope]")


def test_proposed_pitch_shift(tiny_pipeline=None):
    """Median 220 Hz with threshold 155 -> shift about -6 semitones."""
    from rvc_tpu.pipelines.offline import Pipeline

    # use get_f0 standalone through a bare object (no models needed for dio)
    class P(Pipeline):
        def __init__(self):
            self.pitch_extractor = None
            self.window = 160

    p = P.__new__(P)
    p.pitch_extractor = None
    p.window = 160
    sr = 16000
    t = np.arange(sr) / sr
    y = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    coarse, f0 = Pipeline.get_f0(p, y, sr // 160, "pm", 0.0,
                                 proposed_pitch=True,
                                 proposed_pitch_threshold=155.0)
    v = f0[f0 > 0]
    # 220 * 2^(-6/12) = 155.6
    assert abs(np.median(v) - 155.6) < 12
