"""Natural-speech bounds for the DSP pitch extractors (VERDICT r3 #9).

The synthetic fixtures in test_dsp_pitch.py can't exercise WORLD's
differentiators (weak fundamentals, breathy onsets, spectral tilt), so
this pins each extractor against the REAL 13.5 s benchmark clip
(`/root/reference/ios_test_data/input_audio.npy`) scored against the
real pretrained RMVPE's golden contour (`rmvpe_f0.npy`, the reference's
own parity oracle, `tests/pitch/test_parity.py:316+` analog).

Bounds tightened in r5 to the VERDICT targets after the
scripts/tune_dsp_pitch.py sweep (measured r5: dio+stonemask med
11.8 c / w100 0.911; harvest recall 0.865 @ precision 0.786 at WORLD's
40 channels/octave; yin recall 0.675 @ precision 0.906 at CMND 0.35).
The extractors are deterministic (pure numpy, no RNG), so thin margins
are safe: any numerics change that degrades them fails loudly.
"""

import os

import numpy as np
import pytest

FIXTURES = "/root/reference/ios_test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference golden fixtures not present")


@pytest.fixture(scope="module")
def clip():
    a = np.load(os.path.join(FIXTURES, "input_audio.npy")).astype(np.float32)
    return a.mean(axis=-1) if a.ndim > 1 else a


@pytest.fixture(scope="module")
def gold():
    return np.load(os.path.join(FIXTURES, "rmvpe_f0.npy")).astype(np.float64)


def _score(f0, gold):
    n = min(len(f0), len(gold))
    f, g = f0[:n], gold[:n]
    ev, gv = f > 0, g > 0
    both = ev & gv
    cents = 1200.0 * np.log2(f[both] / g[both])
    return dict(
        agree=float((ev == gv).mean()),
        prec=float(both.sum() / max(ev.sum(), 1)),
        rec=float(both.sum() / max(gv.sum(), 1)),
        med_cents=float(np.median(np.abs(cents))),
        within_100c=float((np.abs(cents) < 100).mean()),
    )


def test_dio_natural_speech(clip, gold):
    from rvc_tpu.pitch.world_dsp import dio_f0

    s = _score(dio_f0(clip), gold)
    assert s["agree"] > 0.80, s
    assert s["rec"] > 0.90, s          # DIO over-voices, never misses
    assert s["med_cents"] < 30.0, s
    assert s["within_100c"] > 0.85, s  # <15% octave/gross errors


def test_dio_stonemask_natural_speech(clip, gold):
    from rvc_tpu.pitch.dsp import stonemask_refine
    from rvc_tpu.pitch.world_dsp import dio_f0

    s = _score(stonemask_refine(clip, dio_f0(clip)), gold)
    assert s["agree"] > 0.80 and s["within_100c"] > 0.88, s
    # the VERDICT r4 #7 target: the pm-facade contour (dio+stonemask)
    # lands <=15 c median on natural speech (measured 11.8 with the
    # r5 instantaneous-frequency StoneMask)
    assert s["med_cents"] < 15.0, s


def test_harvest_natural_speech(clip, gold):
    from rvc_tpu.pitch.world_dsp import harvest_f0

    s = _score(harvest_f0(clip), gold)
    assert s["agree"] > 0.78, s
    assert s["prec"] > 0.75, s
    assert s["rec"] > 0.85, s          # VERDICT r4 #7 target (meas. 0.865)
    assert s["med_cents"] < 25.0, s    # voiced frames land on the f0
    assert s["within_100c"] > 0.72, s


def test_yin_natural_speech(clip, gold):
    """YIN: r5 default CMND threshold 0.35 — the sweep's best recall
    that keeps precision >= 0.9 (measured prec 0.906 / rec 0.675 /
    med 19.7 c; the r4 0.25 default had rec 0.50). VERDICT r4 #7
    target: recall >= 0.65 at precision >= 0.9."""
    from rvc_tpu.pitch.dsp import yin_f0

    s = _score(yin_f0(clip), gold)
    assert s["prec"] > 0.90, s
    assert s["rec"] > 0.65, s
    assert s["med_cents"] < 25.0, s
    assert s["within_100c"] > 0.72, s


def test_cross_method_voiced_consensus(clip, gold):
    """Where dio AND harvest both call a frame voiced, they land in the
    same octave class (within 100 cents) on most of those frames — the
    cross-method sanity the reference checks across its extractor set
    (r5 measured 0.684: harvest's recall-tuned thresholds now include
    more borderline frames where dio octave-errs, so the bound sits at
    0.65; r4's 0.76 was on a harvest that skipped those frames
    entirely, recall 0.75)."""
    from rvc_tpu.pitch.world_dsp import dio_f0, harvest_f0

    d, h = dio_f0(clip), harvest_f0(clip)
    n = min(len(d), len(h))
    both = (d[:n] > 0) & (h[:n] > 0)
    assert both.sum() > 300
    cents = np.abs(1200.0 * np.log2(d[:n][both] / h[:n][both]))
    assert (cents < 100).mean() > 0.65, (cents < 100).mean()
