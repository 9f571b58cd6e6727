"""Parameter sweep for the DSP pitch extractors against the golden
RMVPE contour on the real 13.5 s clip (VERDICT r4 #7): DIO
channels/deviation threshold, Harvest channels-per-octave (WORLD uses
40) / score threshold / margin, YIN CMND threshold. Prints a score
table per config; used to pick the shipped defaults + tightened bounds
in tests/pitch/test_dsp_natural.py."""

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIXTURES = "/root/reference/ios_test_data"


def score(f0, gold):
    n = min(len(f0), len(gold))
    f, g = f0[:n], gold[:n]
    ev, gv = f > 0, g > 0
    both = ev & gv
    if both.sum() == 0:
        return dict(agree=0, prec=0, rec=0, med=999, w100=0)
    cents = 1200.0 * np.log2(f[both] / g[both])
    return dict(
        agree=float((ev == gv).mean()),
        prec=float(both.sum() / max(ev.sum(), 1)),
        rec=float(both.sum() / max(gv.sum(), 1)),
        med=float(np.median(np.abs(cents))),
        w100=float((np.abs(cents) < 100).mean()),
    )


def fmt(name, s, secs):
    return (f"{name:48s} agree={s['agree']:.3f} prec={s['prec']:.3f} "
            f"rec={s['rec']:.3f} med={s['med']:6.1f}c w100={s['w100']:.3f} "
            f"[{secs:5.1f}s]")


def main():
    clip = np.load(os.path.join(FIXTURES, "input_audio.npy")).astype(
        np.float32)
    if clip.ndim > 1:
        clip = clip.mean(axis=-1)
    gold = np.load(os.path.join(FIXTURES, "rmvpe_f0.npy")).astype(np.float64)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("yin", "all"):
        from rvc_tpu.pitch.dsp import yin_f0

        for thr in (0.25, 0.3, 0.35, 0.4, 0.45, 0.5):
            t0 = time.perf_counter()
            s = score(yin_f0(clip, threshold=thr), gold)
            print(fmt(f"yin thr={thr}", s, time.perf_counter() - t0),
                  flush=True)

    if which in ("dio", "all"):
        from rvc_tpu.pitch.dsp import stonemask_refine
        from rvc_tpu.pitch.world_dsp import dio_f0

        for cio, dev in itertools.product((2.0, 4.0, 8.0),
                                          (0.02, 0.05, 0.1)):
            t0 = time.perf_counter()
            f0 = dio_f0(clip, channels_in_octave=cio,
                        deviation_threshold=dev)
            s = score(f0, gold)
            print(fmt(f"dio cio={cio} dev={dev}", s,
                      time.perf_counter() - t0), flush=True)
            s2 = score(stonemask_refine(clip, f0), gold)
            print(fmt(f"dio+stonemask cio={cio} dev={dev}", s2, 0.0),
                  flush=True)

    if which in ("harvest", "all"):
        from rvc_tpu.pitch.world_dsp import harvest_f0

        for cio, thr, margin in itertools.product(
                (24.0, 40.0), (0.25, 0.4), (0.3, 0.4, 0.55)):
            t0 = time.perf_counter()
            s = score(harvest_f0(clip, channels_in_octave=cio,
                                 score_threshold=thr, margin=margin), gold)
            print(fmt(f"harvest cio={cio} thr={thr} m={margin}", s,
                      time.perf_counter() - t0), flush=True)


if __name__ == "__main__":
    main()
