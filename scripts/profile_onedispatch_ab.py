"""Same-process interleaved A/B of the two-program vs merged one-dispatch
fused path (tunnel variance is large, so alternating runs in one process
is the only fair comparison)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import synth_speech_like
from rvc_tpu.api import RVC
from rvc_tpu.configs import get_config


def main():
    duration = 13.5
    audio = synth_speech_like(duration)
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    kwargs = dict(sid=0, pitch=0.0, f0_method="rmvpe", index_rate=0.0,
                  volume_envelope=1.0, protect=0.5)

    outs = {}
    for mode in ("0", "1"):  # compile both up front
        os.environ["RVC_TPU_ONE_DISPATCH"] = mode
        t0 = time.perf_counter()
        outs[mode] = np.asarray(rvc.infer(audio, **kwargs))
        print(f"warmup mode={mode}: {time.perf_counter()-t0:.1f}s", flush=True)
    corr = float(np.corrcoef(outs["0"].astype(np.float64),
                             outs["1"].astype(np.float64))[0, 1])
    print(f"waveform corr two-prog vs merged: {corr:.8f}", flush=True)

    times = {"0": [], "1": []}
    for _ in range(9):
        for mode in ("0", "1"):
            os.environ["RVC_TPU_ONE_DISPATCH"] = mode
            t0 = time.perf_counter()
            np.asarray(rvc.infer(audio, **kwargs))
            times[mode].append(time.perf_counter() - t0)
    for mode, label in (("0", "two-program"), ("1", "one-dispatch")):
        ts = sorted(times[mode])
        med = ts[len(ts) // 2]
        print(f"{label}: median {med*1e3:.1f} ms ({duration/med:.1f}x rt), "
              f"min {ts[0]*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
