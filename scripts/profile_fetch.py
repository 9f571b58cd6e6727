"""A/B the async-fetch overlap (RVC_TPU_ASYNC_FETCH) on the fused e2e
path in one process (same compiled programs, same buffers)."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import synth_speech_like
from rvc_tpu.api import RVC
from rvc_tpu.configs import get_config


def run(rvc, audio, kwargs, n=9):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(rvc.infer(audio, **kwargs))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2]


def main():
    duration = 13.5
    audio = synth_speech_like(duration)
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    kwargs = dict(sid=0, pitch=0.0, f0_method="rmvpe", index_rate=0.0,
                  volume_envelope=1.0, protect=0.5)
    rvc.infer(audio, **kwargs)  # compile

    for knob in ("0", "1", "0", "1"):
        os.environ["RVC_TPU_ASYNC_FETCH"] = knob
        m = run(rvc, audio, kwargs)
        print(f"async_fetch={knob}: e2e {m*1e3:.1f} ms ({duration/m:.1f}x rt)",
              flush=True)


if __name__ == "__main__":
    main()
