"""Steady-state host-span breakdown of the fused e2e path (tracer reset
after warmup so compiles don't pollute the means)."""

import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["RVC_TPU_TRACE"] = "1"

import numpy as np

from bench import synth_speech_like
from rvc_tpu.api import RVC
from rvc_tpu.configs import get_config
from rvc_tpu.utils.profiling import global_tracer


def main():
    duration = 13.5
    audio = synth_speech_like(duration)
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    kwargs = dict(sid=0, pitch=0.0, f0_method="rmvpe", index_rate=0.0,
                  volume_envelope=1.0, protect=0.5)

    np.asarray(rvc.infer(audio, **kwargs))
    tr = global_tracer()
    tr.totals.clear(); tr.counts.clear()

    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        np.asarray(rvc.infer(audio, **kwargs))
        ts.append(time.perf_counter() - t0)
    m = sorted(ts)[4]
    print(f"e2e: {m*1e3:.1f} ms ({duration/m:.1f}x rt)", flush=True)
    print(json.dumps(tr.summary(), indent=1), flush=True)


if __name__ == "__main__":
    main()
