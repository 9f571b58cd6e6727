"""Does fine-grained chunking (RVC_TPU_CHUNK_S) hide the D2H fetch?

One process, three measurements on the 13.5 s bench clip:
1. default single-chunk wall time + the compute/fetch split
   (block_until_ready vs np.asarray on a deferred handle);
2. wall time with 2 chunks (~6.75 s);
3. wall time with 3 chunks (~4.5 s).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import synth_speech_like
from rvc_tpu.api import RVC
from rvc_tpu.configs import get_config


def timed(f, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    duration = 13.5
    audio = synth_speech_like(duration)
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    kw = dict(sid=0, pitch=0.0, f0_method="rmvpe", index_rate=0.0,
              volume_envelope=1.0, protect=0.5)

    run = lambda: np.asarray(rvc.infer(audio, **kw))
    run()  # compile
    base = timed(run)
    print(f"single-chunk: {base*1e3:.1f} ms ({duration/base:.1f}x rt)", flush=True)

    # compute/fetch split on the same (already compiled) program
    pipe = rvc.pipeline
    from rvc_tpu.utils.audio import highpass_filter

    a = highpass_filter(audio, 16000, 48.0, 5)
    ap = np.pad(a, (pipe.t_pad, pipe.t_pad), mode="reflect")
    tf = pipe.t_pad // pipe.window
    h = pipe.fused_convert(ap, 0, 0.0, 0.0, 0.5, None, 0.0, defer=True,
                           trim_frames=tf)
    np.asarray(h[0])  # drain
    t0 = time.perf_counter()
    h = pipe.fused_convert(ap, 0, 0.0, 0.0, 0.5, None, 0.0, defer=True,
                           trim_frames=tf)
    h[0].block_until_ready()
    t_compute = time.perf_counter() - t0
    t1 = time.perf_counter()
    np.asarray(h[0])
    t_fetch = time.perf_counter() - t1
    print(f"compute {t_compute*1e3:.1f} ms | fetch-after-ready "
          f"{t_fetch*1e3:.1f} ms", flush=True)

    for chunk_s in (6.75, 4.5):
        os.environ["RVC_TPU_CHUNK_S"] = str(chunk_s)
        pts = pipe._find_split_points(a)
        print(f"chunk_s={chunk_s}: {len(pts)+1} chunks, splits at "
              f"{[round(p/16000,2) for p in pts]} s", flush=True)
        run()  # compile chunk shapes
        t = timed(run)
        print(f"chunk_s={chunk_s}: {t*1e3:.1f} ms ({duration/t:.1f}x rt)",
              flush=True)
    os.environ.pop("RVC_TPU_CHUNK_S", None)


if __name__ == "__main__":
    main()
