"""Separate device compute from tunnel dispatch: issue N calls
back-to-back then block once — pipelined dispatch amortizes the round
trip, so per-call time approaches pure device compute."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
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
    rvc.infer(audio, **kwargs)

    pipe = rvc.pipeline
    from rvc_tpu.utils import audio as audio_utils
    a = audio_utils.highpass_filter(audio.astype(np.float32), 16000, 48.0, 5)
    chunk = np.pad(a, (pipe.t_pad, pipe.t_pad), mode="reflect")
    n = len(chunk)
    n_pad = pipe._bucket_samples(n)
    audio_np = np.pad(chunk.astype(np.float32), (0, n_pad - n), mode="reflect")

    dev = jax.devices()[0]
    audio_j = jax.device_put(audio_np[None], dev)
    rmvpe = pipe._get_rmvpe()
    pipe._rmvpe_model = rmvpe.model
    f0p, convp = pipe._get_packed(False, rmvpe)
    sb, hb, rb = pipe._packed["bufs"]

    f0 = f0p(rb, audio_j, 0.0, 0.0)
    hub_frames = (n_pad - 400) // 320 + 1
    p_len = min(n // 160, 2 * hub_frames)
    p_len_j = jnp.array([p_len])
    sid_j = jnp.array([0])
    convp(sb, hb, audio_j, f0, sid_j, p_len_j, 0.5).block_until_ready()

    N = 10
    # pipelined f0: N dispatches, one barrier
    t0 = time.perf_counter()
    outs = [f0p(rb, audio_j, 0.0, float(i) * 0.0) for i in range(N)]
    jax.block_until_ready(outs)
    print(f"f0   pipelined x{N}:  {(time.perf_counter()-t0)/N*1e3:7.1f} ms/call")

    t0 = time.perf_counter()
    outs = [convp(sb, hb, audio_j, f0, sid_j, p_len_j, 0.5) for _ in range(N)]
    jax.block_until_ready(outs)
    print(f"conv pipelined x{N}:  {(time.perf_counter()-t0)/N*1e3:7.1f} ms/call")

    # f16 upload
    audio_f16 = audio_np.astype(np.float16)
    jax.device_put(audio_f16, dev).block_until_ready()
    for nm, arr in [("f32", audio_np), ("f16", audio_f16),
                    ("i16", (audio_np * 32767).astype(np.int16))]:
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_put(arr, dev).block_until_ready()
            ts.append(time.perf_counter() - t0)
        print(f"upload {nm} ({arr.nbytes/1e6:.2f} MB): {sorted(ts)[2]*1e3:7.1f} ms")

    # bare dispatch round trip: trivial program on a scalar
    @jax.jit
    def noop(x):
        return x + 1.0
    xs = jnp.zeros(())
    noop(xs).block_until_ready()
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        noop(xs).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"noop dispatch+block:  {sorted(ts)[5]*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
