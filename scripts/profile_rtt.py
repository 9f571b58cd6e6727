"""Dispatch/RTT accounting for the 2-program fused path: how much of
serial e2e is device compute vs tunnel round trips, and whether chaining
dispatches (one sync) hides the f0->conv RTT."""

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
    pipe = rvc.pipeline
    from rvc_tpu.utils import audio as audio_utils

    a = audio_utils.highpass_filter(audio.astype(np.float32), 16000, 48.0, 5)
    chunk = np.pad(a, (pipe.t_pad, pipe.t_pad), mode="reflect")
    n = len(chunk)
    n_pad = pipe._bucket_samples(n)
    audio_np = np.pad(chunk.astype(np.float32), (0, n_pad - n),
                      mode="reflect").astype(np.float16)[None]
    dev = jax.devices()[0]

    rmvpe = pipe._get_rmvpe()
    pipe._rmvpe_model = rmvpe.model
    f0p, convp = pipe._get_packed(False, rmvpe)
    sb, hb, rb = pipe._packed["bufs"]
    audio_j = jax.device_put(audio_np, dev)
    p_len_j = jnp.array([min(n // 160, 10_000)])
    sid_j = jnp.array([0])

    # warm
    f0 = f0p(rb, audio_j, 0.0, 0.0)
    out = convp(sb, hb, audio_j, f0, sid_j, p_len_j, 0.5)
    jax.block_until_ready(out)

    def med(fn, N=9):
        ts = []
        for _ in range(N):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[N // 2] * 1e3

    print(f"dispatch-only f0p (no sync)      {med(lambda: f0p(rb, audio_j, 0.0, 0.0)):8.2f} ms", flush=True)
    jax.block_until_ready(f0p(rb, audio_j, 0.0, 0.0))

    def disp_conv():
        convp(sb, hb, audio_j, f0, sid_j, p_len_j, 0.5)
    print(f"dispatch-only convp (no sync)    {med(disp_conv):8.2f} ms", flush=True)
    jax.block_until_ready(convp(sb, hb, audio_j, f0, sid_j, p_len_j, 0.5))

    def serial_sync():
        r = f0p(rb, audio_j, 0.0, 0.0)
        jax.block_until_ready(r)
        o = convp(sb, hb, audio_j, r, sid_j, p_len_j, 0.5)
        jax.block_until_ready(o)
    print(f"serial (sync after each)         {med(serial_sync):8.2f} ms", flush=True)

    def chained():
        r = f0p(rb, audio_j, 0.0, 0.0)
        o = convp(sb, hb, audio_j, r, sid_j, p_len_j, 0.5)
        jax.block_until_ready(o)
    print(f"chained (one sync)               {med(chained):8.2f} ms", flush=True)

    def full():
        aj = jax.device_put(audio_np, dev)
        r = f0p(rb, aj, 0.0, 0.0)
        o = convp(sb, hb, aj, r, sid_j, p_len_j, 0.5)
        np.asarray(o)
    print(f"upload + chained + download      {med(full):8.2f} ms", flush=True)

    def sync_only():
        jax.block_until_ready(jax.device_put(np.float32(1.0), dev))
    print(f"tiny upload + sync (RTT probe)   {med(sync_only):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
