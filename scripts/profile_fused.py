"""Wall-time breakdown of the fused conversion path on the real chip.

Times, with explicit block_until_ready barriers:
  - audio host->device upload
  - f0 program (RMVPE mel -> U-Net -> decode)
  - conversion program (HuBERT -> retrieval -> synthesizer -> vocoder)
  - waveform device->host download
against the end-to-end `rvc.infer` wall time, to show where the tunnel
round trips go.
"""

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


def t(fn, n=5):
    fn()  # warm
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[n // 2]


def main():
    duration = 13.5
    audio = synth_speech_like(duration)
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    kwargs = dict(sid=0, pitch=0.0, f0_method="rmvpe", index_rate=0.0,
                  volume_envelope=1.0, protect=0.5)

    out = rvc.infer(audio, **kwargs)  # compile everything
    e2e = t(lambda: np.asarray(rvc.infer(audio, **kwargs)))
    print(f"e2e infer wall:        {e2e*1e3:8.1f} ms  ({duration/e2e:.1f}x rt)")

    # reproduce the fused chunk exactly as pipeline() builds it
    pipe = rvc.pipeline
    from rvc_tpu.utils import audio as audio_utils
    a = audio_utils.highpass_filter(audio.astype(np.float32), 16000, 48.0, 5)
    chunk = np.pad(a, (pipe.t_pad, pipe.t_pad), mode="reflect")
    n = len(chunk)
    n_pad = pipe._bucket_samples(n)
    audio_np = np.pad(chunk.astype(np.float32), (0, n_pad - n), mode="reflect")

    dev = jax.devices()[0]
    up = t(lambda: jax.device_put(audio_np, dev).block_until_ready())
    print(f"audio upload ({audio_np.nbytes/1e6:.2f} MB): {up*1e3:8.1f} ms")

    audio_j = jax.device_put(audio_np[None], dev)
    rmvpe = pipe._get_rmvpe()
    pipe._rmvpe_model = rmvpe.model
    f0p, convp = pipe._get_packed(False, rmvpe)
    sb, hb, rb = pipe._packed["bufs"]

    f0_t = t(lambda: f0p(rb, audio_j, 0.0, 0.0).block_until_ready())
    print(f"f0 program:            {f0_t*1e3:8.1f} ms")

    f0 = f0p(rb, audio_j, 0.0, 0.0)
    hub_frames = (n_pad - 400) // 320 + 1
    p_len = min(n // 160, 2 * hub_frames)
    p_len_j = jnp.array([p_len])
    sid_j = jnp.array([0])

    conv_t = t(lambda: convp(sb, hb, audio_j, f0, sid_j, p_len_j,
                             0.5).block_until_ready())
    print(f"conv program:          {conv_t*1e3:8.1f} ms")

    wave = convp(sb, hb, audio_j, f0, sid_j, p_len_j, 0.5)
    down = t(lambda: np.asarray(wave))
    print(f"wave download ({wave.nbytes/1e6:.2f} MB): {down*1e3:8.1f} ms")

    # both programs chained WITHOUT intermediate barrier (async dispatch)
    def chained():
        f0_ = f0p(rb, audio_j, 0.0, 0.0)
        w = convp(sb, hb, audio_j, f0_, sid_j, p_len_j, 0.5)
        np.asarray(w)
    ch = t(chained)
    print(f"f0+conv+download chained: {ch*1e3:6.1f} ms")

    def full_host():
        aj = jax.device_put(audio_np[None], dev)
        f0_ = f0p(rb, aj, 0.0, 0.0)
        w = convp(sb, hb, aj, f0_, sid_j, p_len_j, 0.5)
        np.asarray(w)
    fh = t(full_host)
    print(f"upload+f0+conv+download:  {fh*1e3:6.1f} ms")


if __name__ == "__main__":
    main()
