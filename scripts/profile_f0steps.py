"""Stepwise f0-program bisect: mel -> +pad -> +unet/gru -> +decode ->
+gates/autotune, each as its own jitted program at the real clip shape."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import synth_speech_like
from rvc_tpu.api import RVC
from rvc_tpu.configs import get_config
from rvc_tpu.models.rmvpe import decode_salience
from rvc_tpu.pipelines.offline import F0_MAX, F0_MIN, autotune_f0_jnp, WINDOW


def timed(name, fn, N=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    jax.block_until_ready(outs)
    per = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:46s} {per:8.3f} ms", flush=True)
    return per


def main():
    audio = synth_speech_like(13.5)
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    pipe = rvc.pipeline
    rmvpe = pipe._get_rmvpe()
    model = rmvpe.model
    rvars = rmvpe.variables

    a = np.pad(audio, (pipe.t_pad, pipe.t_pad), mode="reflect")
    n_pad = pipe._bucket_samples(len(a))
    a = np.pad(a, (0, n_pad - len(a)), mode="reflect")
    a16 = jnp.asarray(a[None].astype(np.float16))

    from rvc_tpu.ops.pallas.melspec import pallas_log_mel
    from rvc_tpu.ops.stft import log_mel_spectrogram

    def mel_p(x):
        return pallas_log_mel(x.astype(jnp.float32), 1024, WINDOW, 128,
                              16000, 30.0, 8000.0, htk=True)

    def mel_x(x):
        return log_mel_spectrogram(x.astype(jnp.float32), 1024, 128, 16000,
                                   WINDOW, 1024, fmin=30, fmax=8000, htk=True)

    timed("1. pallas mel", lambda: jax.jit(mel_p)(a16))
    timed("1b. XLA-FFT mel", lambda: jax.jit(mel_x)(a16))

    def steps(rvars, x, upto, use_pallas=True):
        T = x.shape[1]
        p_len0 = T // WINDOW
        mel = mel_p(x) if use_pallas else mel_x(x)
        n_frames = mel.shape[1]
        pad = 32 * ((n_frames - 1) // 32 + 1) - n_frames
        melp = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)), mode="reflect") if pad else mel
        if upto == 1:
            return melp
        hidden = model.apply(rvars, melp)[:, :n_frames]
        if upto == 2:
            return hidden
        f0 = decode_salience(hidden, 0.03)[:, :p_len0]
        if upto == 3:
            return f0
        f0 = jnp.where((f0 >= F0_MIN) & (f0 <= F0_MAX), f0, 0.0)
        f0 = autotune_f0_jnp(f0, 0.0)
        return f0 * 2.0 ** (0.0 / 12.0)

    for upto, name in ((1, "mel+pad"), (2, "+unet/gru"), (3, "+decode"),
                       (4, "+gates/autotune")):
        f = jax.jit(lambda v, x, u=upto: steps(v, x, u))
        timed(f"{upto}. {name}", lambda: f(rvars, a16))

    f = jax.jit(lambda v, x: steps(v, x, 4, use_pallas=False))
    timed("4b. full with XLA mel", lambda: f(rvars, a16))


if __name__ == "__main__":
    main()
