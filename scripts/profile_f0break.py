"""Sub-piece breakdown of the f0 program: mel frontend, DeepUnet+fc,
BiGRU, salience decode — to target the next RMVPE optimization."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import synth_speech_like
from rvc_tpu.models.rmvpe import RMVPE, E2E, decode_salience
from rvc_tpu.ops.gru import bigru


def timed(name, fn, N=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    jax.block_until_ready(outs)
    per = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:40s} {per:8.2f} ms/call", flush=True)
    return per


def main():
    duration = 13.5
    audio = synth_speech_like(duration)
    # padded chunk like the pipeline: +2s reflect pads + bucket
    a = np.pad(audio, (16000, 16000), mode="reflect").astype(np.float32)

    rmvpe = RMVPE(seed=0)
    audio_j = jnp.asarray(a)[None]

    mel_j = jax.jit(rmvpe.mel)
    mel = mel_j(audio_j)
    print("mel frames:", mel.shape, flush=True)
    timed("mel frontend", lambda: mel_j(audio_j))

    # pad to %32 like mel2hidden
    T = mel.shape[1]
    pad = (-T) % 32
    melp = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)), mode="reflect") if pad else mel

    model, variables = rmvpe.model, rmvpe.variables

    def unet_only(m, x):
        import flax.linen as fnn
        x = m.unet(x[..., None])
        x = fnn.Conv(3, (3, 3), padding=1, name="cnn")(x) if False else x
        return x
    # time the full E2E vs E2E-without-gru by monkeypatching n_gru
    e2e_j = jax.jit(lambda v, x: model.apply(v, x))
    hidden = e2e_j(variables, melp)
    timed("E2E full (unet+cnn+bigru+fc)", lambda: e2e_j(variables, melp))

    model_nogru = E2E(n_gru=0)
    v_nogru = model_nogru.init(jax.random.PRNGKey(0), melp[:, :64])
    # reuse unet params from the real variables (shapes match)
    import flax
    p = flax.core.unfreeze(v_nogru["params"]) if hasattr(flax.core, "unfreeze") else dict(v_nogru["params"])
    real_p = variables["params"]
    for k in p:
        if k in real_p:
            p[k] = real_p[k]
    v_nogru = {"params": p, **{k: v for k, v in variables.items() if k != "params"}}
    try:
        nogru_j = jax.jit(lambda v, x: model_nogru.apply(v, x))
        nogru_j(v_nogru, melp)
        timed("E2E without BiGRU (unet+cnn+fc)", lambda: nogru_j(v_nogru, melp))
    except Exception as e:
        print("nogru variant failed:", e, flush=True)

    # BiGRU alone on the right shape: (1, T, 3*128=384) -> (1, T, 512)
    M = 3 * 128
    x_g = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, melp.shape[1], M)).astype(np.float32))
    P = variables["params"]
    fwd = {k: P[f"gru_fwd_{k}"] for k in
           ("weight_ih", "weight_hh", "bias_ih", "bias_hh")}
    bwd = {k: P[f"gru_bwd_{k}"] for k in
           ("weight_ih", "weight_hh", "bias_ih", "bias_hh")}
    big_j = jax.jit(lambda x, f, b: bigru(x, f, b))
    big_j(x_g, fwd, bwd)
    timed("BiGRU alone (fused scan)", lambda: big_j(x_g, fwd, bwd))

    dec_j = jax.jit(lambda h: decode_salience(h))
    dec_j(hidden)
    timed("salience decode", lambda: dec_j(hidden))


if __name__ == "__main__":
    main()
