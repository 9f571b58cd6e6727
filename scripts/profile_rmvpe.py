"""f0-program internals: mel kernel, U-Net trunk, BiGRU head, decode —
timed separately at the 13.5 s shape (1376 padded frames)."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.models.rmvpe import RMVPE, E2E, decode_salience
from rvc_tpu.ops.gru import bigru
from rvc_tpu.ops.pallas.melspec import pallas_log_mel


def timed(name, fn, N=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    jax.block_until_ready(outs)
    per = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:40s} {per:8.3f} ms", flush=True)
    return per


def main():
    T = 1376
    rmvpe = RMVPE(seed=0)
    audio = jnp.zeros((1, 248000), jnp.float32)

    mel_fn = jax.jit(lambda a: pallas_log_mel(a, 1024, 160, 128, 16000,
                                              30.0, 8000.0, htk=True))
    timed("pallas mel", lambda: mel_fn(audio))

    mel = jnp.zeros((1, T, 128), jnp.float32)
    full = jax.jit(lambda v, m: rmvpe.model.apply(v, m))
    timed("E2E full (unet+gru+fc)", lambda: full(rmvpe.variables, mel))

    # unet-only: E2E with n_gru=0 reuses the conv params; time a fresh
    # no-gru model of the same trunk shape instead (random weights, same
    # FLOPs)
    from rvc_tpu.utils.init_utils import cpu_backend, to_default_device
    m0 = E2E(n_gru=0)
    with cpu_backend():
        v0 = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128)))
    v0 = to_default_device(v0)
    f0m = jax.jit(lambda v, m: m0.apply(v, m))
    timed("E2E trunk only (n_gru=0)", lambda: f0m(v0, mel))

    x = jnp.zeros((1, T, 384), jnp.float32)
    p = rmvpe.variables["params"]
    fwd = {k: p[f"gru_fwd_{k}"] for k in
           ("weight_ih", "weight_hh", "bias_ih", "bias_hh")}
    bwd = {k: p[f"gru_bwd_{k}"] for k in
           ("weight_ih", "weight_hh", "bias_ih", "bias_hh")}
    g = jax.jit(lambda xx: bigru(xx, fwd, bwd))
    timed("bigru standalone (T=1376)", lambda: g(x))

    # chunk-batched: 4 chunks of 344 (+64 warmup each side), one scan
    for n_chunk, warm in ((2, 64), (4, 64), (8, 64)):
        C = T // n_chunk
        xc = jnp.zeros((n_chunk, C + 2 * warm, 384), jnp.float32)
        gc = jax.jit(lambda xx: bigru(xx, fwd, bwd))
        timed(f"bigru {n_chunk}x{C}+2*{warm} batched", lambda: gc(xc))

    h = jnp.zeros((1, T, 360), jnp.float32)
    d = jax.jit(lambda hh: decode_salience(hh, 0.03))
    timed("decode_salience", lambda: d(h))


if __name__ == "__main__":
    main()
