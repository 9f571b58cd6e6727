"""Layout effects on tunnel transfers: (1, N) row-vector vs flat (N,)
uploads/downloads, and reshape-on-device alternatives."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, N=10, pipelined=True):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    if pipelined:
        outs = [fn() for _ in range(N)]
        jax.block_until_ready(outs)
    else:
        for _ in range(N):
            r = fn()
            if hasattr(r, "block_until_ready"):
                jax.block_until_ready(r)
    per = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:52s} {per:8.2f} ms", flush=True)
    return per


def main():
    dev = jax.devices()[0]
    N = 248000
    h1 = np.zeros((1, N), np.float16)
    hf = np.zeros((N,), np.float16)
    t("upload (1, 248000) f16", lambda: jax.device_put(h1, dev))
    t("upload (248000,) f16", lambda: jax.device_put(hf, dev))
    h8 = np.zeros((8, N), np.float16)
    t("upload (8, 248000) f16", lambda: jax.device_put(h8, dev))
    h2d = np.zeros((N // 1000, 1000), np.float16)
    t("upload (248, 1000) f16", lambda: jax.device_put(h2d, dev))

    up = jax.jit(lambda x: x[None].astype(jnp.float32) * 2.0)
    t("upload flat + reshape-in-jit", lambda: up(jax.device_put(hf, dev)))

    M = 648000
    mk1 = jax.jit(lambda s: jnp.full((1, M), s, jnp.float16))
    mkf = jax.jit(lambda s: jnp.full((M,), s, jnp.float16))
    seeds = iter(np.arange(100, dtype=np.float32))
    t("fetch (1, 648000) f16 output", lambda: np.asarray(mk1(next(seeds))),
      pipelined=False)
    t("fetch (648000,) f16 output", lambda: np.asarray(mkf(next(seeds))),
      pipelined=False)


if __name__ == "__main__":
    main()
