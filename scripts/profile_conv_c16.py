"""Isolate the C=16 full-res conv pathology: same 8-conv ReLU stack
across (channels, spatial) combinations, plus channel-padded variants
(C=16 zero-padded to 32/64 — numerically exact for the valid slice)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(name, fn, N=30):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    jax.block_until_ready(outs)
    per = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:46s} {per:8.3f} ms", flush=True)
    return per


N_CONV = 8


def make(c, t, f, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((N_CONV, 3, 3, c, c)) * 0.1,
                    jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, t, f, c)), jnp.float32)
    return x, w


def stack(x, w):
    for i in range(w.shape[0]):
        x = lax.conv_general_dilated(
            x, w[i], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jnp.maximum(x, 0.0)
    return x


def main():
    f = jax.jit(stack)
    for c, t, fr in [(16, 896, 128), (32, 896, 128), (64, 896, 128),
                     (128, 896, 128), (16, 448, 64), (32, 448, 64),
                     (16, 896, 64), (16, 448, 128), (8, 896, 128),
                     (16, 895, 128), (16, 896, 127)]:
        x, w = make(c, t, fr)
        gf = t * fr * 9 * c * c * 2 * N_CONV / 1e9
        ms = timed(f"C={c:3d} @ {t}x{fr} ({gf:5.1f} GF)",
                   lambda x=x, w=w: f(x, w))
        print(f"    -> {gf / ms:8.2f} TFLOP/s", flush=True)

    # channel-padded exactness + cost: C=16 data inside a C=32 conv
    x16, w16 = make(16, 896, 128)
    w32 = jnp.zeros((N_CONV, 3, 3, 32, 32), jnp.float32)
    w32 = w32.at[:, :, :, :16, :16].set(w16)
    x32 = jnp.pad(x16, ((0, 0), (0, 0), (0, 0), (0, 16)))
    y16 = np.asarray(f(x16, w16))
    y32 = np.asarray(f(x32, w32))[:, :, :, :16]
    print("pad-to-32 max err:", np.abs(y32 - y16).max(), flush=True)
    timed("C=16 padded to 32 @ 896x128", lambda: f(x32, w32))

    # batch-reshaped: fold T into batch to shrink spatial (T 896->112, B 8)
    # NOT exact at tile borders (no halo) — timing probe only
    xb = x16.reshape(8, 112, 128, 16)
    timed("C=16 @ B8x112x128 (probe)", lambda: f(xb, w16))


if __name__ == "__main__":
    main()
