"""Layout experiment for the RMVPE U-Net's full-resolution stages
(C=16 @ 896x128): the same 3x3 conv stack under different data layouts.

Hypothesis: with C=16 minor, every vector op and memory access wastes
112/128 lanes; putting the 128-wide freq axis minor (NCHW) or packing
freq into channels (space-to-depth) should recover the waste.
"""

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


T, F, C = 896, 128, 16
N_CONV = 8  # two convs per ConvBlockRes x 4 blocks


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N_CONV, 3, 3, C, C)) * 0.1,
                    jnp.float32)  # HWIO
    x_nhwc = jnp.asarray(rng.standard_normal((1, T, F, C)), jnp.float32)

    def conv_nhwc(x, w):
        for i in range(N_CONV):
            x = lax.conv_general_dilated(
                x, w[i], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jnp.maximum(x, 0.0)
        return x

    def conv_nchw(x, w):
        # x: (1, C, T, F) — F=128 minor -> full lanes
        for i in range(N_CONV):
            x = lax.conv_general_dilated(
                x, w[i], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "HWIO", "NCHW"))
            x = jnp.maximum(x, 0.0)
        return x

    # space-to-depth pack=8: (T, F, C) -> (T, F/8, 8*C=128); the dense
    # equivalent conv is (3 time) x (3 group) with C'=128
    P = 8
    Cp = P * C

    def pack(x):
        B, t, f, c = x.shape
        return x.reshape(B, t, f // P, P * c)

    def make_packed_weight(w1):  # (3,3,C,C) -> (3,3,Cp,Cp)
        wp = np.zeros((3, 3, Cp, Cp), np.float32)
        w1 = np.asarray(w1)
        for j in range(P):          # output position in group
            for df in range(3):     # freq tap
                src = j + df - 1
                dg, i = src // P, src % P
                # packed layout: channel index = pos * C + c
                wp[:, dg + 1, i * C:(i + 1) * C, j * C:(j + 1) * C] = \
                    w1[:, df, :, :]
        return jnp.asarray(wp)

    wp = jnp.stack([make_packed_weight(w[i]) for i in range(N_CONV)])

    def conv_packed(xp, wp):
        for i in range(N_CONV):
            xp = lax.conv_general_dilated(
                xp, wp[i], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            xp = jnp.maximum(xp, 0.0)
        return xp

    f_nhwc = jax.jit(conv_nhwc)
    f_nchw = jax.jit(conv_nchw)
    f_pack = jax.jit(conv_packed)

    # correctness: all three must agree
    y0 = np.asarray(f_nhwc(x_nhwc, w))
    y1 = np.asarray(f_nchw(jnp.transpose(x_nhwc, (0, 3, 1, 2)), w))
    y1 = np.transpose(y1, (0, 2, 3, 1))
    xp = pack(x_nhwc)
    y2 = np.asarray(f_pack(xp, wp))
    y2 = y2.reshape(1, T, F // P, P, C).reshape(1, T, F, C)
    print("nchw max err", np.abs(y1 - y0).max(),
          " packed max err", np.abs(y2 - y0).max(), flush=True)

    timed("NHWC  f32 (current)", lambda: f_nhwc(x_nhwc, w))
    x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    timed("NCHW  f32 (freq minor)", lambda: f_nchw(x_nchw, w))
    timed("packed s2d f32 (C'=128)", lambda: f_pack(xp, wp))

    wb = w.astype(jnp.bfloat16)
    wpb = wp.astype(jnp.bfloat16)
    timed("NHWC  bf16", lambda: f_nhwc(x_nhwc.astype(jnp.bfloat16), wb))
    timed("packed s2d bf16", lambda: f_pack(xp.astype(jnp.bfloat16), wpb))

    # C=32 at half res (encoder stage 2 / decoder stage 4)
    x2 = jnp.asarray(rng.standard_normal((1, T // 2, F // 2, 32)),
                     jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((N_CONV, 3, 3, 32, 32)) * 0.1,
                     jnp.float32)
    timed("stage2 NHWC f32 (C=32 @448x64)", lambda: f_nhwc(x2, w2))


if __name__ == "__main__":
    main()
