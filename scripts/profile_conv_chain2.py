"""Chained A/B of stage-1 conv-stack layouts (see profile_conv_chain.py
for why chaining): NHWC baseline vs NCHW, space-to-depth packed C'=128,
zero-channel-padded C=32/64, and a (T,C,F) feature-middle layout.
All ~1.1 ms per-execute tunnel floor — compare DELTAS between rows."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N_CONV = 8
T, F, C = 896, 128, 16


def chain_timed(name, fn, x0, N=30):
    x = jax.block_until_ready(fn(x0))
    x = jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    for _ in range(N):
        x = fn(x)
    jax.block_until_ready(x)
    per = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:52s} {per:8.3f} ms", flush=True)
    return per


def norm(h):
    return h / (jnp.sqrt(jnp.mean(h * h)) + 1e-3)


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N_CONV, 3, 3, C, C)) * 0.1,
                    jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, T, F, C)), jnp.float32)

    def stack_nhwc(x):
        h = x
        for i in range(N_CONV):
            h = lax.conv_general_dilated(
                h, w[i], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jnp.maximum(h, 0.0)
        return norm(h)

    def stack_nchw(x):  # x: (1, C, T, F)
        h = x
        for i in range(N_CONV):
            h = lax.conv_general_dilated(
                h, w[i], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "HWIO", "NCHW"))
            h = jnp.maximum(h, 0.0)
        return norm(h)

    # feature-middle (1, T, C, F): spatial dims 1 and 3, features dim 2
    dn_mid = lax.conv_dimension_numbers(
        (1, T, C, F), (3, 3, C, C),
        (("NHCW"), ("HWIO"), ("NHCW")))

    def stack_mid(x):
        h = x
        for i in range(N_CONV):
            h = lax.conv_general_dilated(
                h, w[i], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=dn_mid)
            h = jnp.maximum(h, 0.0)
        return norm(h)

    # zero-channel-padded to 32 / 64
    def make_padded(cp):
        wp = jnp.zeros((N_CONV, 3, 3, cp, cp), jnp.float32)
        wp = wp.at[:, :, :, :C, :C].set(w)

        def stack(x):
            h = x
            for i in range(N_CONV):
                h = lax.conv_general_dilated(
                    h, wp[i], (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h = jnp.maximum(h, 0.0)
            return norm(h)

        return jax.jit(stack)

    # space-to-depth packed: (T, F/8, 128), dense (3,3) conv C'=128
    P = 8
    Cp = P * C

    def make_packed_weight(w1):
        wp = np.zeros((3, 3, Cp, Cp), np.float32)
        w1 = np.asarray(w1)
        for j in range(P):
            for df in range(3):
                src = j + df - 1
                dg, i = src // P, src % P
                wp[:, dg + 1, i * C:(i + 1) * C, j * C:(j + 1) * C] = \
                    w1[:, df, :, :]
        return wp

    wpk = jnp.asarray(np.stack([make_packed_weight(w[i])
                                for i in range(N_CONV)]))

    def stack_packed(xp):
        h = xp
        for i in range(N_CONV):
            h = lax.conv_general_dilated(
                h, wpk[i], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jnp.maximum(h, 0.0)
        return norm(h)

    chain_timed("NHWC f32 (current)", jax.jit(stack_nhwc), x)
    chain_timed("NCHW f32", jax.jit(stack_nchw),
                jnp.transpose(x, (0, 3, 1, 2)))
    chain_timed("feature-middle (T,C,F) f32", jax.jit(stack_mid),
                jnp.transpose(x, (0, 1, 3, 2)))
    chain_timed("padded C=32 f32", make_padded(32),
                jnp.pad(x, ((0, 0),) * 3 + ((0, 16),)))
    chain_timed("padded C=64 f32", make_padded(64),
                jnp.pad(x, ((0, 0),) * 3 + ((0, 48),)))
    chain_timed("packed s2d C'=128 f32", jax.jit(stack_packed),
                x.reshape(1, T, F // P, Cp))
    wb = wpk.astype(jnp.bfloat16)

    def stack_packed_bf16(xp):
        h = xp
        for i in range(N_CONV):
            h = lax.conv_general_dilated(
                h, wb[i], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jnp.maximum(h, 0.0)
        return norm(h)

    chain_timed("packed s2d C'=128 bf16", jax.jit(stack_packed_bf16),
                x.reshape(1, T, F // P, Cp).astype(jnp.bfloat16))


if __name__ == "__main__":
    main()
