"""Trustworthy conv timing on the tunneled chip: CHAINED dispatches —
each call's input depends on the previous call's output, so the queue
cannot collapse identical work and marginal time = true device time.
(Identical-argument deep queues measured impossible >10 PFLOP/s in the
clean completion mode; see profile_conv_c16.py history.)"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N_CONV = 8


def chain_timed(name, fn, x0, N=30):
    x = jax.block_until_ready(fn(x0))  # compile + warm
    x = jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    for _ in range(N):
        x = fn(x)
    jax.block_until_ready(x)
    per = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:52s} {per:8.3f} ms", flush=True)
    return per


def make_stack(w):
    def stack(x):
        h = x
        for i in range(w.shape[0]):
            h = lax.conv_general_dilated(
                h, w[i], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jnp.maximum(h, 0.0)
        # renormalize so the chain neither explodes nor dies
        return h / (jnp.sqrt(jnp.mean(h * h)) + 1e-3)

    return jax.jit(stack)


def main():
    rng = np.random.default_rng(0)
    for c, t, fr in [(16, 896, 128), (32, 896, 128), (64, 896, 128),
                     (128, 896, 128), (16, 448, 64), (32, 448, 64),
                     (256, 56, 8), (512, 28, 4)]:
        w = jnp.asarray(rng.standard_normal((N_CONV, 3, 3, c, c)) * 0.1,
                        jnp.float32)
        x = jnp.asarray(rng.standard_normal((1, t, fr, c)), jnp.float32)
        gf = t * fr * 9 * c * c * 2 * N_CONV / 1e9
        ms = chain_timed(f"C={c:3d} @ {t}x{fr} ({gf:6.1f} GF)",
                         make_stack(w), x)
        print(f"    -> {gf / ms:8.2f} TFLOP/s", flush=True)

    # bf16 variant of the full-res C=16 stage
    w = jnp.asarray(rng.standard_normal((N_CONV, 3, 3, 16, 16)) * 0.1,
                    jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, 896, 128, 16)), jnp.bfloat16)
    chain_timed("C= 16 @ 896x128 bf16", make_stack(w), x)


if __name__ == "__main__":
    main()
