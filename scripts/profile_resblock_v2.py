"""A/B of the roll-based fused resblock-group inner loop vs a slice-fed
variant (activations stored once per conv into a zero-margined VMEM
scratch, shifts read as static slices, optionally concatenated into one
wide matmul per conv).

RESULT (v5e, 2026-08-19): the slice-fed variant was 0.85-0.92x (SLOWER)
at every decoder stage shape with bit-identical outputs — Mosaic's
`pltpu.roll` of the f32 product is cheaper than a scratch store + J
slice copies, and the kernels sit near their packed-MXU bound already.
The roll-based loop stays; the variant was removed (this script then
measures v1 against itself and is kept as the record of the experiment
plus a stage-shape timing harness)."""

import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.ops.pallas import resblock as rb

RB_K = (3, 7, 11)
RB_D = ((1, 3, 5),) * 3


def timed(fn, N=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / N * 1e3


def main():
    rng = jax.random.PRNGKey(0)
    stages = [(256, 16320), (128, 163200), (64, 326400), (32, 652800)]
    for C, T in stages:
        weights = []
        for kk in RB_K:
            w1 = jax.random.normal(rng, (3, kk, C, C)) * (0.3 / kk / C) ** 0.5
            b1 = jnp.zeros((3, C))
            w2 = jax.random.normal(rng, (3, kk, C, C)) * (0.3 / kk / C) ** 0.5
            b2 = jnp.zeros((3, C))
            weights += [w1, b1, w2, b2]
        weights = tuple(weights)
        x = jax.random.normal(rng, (1, T, C), jnp.float32)

        res = {}
        for mode in ("0", "1"):
            os.environ["RVC_TPU_RESBLOCK_V2"] = mode
            rb.fused_resblock_group.clear_cache()
            fn = jax.jit(lambda xx: rb.fused_resblock_group(
                xx, weights, RB_K, RB_D))
            out = np.asarray(fn(x))
            res[mode] = (timed(lambda: fn(x)), out)
        err = float(np.abs(res["0"][1] - res["1"][1]).max())
        print(f"stage C={C:4d} T={T:6d}: v1 {res['0'][0]:7.3f} ms  "
              f"v2 {res['1'][0]:7.3f} ms  "
              f"({res['0'][0]/res['1'][0]:.2f}x)  max|d|={err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
