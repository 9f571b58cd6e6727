"""Benchmark the fused Pallas ResBlock vs the XLA flax ResBlock on TPU.

Shapes are the decoder's real per-stage shapes for a 13.5 s clip
(48k config: upsample rates 12,10,2,2 from 512 initial channels).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from rvc_tpu.models.layers import ResBlock
from rvc_tpu.ops.pallas.resblock import fused_resblock


def stack_params(params, n):
    return (jnp.stack([params[f"convs1_{i}"]["weight"] for i in range(n)]),
            jnp.stack([params[f"convs1_{i}"]["bias"] for i in range(n)]),
            jnp.stack([params[f"convs2_{i}"]["weight"] for i in range(n)]),
            jnp.stack([params[f"convs2_{i}"]["bias"] for i in range(n)]))


def timed(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    import os

    os.environ["RVC_TPU_PALLAS_RESBLOCK"] = "0"  # keep flax apply on XLA
    dil = (1, 3, 5)
    stages = [(16200, 256), (162000, 128), (324000, 64), (648000, 32)]
    rng = np.random.default_rng(0)
    tot_xla = tot_pl = 0.0
    for (T, C) in stages:
        for k in (3, 7, 11):
            net = ResBlock(C, k, dil)
            x = jnp.asarray(rng.standard_normal((1, T, C)), dtype=jnp.float32)
            variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
            apply = jax.jit(lambda v, x: net.apply(v, x))
            t_xla, ref = timed(apply, variables, x)
            w1, b1, w2, b2 = stack_params(variables["params"], len(dil))
            t_pl, got = timed(
                lambda *a: fused_resblock(*a, kernel_size=k, dilations=dil),
                x, w1, b1, w2, b2)
            err = float(jnp.max(jnp.abs(got - ref)))
            corr = np.corrcoef(np.asarray(got).ravel(),
                               np.asarray(ref).ravel())[0, 1]
            tot_xla += t_xla
            tot_pl += t_pl
            print(f"T={T:6d} C={C:3d} k={k:2d}: xla {t_xla*1e3:7.2f} ms  "
                  f"pallas {t_pl*1e3:7.2f} ms  ({t_xla/t_pl:4.2f}x)  "
                  f"maxerr {err:.3e} corr {corr:.6f}", flush=True)
    print(f"TOTAL decoder resblocks: xla {tot_xla*1e3:.1f} ms  "
          f"pallas {tot_pl*1e3:.1f} ms  ({tot_xla/tot_pl:.2f}x)")


if __name__ == "__main__":
    main()
