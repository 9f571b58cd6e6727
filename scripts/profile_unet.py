"""RMVPE DeepUnet per-level timing at the 13.5 s shape (T=1376, M=128):
which encoder/decoder levels hold the 11 ms."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.ops import conv as conv_ops


def timed(name, fn, N=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    jax.block_until_ready(outs)
    per = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:44s} {per:8.3f} ms", flush=True)
    return per


def level(rng, T, M, cin, cout, n_blocks=4):
    """One ResEncoderBlock-equivalent: n_blocks x (2 convs + affine)."""
    x = jax.random.normal(rng, (1, T, M, cin), jnp.float32)

    def f(x):
        ci = cin
        for b in range(n_blocks):
            w1 = jnp.zeros((3, 3, ci, cout)) + 0.01
            h = conv_ops.conv2d(x, w1, None, padding=1)
            h = jnp.maximum(h * 1.01 + 0.001, 0.0)  # BN-affine + relu
            w2 = jnp.zeros((3, 3, cout, cout)) + 0.01
            h = conv_ops.conv2d(h, w2, None, padding=1)
            h = jnp.maximum(h * 1.01 + 0.001, 0.0)
            if ci != cout:
                x = conv_ops.conv2d(x, jnp.zeros((1, 1, ci, cout)) + 0.01, None)
            x = h + x
            ci = cout
        return x

    return timed(f"enc ({T:5d},{M:3d}) {cin:3d}->{cout:3d} x{n_blocks}",
                 lambda: jax.jit(f)(x))


def main():
    rng = jax.random.PRNGKey(0)
    total = 0.0
    total += level(rng, 1376, 128, 1, 16)
    total += level(rng, 688, 64, 16, 32)
    total += level(rng, 344, 32, 32, 64)
    total += level(rng, 172, 16, 64, 128)
    total += level(rng, 86, 8, 128, 256)
    total += level(rng, 43, 4, 256, 512)       # = 1 of 4 inter layers
    print(f"enc+1 inter total: {total:.2f} ms (x4 inter, + mirrored dec)",
          flush=True)


if __name__ == "__main__":
    main()
