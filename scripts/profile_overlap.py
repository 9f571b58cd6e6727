"""Does D2H transfer overlap device compute on the tunneled chip?

Enqueue a long compute on buffer A, then immediately device_get a
precomputed 1.3 MB buffer B. If total ~= compute time, D2H overlaps;
if ~= compute + fetch, the link serializes them."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # ~70 ms of matmul work on v5e: n x (2048x2048 @ 2048x2048)
    w = jnp.ones((2048, 2048), jnp.bfloat16)

    @jax.jit
    def burn(x):
        def body(c, _):
            return jnp.tanh(c @ w), None
        y, _ = jax.lax.scan(body, x, None, length=400)
        return y

    x = jnp.ones((2048, 2048), jnp.bfloat16)
    jax.block_until_ready(burn(x))
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(burn(x))
    t_burn = (time.perf_counter() - t0) / 5 * 1e3
    print(f"burn alone: {t_burn:.1f} ms", flush=True)

    bufs = [jax.block_until_ready(jnp.full(1296 * 512, float(i), jnp.float16))
            for i in range(12)]
    it = iter(bufs * 3)
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(jax.device_get(next(it)))
    t_fetch = (time.perf_counter() - t0) / 5 * 1e3
    print(f"fetch 1.3MB alone: {t_fetch:.1f} ms", flush=True)

    t0 = time.perf_counter()
    for _ in range(5):
        y = burn(x)          # async enqueue
        np.asarray(jax.device_get(next(it)))  # fetch unrelated buffer
        jax.block_until_ready(y)
    t_both = (time.perf_counter() - t0) / 5 * 1e3
    print(f"burn + concurrent fetch: {t_both:.1f} ms "
          f"(serial would be {t_burn + t_fetch:.1f})", flush=True)

    # and: fetch the burn's own output right after enqueue (the e2e shape)
    big = jax.jit(lambda x: burn(x)[:324, :].astype(jnp.float16).reshape(-1))
    jax.block_until_ready(big(x))
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(big(x))
    t_dep = (time.perf_counter() - t0) / 5 * 1e3
    print(f"burn -> fetch own 1.3MB output: {t_dep:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
