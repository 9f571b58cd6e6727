"""Measure the tunneled-chip link: dispatch RTT, upload and download
bandwidth at several sizes, and pipelined-vs-serial dispatch cost."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, N=10):
    fn()
    t0 = time.perf_counter()
    for _ in range(N):
        fn()
    per = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:52s} {per:8.2f} ms", flush=True)
    return per


def main():
    dev = jax.devices()[0]
    trivial = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8, 128))
    jax.block_until_ready(trivial(x0))
    # dispatch round trip: enqueue one tiny op and block
    t("RTT: trivial jit + block", lambda: jax.block_until_ready(trivial(x0)))

    for kb in (32, 432, 1296, 4096):
        host = np.zeros(kb * 512, np.float16)  # kb KB
        t(f"upload {kb:5d} KB (device_put+block)",
          lambda h=host: jax.block_until_ready(jax.device_put(h, dev)))

    for kb in (32, 432, 1296, 4096):
        arr = jax.block_until_ready(jnp.zeros(kb * 512, jnp.float16))
        def dl(a=arr):
            np.asarray(jax.device_get(a))
        # device_get of the SAME buffer may cache; use fresh buffer per call
        bufs = [jax.block_until_ready(jnp.full(kb * 512, float(i), jnp.float16))
                for i in range(11)]
        it = iter(bufs * 2)
        t(f"download {kb:5d} KB (device_get)",
          lambda: np.asarray(jax.device_get(next(it))), N=10)

    # serial dependent dispatches: k tiny programs chained by data
    f1 = jax.jit(lambda x: x * 1.0001)
    jax.block_until_ready(f1(x0))
    def chain(k):
        y = x0
        for _ in range(k):
            y = f1(y)
        jax.block_until_ready(y)
    t("chain of 1 dispatch", lambda: chain(1))
    t("chain of 2 dispatches", lambda: chain(2))
    t("chain of 8 dispatches", lambda: chain(8))


if __name__ == "__main__":
    main()
