"""Low-noise A/B of the packed-U-Net knobs: CHAINED e2e dispatches
(each iteration's mel perturbed by the previous salience, so the queue
cannot collapse repeats) across knob combinations, at the production
f0 shape (T=896, mel 128)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.models.rmvpe import RMVPE


def main():
    T = int(os.environ.get("T", "896"))
    rmvpe = RMVPE(seed=0)
    rvars = rmvpe.variables
    rng = np.random.default_rng(0)
    mel0 = jnp.asarray(rng.standard_normal((1, T, 128)).astype(np.float32))

    combos = [
        ("canonical", {"RVC_TPU_PACKED_UNET": "0"}),
        ("blocks only", {"RVC_TPU_PACKED_UNET": "1",
                         "RVC_TPU_PACKED_TC": "0",
                         "RVC_TPU_PACKED_POOL": "0"}),
        ("blocks+pool", {"RVC_TPU_PACKED_UNET": "1",
                         "RVC_TPU_PACKED_TC": "0",
                         "RVC_TPU_PACKED_POOL": "1"}),
        ("blocks+tc", {"RVC_TPU_PACKED_UNET": "1",
                       "RVC_TPU_PACKED_TC": "1",
                       "RVC_TPU_PACKED_POOL": "0"}),
        ("all packed", {"RVC_TPU_PACKED_UNET": "1",
                        "RVC_TPU_PACKED_TC": "1",
                        "RVC_TPU_PACKED_POOL": "1"}),
    ]
    outs = {}
    for name, env in combos:
        os.environ.update(env)
        tag = tuple(sorted(env.items()))
        # host-prepacked when on; device_put ONCE (the production path
        # holds these as persistent packed device buffers)
        rvars = jax.device_put(rmvpe.serving_variables())
        jax.block_until_ready(rvars)
        fn = jax.jit(lambda v, m, _t=tag: rmvpe.model.apply(v, m))

        def step(m):
            h = fn(rvars, m)
            # feed salience back into the next mel (chained dependency)
            return mel0 + 1e-3 * h[:, :, :128], h

        m, h = step(mel0)
        jax.block_until_ready(h)
        outs[name] = np.asarray(h)
        m, h = step(m)
        jax.block_until_ready(h)
        N = 30
        t0 = time.perf_counter()
        for _ in range(N):
            m, h = step(m)
        jax.block_until_ready(h)
        per = (time.perf_counter() - t0) / N * 1e3
        print(f"{name:14s} {per:8.3f} ms", flush=True)

    ref = outs["canonical"]
    for name, h in outs.items():
        print(f"max|d| vs canonical [{name}]: {np.abs(h - ref).max():.2e}",
              flush=True)


if __name__ == "__main__":
    main()
