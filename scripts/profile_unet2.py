"""Bisect the RMVPE trunk cost with the REAL modules: DeepUnet alone,
E2E without GRU, E2E full — plus decoder-level synthetic pieces."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.models.rmvpe import DeepUnet, E2E
from rvc_tpu.utils.init_utils import cpu_backend, to_default_device
from rvc_tpu.ops import conv as conv_ops


def timed(name, fn, N=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    jax.block_until_ready(outs)
    per = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:46s} {per:8.3f} ms", flush=True)
    return per


def main():
    T = 1376
    x = jnp.zeros((1, T, 128, 1), jnp.float32)
    mel = jnp.zeros((1, T, 128), jnp.float32)

    unet = DeepUnet()
    with cpu_backend():
        vu = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 1)))
    vu = to_default_device(vu)
    f = jax.jit(lambda v, xx: unet.apply(v, xx))
    timed("DeepUnet alone", lambda: f(vu, x))

    for ngru in (0, 1):
        m = E2E(n_gru=ngru)
        with cpu_backend():
            vm = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128)))
        vm = to_default_device(vm)
        g = jax.jit(lambda v, mm, m_=m: m_.apply(v, mm))
        timed(f"E2E n_gru={ngru}", lambda: g(vm, mel))

    # synthetic decoder levels: convT + 4 res blocks (first takes 2C in)
    rng = jax.random.PRNGKey(0)
    shapes = [(43, 4, 512, 256), (86, 8, 256, 128), (172, 16, 128, 64),
              (344, 32, 64, 32), (688, 64, 32, 16)]
    tot = 0.0
    for (t0_, m0, cin, cout) in shapes:
        xin = jax.random.normal(rng, (1, t0_, m0, cin), jnp.float32)
        skip = jax.random.normal(rng, (1, t0_ * 2, m0 * 2, cout), jnp.float32)
        wT = jax.random.normal(rng, (3, 3, cin, cout)) * 0.01

        def dec(xx, sk, wT=wT, cin=cin, cout=cout):
            h = conv_ops.conv_transpose2d(xx, wT, None, stride=(2, 2),
                                          padding=1, output_padding=1)
            h = jnp.maximum(h * 1.01 + 0.01, 0.0)
            h = jnp.concatenate([h, sk], axis=-1)
            ci = cout * 2
            for b in range(4):
                w1 = jax.random.normal(jax.random.PRNGKey(b), (3, 3, ci, cout)) * 0.01
                h2 = conv_ops.conv2d(h, w1, None, padding=1)
                h2 = jnp.maximum(h2 * 1.01, 0.0)
                w2 = jax.random.normal(jax.random.PRNGKey(b + 9), (3, 3, cout, cout)) * 0.01
                h2 = conv_ops.conv2d(h2, w2, None, padding=1)
                h2 = jnp.maximum(h2 * 1.01, 0.0)
                if ci != cout:
                    h = conv_ops.conv2d(h, jax.random.normal(
                        jax.random.PRNGKey(77), (1, 1, ci, cout)) * 0.1, None)
                h = h2 + h
                ci = cout
            return h

        dj = jax.jit(dec)
        tot += timed(f"dec ({t0_:4d},{m0:3d}) {cin:3d}->{cout:3d}",
                     lambda: dj(xin, skip))
    print(f"synthetic decoder total: {tot:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
