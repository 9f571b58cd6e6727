"""Microbenchmark of enc_p/flow constituent ops at the real 13.5 s-clip
shapes (T=1552, C=192) to find where the 35 ms goes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.ops import conv as conv_ops
from rvc_tpu.ops.attention import relative_attention


def timed(name, fn, N=50):
    fn().block_until_ready()
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    jax.block_until_ready(outs)
    print(f"{name:44s} {(time.perf_counter()-t0)/N*1e3:8.3f} ms/call")


def main():
    T = 1552
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    x192 = jax.random.normal(ks[0], (1, T, 192))
    w_1x1 = jax.random.normal(ks[1], (1, 192, 384)) * 0.02
    w_k5 = jax.random.normal(ks[2], (5, 192, 384)) * 0.02
    w_k3 = jax.random.normal(ks[3], (3, 192, 768)) * 0.02
    b384 = jnp.zeros(384)

    c1 = jax.jit(lambda x, w: conv_ops.conv1d(x, w, b384))
    timed("conv1x1 (1,1552,192)->384", lambda: c1(x192, w_1x1))

    c5 = jax.jit(lambda x, w: conv_ops.conv1d(x, w, b384, padding=2))
    timed("conv k=5 (1,1552,192)->384", lambda: c5(x192, w_k5))

    c5d = jax.jit(lambda x, w: conv_ops.conv1d(x, w, b384, padding=4, dilation=2))
    timed("conv k=5 d=2 (1,1552,192)->384", lambda: c5d(x192, w_k5))

    c3 = jax.jit(lambda x, w: conv_ops.conv1d(x, w, jnp.zeros(768), padding=1))
    timed("conv k=3 (1,1552,192)->768 (FFN)", lambda: c3(x192, w_k3))

    # batched version of the same conv
    x192b = jnp.broadcast_to(x192, (8, T, 192))
    timed("conv k=5 B=8", lambda: c5(x192b, w_k5), N=20)

    # matmul equivalent of conv k=5: 5 shifted matmuls
    def conv_as_matmul(x, w):
        out = jnp.zeros((x.shape[0], x.shape[1], w.shape[2]), jnp.float32)
        xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)))
        for tau in range(5):
            out = out + jnp.einsum(
                "btc,cd->btd", jax.lax.dynamic_slice_in_dim(xp, tau, x.shape[1], 1),
                w[tau], preferred_element_type=jnp.float32)
        return out
    cm = jax.jit(conv_as_matmul)
    timed("conv k=5 as 5 shifted matmuls", lambda: cm(x192, w_k5))

    # attention layer at enc_p shape
    q = jax.random.normal(ks[4], (1, 2, T, 96))
    emb = jax.random.normal(ks[5], (1, 21, 96)) * 0.1
    att = jax.jit(lambda q, e: relative_attention(q, q, q, e, e, 10))
    timed("rel-pos attention (T=1552, 2 heads)", lambda: att(q, emb))

    # layernorm
    ln = jax.jit(lambda x: (x - x.mean(-1, keepdims=True))
                 / jnp.sqrt(x.var(-1, keepdims=True) + 1e-5))
    timed("layernorm (1,1552,192)", lambda: ln(x192))

    # full modules
    from rvc_tpu.models.encoders import TextEncoder
    from rvc_tpu.models.flow import ResidualCouplingBlock
    enc = TextEncoder(out_channels=192, hidden_channels=192,
                      filter_channels=768, n_heads=2, n_layers=6,
                      kernel_size=3)
    ph = jax.random.normal(ks[6], (1, T, 768))
    pi = jnp.full((1, T), 128, dtype=jnp.int32)
    lens = jnp.array([T])
    ev = enc.init(ks[7], ph, pi, lens)
    ej = jax.jit(lambda v, ph, pi, l: enc.apply(v, ph, pi, l))
    timed("TextEncoder full (6 layers)", lambda: ej(ev, ph, pi, lens), N=20)

    flow = ResidualCouplingBlock(192, 192, 5, 1, 3, gin_channels=256)
    xf = jax.random.normal(ks[8], (1, T, 192))
    mask = jnp.ones((1, T, 1))
    g = jax.random.normal(ks[9], (1, 1, 256))
    fv = flow.init(key, xf, mask, g=g, reverse=True)
    fj = jax.jit(lambda v, x, m, g: flow.apply(v, x, m, g=g, reverse=True))
    timed("Flow full (4 couplings, reverse)", lambda: fj(fv, xf, mask, g), N=20)


if __name__ == "__main__":
    main()
