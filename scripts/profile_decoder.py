"""Per-piece timing of the NSF-HiFiGAN decoder at the 13.5 s-clip shape:
sine source, conv_pre, and each stage's (upsample conv-T, noise conv,
fused resblock group). Pipelined x10 per piece."""

import os, sys, time, math
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.ops import conv as conv_ops
from rvc_tpu.ops.pallas.resblock import fused_resblock, fused_resblock_group
from rvc_tpu.models.generators import sine_source


def timed(name, fn, N=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    jax.block_until_ready(outs)
    per = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:46s} {per:8.3f} ms", flush=True)
    return per


def main():
    T = 1360  # padded frame count for 13.5 s + 2 s pad, bucketed
    rates = [12, 10, 2, 2]
    ksz = [24, 20, 4, 4]
    uic = 512
    chans = [uic // 2 ** (i + 1) for i in range(4)]  # 256,128,64,32
    rb_k = (3, 7, 11)
    rb_d = ((1, 3, 5),) * 3
    upp = math.prod(rates)
    rng = jax.random.PRNGKey(0)

    f0 = jnp.full((1, T), 220.0)
    src_fn = jax.jit(lambda f: sine_source(f, upp, 48000)[0])
    timed("sine source (T*480)", lambda: src_fn(f0))
    har = src_fn(f0)

    x0 = jax.random.normal(rng, (1, T, 192), jnp.float32)
    wpre = jax.random.normal(rng, (7, 192, uic)) * 0.02
    pre_fn = jax.jit(lambda x: conv_ops.conv1d(x, wpre, None, padding=3))
    timed("conv_pre (192->512, k7)", lambda: pre_fn(x0))

    total = 0.0
    x = jax.random.normal(rng, (1, T, uic), jnp.float32)
    cur_T = T
    for i, (u, k) in enumerate(zip(rates, ksz)):
        in_ch = uic // 2 ** i
        co = chans[i]
        pad = (k - u) // 2 if u % 2 == 0 else u // 2 + u % 2
        op = u % 2
        w = jax.random.normal(rng, (k, in_ch, co)) * 0.01
        xin = jax.random.normal(rng, (1, cur_T, in_ch), jnp.float32)
        up_fn = jax.jit(lambda xx, ww=w, uu=u, pp=pad, oo=op: conv_ops.conv_transpose1d(
            jnp.where(xx > 0, xx, 0.1 * xx), ww, None, stride=uu, padding=pp,
            output_padding=oo))
        total += timed(f"stage{i} convT ({in_ch}->{co}, x{u})", lambda: up_fn(xin))
        cur_T *= u

        stride_f0 = math.prod(rates[i + 1:]) if i + 1 < 4 else 1
        nk = 1 if stride_f0 == 1 else stride_f0 * 2 - stride_f0 % 2
        npad = 0 if stride_f0 == 1 else (nk - stride_f0) // 2
        wn = jax.random.normal(rng, (nk, 1, co)) * 0.01
        nz_fn = jax.jit(lambda h, ww=wn, ss=stride_f0, pp=npad: conv_ops.conv1d(
            h, ww, None, stride=ss, padding=pp))
        total += timed(f"stage{i} noise_conv (s{stride_f0})", lambda: nz_fn(har))

        xs = jax.random.normal(rng, (1, cur_T, co), jnp.float32)
        # match the model's dispatch (generators._stage_resblocks): the
        # group kernel handles pack*C' <= 256, i.e. every NSF stage
        # including C=256 stage 0
        if co * max(1, 128 // min(co, 128)) <= 256:
            weights = []
            for kk in rb_k:
                w1 = jax.random.normal(rng, (3, kk, co, co)) * 0.01
                b1 = jnp.zeros((3, co))
                w2 = jax.random.normal(rng, (3, kk, co, co)) * 0.01
                b2 = jnp.zeros((3, co))
                weights += [w1, b1, w2, b2]
            grp = jax.jit(lambda xx, ws=tuple(weights): fused_resblock_group(
                xx, ws, rb_k, rb_d))
            total += timed(f"stage{i} resblock group (C={co}, T={cur_T})",
                           lambda: grp(xs))
        else:
            per = 0.0
            for kk in rb_k:
                w1 = jax.random.normal(rng, (3, kk, co, co)) * 0.01
                b1 = jnp.zeros((3, co))
                w2 = jax.random.normal(rng, (3, kk, co, co)) * 0.01
                b2 = jnp.zeros((3, co))
                f = jax.jit(lambda xx, a=w1, b=b1, c=w2, d=b2, K=kk:
                            fused_resblock(xx, a, b, c, d, K, (1, 3, 5)))
                per += timed(f"stage{i} resblock k{kk} (C={co}, T={cur_T})",
                             lambda: f(xs))
            total += per

    wpost = jax.random.normal(rng, (7, chans[-1], 1)) * 0.02
    post_fn = jax.jit(lambda x: jnp.tanh(conv_ops.conv1d(
        jnp.where(x > 0, x, 0.01 * x), wpost, None, padding=3)))
    xl = jax.random.normal(rng, (1, cur_T, chans[-1]), jnp.float32)
    total += timed("conv_post + tanh", lambda: post_fn(xl))
    print(f"stages+post total: {total:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
