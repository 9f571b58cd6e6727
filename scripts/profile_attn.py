"""Isolate the rel-pos attention cost at T=1552: chain each variant
x10 inside ONE jit so tunnel dispatch cannot mask device time."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rvc_tpu.ops.attention import (absolute_to_relative,
                                   get_relative_embeddings,
                                   relative_attention,
                                   relative_to_absolute)


def timed(name, fn, N=5, reps=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    jax.block_until_ready(outs)
    per = (time.perf_counter() - t0) / N / reps * 1e3
    print(f"{name:46s} {per:8.3f} ms/op")


def main():
    T = 1552
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (1, 2, T, 96))
    emb = jax.random.normal(ks[1], (1, 21, 96)) * 0.1
    mask = jnp.ones((1, 1, T, T))

    def chain(f, reps=10):
        @jax.jit
        def run(q):
            x = q
            for _ in range(reps):
                x = f(x) * 0.5 + q
            return x
        return run

    full = chain(lambda x: relative_attention(x, x, x, emb, emb, 10, mask))
    timed("rel-pos attention (full)", lambda: full(q))

    def plain_att(x):
        scores = jnp.einsum("bhtd,bhsd->bhts", x / jnp.sqrt(96.0), x)
        p = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhts,bhsd->bhtd", p, x)
    pl = chain(plain_att)
    timed("plain attention (no rel)", lambda: pl(q))

    def rel_k_term(x):
        rel_k = get_relative_embeddings(emb, T, 10)
        rl = jnp.einsum("bhtd,hmd->bhtm", x, rel_k)
        sc = relative_to_absolute(rl)
        return jnp.einsum("bhts,bhsd->bhtd", jax.nn.softmax(sc, -1), x)
    rk = chain(rel_k_term)
    timed("rel-k term (pad-einsum + rel2abs)", lambda: rk(q))

    def rel_v_term(x):
        scores = jnp.einsum("bhtd,bhsd->bhts", x / jnp.sqrt(96.0), x)
        p = jax.nn.softmax(scores, axis=-1)
        rw = absolute_to_relative(p)
        rel_v = get_relative_embeddings(emb, T, 10)
        return jnp.einsum("bhtm,hmd->bhtd", rw, rel_v)
    rv = chain(rel_v_term)
    timed("rel-v term (abs2rel + pad-einsum)", lambda: rv(q))

    # banded alternatives: only the 21-wide band is nonzero
    def band_rel_k(x):
        # (B,H,T,21) logits for offsets -10..10, skewed into (T,T)
        rl = jnp.einsum("bhtd,hmd->bhtm", x, emb)      # (B,H,T,21)
        b, h, t, m = rl.shape
        w = (m - 1) // 2
        # rows shift by one per t: pad cols to t+m, flatten, reshape
        xpad = jnp.pad(rl, ((0, 0), (0, 0), (0, 0), (0, t)))  # (B,H,T,21+T)
        flat = xpad.reshape(b, h, t * (m + t))
        flat = flat[:, :, : t * (m + t - 1)]
        sk = flat.reshape(b, h, t, m + t - 1)           # row t shifted left by t
        sc = sk[:, :, :, w : w + t]                      # hmm placeholder slice
        return jnp.einsum("bhts,bhsd->bhtd", jax.nn.softmax(sc, -1), x)
    bk = chain(band_rel_k)
    timed("banded rel-k (skew trick)", lambda: bk(q))

    # softmax alone
    s = jax.random.normal(ks[2], (1, 2, T, T))
    sm = chain(lambda x: jax.nn.softmax(x, -1), reps=10)
    timed("softmax (1,2,T,T)", lambda: sm(s))

    r2a = chain(lambda x: relative_to_absolute(
        jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, T - 1))))[..., :T], reps=10)
    timed("relative_to_absolute (pad+reshape)", lambda: r2a(s))

    a2r = chain(lambda x: absolute_to_relative(x)[..., :T], reps=10)
    timed("absolute_to_relative", lambda: a2r(s))


if __name__ == "__main__":
    main()
