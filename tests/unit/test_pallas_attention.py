"""Fused rel-pos attention Pallas kernel vs the XLA skew formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.ops.attention import relative_attention_xla
from rvc_tpu.ops.pallas.attention import fused_rel_attention


def _case(rng, B, H, T, D, w, lens):
    ks = jax.random.split(jax.random.PRNGKey(rng), 5)
    q = jax.random.normal(ks[0], (B, H, T, D))
    k = jax.random.normal(ks[1], (B, H, T, D))
    v = jax.random.normal(ks[2], (B, H, T, D))
    ek = jax.random.normal(ks[3], (1, 2 * w + 1, D)) * 0.3
    ev = jax.random.normal(ks[4], (1, 2 * w + 1, D)) * 0.3
    key_mask = (jnp.arange(T)[None, :] < jnp.asarray(lens)[:, None]).astype(jnp.float32)
    return q, k, v, ek, ev, key_mask


@pytest.mark.parametrize("B,H,T,D,w,lens", [
    (1, 2, 200, 96, 10, [200]),     # enc_p shape class
    (1, 2, 384, 96, 10, [300]),     # masked tail
    (2, 2, 130, 64, 10, [130, 77]), # per-row lens, T not 128-multiple
    (1, 1, 50, 32, 4, [50]),        # small T (< 3 blocks), small window
])
def test_fused_matches_xla(B, H, T, D, w, lens):
    q, k, v, ek, ev, key_mask = _case(0, B, H, T, D, w, lens)
    attn_mask = key_mask[:, None, None, :] * key_mask[:, None, :, None]
    ref = relative_attention_xla(q, k, v, ek, ev, w, attn_mask)
    key_lens = jnp.sum(key_mask.astype(jnp.int32), -1)
    out = fused_rel_attention(q, k, v, ek, ev, w, key_lens, interpret=True)
    # compare on valid rows only (masked rows are garbage in both paths
    # and are multiplied away by x_mask downstream)
    m = np.asarray(key_mask)[:, None, :, None]
    np.testing.assert_allclose(np.asarray(out) * m, np.asarray(ref) * m,
                               rtol=2e-4, atol=2e-5)


def test_vjp_matches_xla_grads(monkeypatch):
    """rel_attention backward == XLA autodiff (it literally re-runs it)."""
    from rvc_tpu.ops.pallas import attention as PA

    q, k, v, ek, ev, key_mask = _case(1, 1, 2, 64, 32, 4, [60])
    # force the fused forward through interpret so this runs on CPU
    orig = PA.fused_rel_attention
    monkeypatch.setattr(
        PA, "fused_rel_attention",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))

    def f_fused(q, k, v, ek, ev):
        return (PA.rel_attention(q, k, v, ek, ev, key_mask, 4)
                * key_mask[:, None, :, None]).sum()

    def f_xla(q, k, v, ek, ev):
        return (PA._xla_rel_attention(q, k, v, ek, ev, key_mask,
                                      window_size=4)
                * key_mask[:, None, :, None]).sum()

    g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, ek, ev)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2, 3, 4))(q, k, v, ek, ev)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
