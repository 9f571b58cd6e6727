"""Relative-position attention math (VITS-style windowed rel-pos).

Capability parity with `rvc_mlx/lib/mlx/attentions.py:112-184` (itself the
standard VITS formulation): scores get a skewed rel->abs key term, outputs
get an abs->rel value term, embeddings are a (heads, 2*window+1, head_dim)
table sliced/padded per sequence length. All ops here are pad/reshape/
matmul compositions that XLA fuses; no gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_relative_embeddings(emb: jax.Array, length: int, window_size: int) -> jax.Array:
    """Slice the (H, 2w+1, D) table to the (H, 2*length-1, D) band needed."""
    pad_length = max(length - (window_size + 1), 0)
    start = max((window_size + 1) - length, 0)
    if pad_length > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    return emb[:, start : start + 2 * length - 1, :]


def relative_to_absolute(x: jax.Array) -> jax.Array:
    """(B, H, T, 2T-1) rel-indexed logits -> (B, H, T, T) absolute logits."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, t * 2 * t)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, t - 1)))
    x_final = x_flat.reshape(b, h, t + 1, 2 * t - 1)
    return x_final[:, :, :t, t - 1 :]


def absolute_to_relative(x: jax.Array) -> jax.Array:
    """(B, H, T, T) absolute attention -> (B, H, T, 2T-1) rel-indexed."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))
    x_flat = x.reshape(b, h, t * t + t * (t - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (t, 0)))
    x_final = x_flat.reshape(b, h, t, 2 * t)
    return x_final[:, :, :, 1:]


def relative_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    emb_rel_k: jax.Array,
    emb_rel_v: jax.Array,
    window_size: int,
    attn_mask: jax.Array | None = None,
    key_mask: jax.Array | None = None,
) -> jax.Array:
    """Multi-head attention with windowed relative position bias.

    q/k/v: (B, H, T, D); emb_rel_*: (1 or H, 2*window+1, D).
    attn_mask: broadcastable to (B, 1|H, T, T), 1 = attend; key_mask:
    (B, T) per-position validity (enables the fused TPU kernel — the two
    are equivalent when attn_mask is the outer product of key_mask).
    Returns (B, H, T, D).
    """
    if key_mask is not None:
        from rvc_tpu.ops.pallas.attention import (pallas_attention_enabled,
                                                  rel_attention)

        if (pallas_attention_enabled() and 2 * window_size + 1 <= 32
                and q.shape[-1] <= 128):
            # platform_dependent: the Pallas kernel only lowers for TPU;
            # any CPU lowering of the same module (e.g. param init on the
            # CPU backend, tests) silently takes the XLA branch.
            def _pallas(q, k, v, ek, ev, km):
                return rel_attention(q, k, v, ek, ev, km, window_size)

            def _xla(q, k, v, ek, ev, km):
                am = km[:, None, None, :] * km[:, None, :, None]
                return relative_attention_xla(q, k, v, ek, ev,
                                              window_size, am)

            return jax.lax.platform_dependent(
                q, k, v, emb_rel_k, emb_rel_v, key_mask,
                tpu=_pallas, default=_xla)
        if attn_mask is None:
            attn_mask = key_mask[:, None, None, :] * key_mask[:, None, :, None]
    return relative_attention_xla(q, k, v, emb_rel_k, emb_rel_v,
                                  window_size, attn_mask)


def relative_attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    emb_rel_k: jax.Array,
    emb_rel_v: jax.Array,
    window_size: int,
    attn_mask: jax.Array | None = None,
) -> jax.Array:
    """Pure-XLA rel-pos attention (skew formulation)."""
    d = q.shape[-1]
    t = k.shape[2]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=q.dtype))
    scores = jnp.einsum("bhtd,bhsd->bhts", q * scale, k)

    rel_k = get_relative_embeddings(emb_rel_k, t, window_size)
    rel_logits = jnp.einsum("bhtd,hmd->bhtm", q * scale, rel_k)
    scores = scores + relative_to_absolute(rel_logits)

    if attn_mask is not None:
        scores = jnp.where(attn_mask == 0, jnp.asarray(-1e4, dtype=scores.dtype), scores)

    # softmax in f32: bf16 exp/sum over T loses mass on long sequences
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)

    out = jnp.einsum("bhts,bhsd->bhtd", p, v)
    rel_weights = absolute_to_relative(p)
    rel_v = get_relative_embeddings(emb_rel_v, t, window_size)
    out = out + jnp.einsum("bhtm,hmd->bhtd", rel_weights, rel_v)
    return out
