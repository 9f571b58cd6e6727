"""Fused windowed rel-pos attention Pallas kernel (VITS enc_p MHA).

The XLA formulation of VITS rel-pos attention (reference
`rvc_mlx/lib/mlx/attentions.py:112-184`) spends its time in the
rel<->abs "skew" conversions: `relative_to_absolute` /
`absolute_to_relative` pad+flatten+reshape (B, H, T, 2T) buffers, which
lower to full relayouts — measured 2.4-2.6 ms EACH at T=1552 on v5e
(~29 GB/s effective, pure lane shuffling), making one 2-head attention
layer cost 4.4 ms when its matmuls are worth ~0.1 ms.

This kernel computes the whole layer per (batch*head, 128-row q-block):

  scores = q @ k^T                                 (MXU)
  scores += band bias                              (in-kernel: bias is
      nonzero only for |s - t| <= w; applied full-width as 2w+1 masked
      `where(col - row + w == j, band[:, j], 0)` adds — iota-select,
      no skew relayout, no dynamic slicing (Mosaic lowers no
      value-dynamic_slice))
  softmax rows (f32, -1e4 masking at cols >= seq_len, matching the XLA
      path's `where(mask == 0, -1e4)` semantics)
  out = p @ v                                      (MXU)
  bw[t, j] = p[t, t + j - w]                       (same iota-select,
      reduced over columns)

The tiny rel-v contraction `bw @ emb_rel_v` and the band-logit matmul
`q @ emb_rel_k^T` stay in XLA (they are (T, 2w+1)-sized). K/V live in
VMEM whole per head (T<=~8k fits comfortably), so there is no flash
streaming loop — one pass, no (T, T) HBM round trips for p.

Training: `rel_attention` is a custom_vjp whose backward re-runs the
XLA reference under `jax.vjp` (remat-style), exactly like the fused
ResBlock kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NEG = -1e4  # matches the XLA path's mask fill


def _kernel(q_ref, k_ref, v_ref, band_ref, len_ref, out_ref, bw_ref, *,
            w: int, t_pad: int):
    i = pl.program_id(1)
    q = q_ref[0]            # (128, 128) pre-scaled
    kk = k_ref[0]           # (Tpad, 128)
    vv = v_ref[0]           # (Tpad, 128)
    band = band_ref[0]      # (128, 32) f32, cols [0, 2w] valid
    L = len_ref[pl.program_id(0), 0]

    scores = jax.lax.dot_general(
        q, kk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (128, Tpad)

    # band bias: scores[t, s] += band[t, s - t + w] for |s - t| <= w,
    # applied full-width via iota-select (2w+1 masked adds on the VPU)
    rows = jax.lax.broadcasted_iota(jnp.int32, (LANE, t_pad), 0) + i * LANE
    cols = jax.lax.broadcasted_iota(jnp.int32, (LANE, t_pad), 1)
    jw = cols - rows + w                             # (128, Tpad)
    for j in range(2 * w + 1):
        scores = scores + jnp.where(jw == j, band[:, j:j + 1], 0.0)

    scores = jnp.where(cols < L, scores, NEG)

    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)

    out_ref[0] = jnp.dot(p, vv, preferred_element_type=jnp.float32)

    # band weights bw[t, j] = p[t, t + j - w]
    jcol = jax.lax.broadcasted_iota(jnp.int32, (LANE, 32), 1)
    acc = jnp.zeros((LANE, 32), jnp.float32)
    for j in range(2 * w + 1):
        sj = jnp.sum(jnp.where(jw == j, p, 0.0), axis=1, keepdims=True)
        acc = acc + jnp.where(jcol == j, sj, 0.0)
    bw_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("window_size", "interpret"))
def fused_rel_attention(
    q: jax.Array,            # (B, H, T, D)
    k: jax.Array,
    v: jax.Array,
    emb_rel_k: jax.Array,    # (1 | H, 2w+1, D)
    emb_rel_v: jax.Array,
    window_size: int,
    key_lens: jax.Array,     # (B,) int32 valid key count per batch row
    interpret: bool = False,
) -> jax.Array:
    """One fused rel-pos attention layer. Returns (B, H, T, D)."""
    B, H, T, D = q.shape
    w = window_size
    assert 2 * w + 1 <= 32 and D <= LANE
    t_pad = -(-T // LANE) * LANE

    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    qs = (q.astype(jnp.float32) * scale)
    band = jnp.einsum("bhtd,hmd->bhtm", qs,
                      emb_rel_k.astype(jnp.float32))  # (B, H, T, 2w+1)

    def padded(x):
        x = x.astype(jnp.float32)
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - T), (0, LANE - D))
                       ).reshape(B * H, t_pad, LANE)

    qp, kp, vp = padded(qs), padded(k), padded(v)
    bandp = jnp.pad(band, ((0, 0), (0, 0), (0, t_pad - T),
                           (0, 32 - (2 * w + 1)))).reshape(B * H, t_pad, 32)
    lens = jnp.broadcast_to(key_lens.astype(jnp.int32)[:, None],
                            (B, H)).reshape(B * H, 1)

    n_q = t_pad // LANE
    out, bw = pl.pallas_call(
        functools.partial(_kernel, w=w, t_pad=t_pad),
        grid=(B * H, n_q),
        in_specs=[
            pl.BlockSpec((1, LANE, LANE), lambda h, i: (h, i, 0)),
            pl.BlockSpec((1, t_pad, LANE), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((1, t_pad, LANE), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((1, LANE, 32), lambda h, i: (h, i, 0)),
            pl.BlockSpec((B * H, 1), lambda h, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, LANE, LANE), lambda h, i: (h, i, 0)),
            pl.BlockSpec((1, LANE, 32), lambda h, i: (h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, t_pad, LANE), jnp.float32),
            jax.ShapeDtypeStruct((B * H, t_pad, 32), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, bandp, lens)

    out = out.reshape(B, H, t_pad, LANE)[:, :, :T, :D]
    bw = bw.reshape(B, H, t_pad, 32)[:, :, :T, : 2 * w + 1]
    out = out + jnp.einsum("bhtm,hmd->bhtd", bw,
                           emb_rel_v.astype(jnp.float32))
    return out.astype(q.dtype)


def pallas_attention_enabled() -> bool:
    """Default ON for single-chip TPU, OFF elsewhere (interpret mode on
    CPU is slow; multi-chip needs shard_map). RVC_TPU_PALLAS_ATTN=0/1
    overrides."""
    import os

    default = ("1" if jax.default_backend() == "tpu"
               and jax.device_count() == 1 else "0")
    return os.environ.get("RVC_TPU_PALLAS_ATTN", default) == "1"


def _xla_rel_attention(q, k, v, ek, ev, key_mask, *, window_size):
    """Reference XLA path (differentiation semantics of rel_attention)."""
    from rvc_tpu.ops import attention as A

    attn_mask = key_mask[:, None, None, :] * key_mask[:, None, :, None]
    return A.relative_attention_xla(q, k, v, ek, ev, window_size, attn_mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def rel_attention(q, k, v, ek, ev, key_mask, window_size):
    """Differentiable fused rel-pos attention: Pallas forward, XLA
    backward (remat-style), mirroring `resblock_chain`.

    key_mask: (B, T) 1/0 float mask of valid positions. The kernel masks
    invalid KEY columns exactly like the XLA path; masked QUERY rows
    differ (the XLA path softmaxes a fully -1e4 row to uniform, the
    kernel attends over valid keys) — both are garbage rows that every
    caller multiplies away with x_mask.
    """
    key_lens = jnp.sum(key_mask.astype(jnp.int32), axis=-1)
    return fused_rel_attention(q, k, v, ek, ev, window_size, key_lens)


def _fwd(q, k, v, ek, ev, key_mask, window_size):
    return rel_attention(q, k, v, ek, ev, key_mask, window_size), \
        (q, k, v, ek, ev, key_mask)


def _bwd(window_size, res, g):
    q, k, v, ek, ev, key_mask = res
    _, vjp = jax.vjp(
        functools.partial(_xla_rel_attention, window_size=window_size),
        q, k, v, ek, ev, key_mask)
    return vjp(g)


rel_attention.defvjp(_fwd, _bwd)
