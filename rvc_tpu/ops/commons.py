"""Shared small ops: masks, WaveNet gate, segment slicing.

Capability parity with the reference's commons layer
(`rvc_mlx/lib/mlx/commons.py`), redesigned for XLA: segment slicing is a
vmapped `lax.dynamic_slice` (one fused gather per batch) instead of a
python loop, and the WaveNet gate is written so XLA fuses it into the
surrounding convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """(B,) lengths -> (B, max_length) float mask (1.0 inside, 0.0 outside)."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return (pos[None, :] < lengths[:, None]).astype(jnp.float32)


def fused_add_tanh_sigmoid_multiply(a: jax.Array, b: jax.Array, n_channels: int) -> jax.Array:
    """WaveNet gate: split last dim into (tanh | sigmoid) halves and multiply.

    Inputs are (B, T, 2*n_channels); output (B, T, n_channels). XLA fuses
    the add/tanh/sigmoid/multiply chain into one elementwise kernel.
    """
    x = a + b
    t_act = jnp.tanh(x[..., :n_channels])
    s_act = jax.nn.sigmoid(x[..., n_channels:])
    return t_act * s_act


def slice_segments(x: jax.Array, ids_str: jax.Array, segment_size: int) -> jax.Array:
    """Per-row dynamic time slice.

    x: (B, T, C) or (B, T); ids_str: (B,) int start frames.
    Returns (B, segment_size, C) / (B, segment_size).
    """
    if x.ndim == 2:
        def one(row, s):
            return lax.dynamic_slice(row, (s,), (segment_size,))
    else:
        C = x.shape[-1]

        def one(row, s):
            return lax.dynamic_slice(row, (s, 0), (segment_size, C))

    return jax.vmap(one)(x, ids_str)


def rand_slice_segments(
    x: jax.Array,
    x_lengths: jax.Array,
    segment_size: int,
    rng: jax.Array,
):
    """Random per-row time slice for GAN segment training.

    Returns (segments, ids_str). Start indices are uniform in
    [0, len - segment_size] per row (clamped at 0 for short rows).
    """
    B = x.shape[0]
    max_starts = jnp.maximum(x_lengths - segment_size, 0)
    u = jax.random.uniform(rng, (B,))
    ids_str = (u * (max_starts + 1).astype(jnp.float32)).astype(jnp.int32)
    ids_str = jnp.minimum(ids_str, max_starts.astype(jnp.int32))
    return slice_segments(x, ids_str, segment_size), ids_str


def convert_pad_shape(pad_shape):
    """[[a,b],[c,d]] (last-dim-first, torch F.pad order) -> jnp.pad order."""
    return tuple(tuple(p) for p in pad_shape[::-1])
