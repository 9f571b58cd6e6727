"""TextEncoder (enc_p) and PosteriorEncoder (enc_q).

Capability parity with `rvc_mlx/lib/mlx/encoders.py` /
`rvc/lib/algorithm/encoders.py`, in canonical (B, T, C) layout:

  TextEncoder: phone(768) -> Linear -> (+ pitch Embedding(256, H)) ->
    *sqrt(H) -> LeakyReLU(0.1) -> n_layers x [rel-pos MHA + LN + FFN + LN]
    -> 1x1 conv -> split into (m_p, logs_p).
  PosteriorEncoder: spec -> 1x1 -> WaveNet(k=5, 16 layers, gin) -> 1x1 ->
    (m, logs); z = m + eps * exp(logs).  Train-only (stripped at export).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rvc_tpu.models.layers import Conv1d, Embedding, LayerNorm, Linear, WaveNet, leaky_relu
from rvc_tpu.ops.attention import relative_attention
from rvc_tpu.ops.commons import sequence_mask


class MultiHeadAttention(nn.Module):
    """Self-attention with windowed relative position embeddings
    (window_size=10, heads share one rel table)."""

    channels: int
    out_channels: int
    n_heads: int
    window_size: int = 10

    @nn.compact
    def __call__(self, x: jax.Array, attn_mask: Optional[jax.Array] = None,
                 key_mask: Optional[jax.Array] = None) -> jax.Array:
        B, T, _ = x.shape
        H, D = self.n_heads, self.channels // self.n_heads
        q = Conv1d(self.channels, self.channels, 1, name="conv_q")(x)
        k = Conv1d(self.channels, self.channels, 1, name="conv_k")(x)
        v = Conv1d(self.channels, self.channels, 1, name="conv_v")(x)

        def split_heads(t):
            return t.reshape(B, T, H, D).transpose(0, 2, 1, 3)

        rel_std = D ** -0.5
        emb_rel_k = self.param("emb_rel_k", nn.initializers.normal(rel_std),
                               (1, 2 * self.window_size + 1, D))
        emb_rel_v = self.param("emb_rel_v", nn.initializers.normal(rel_std),
                               (1, 2 * self.window_size + 1, D))
        out = relative_attention(
            split_heads(q), split_heads(k), split_heads(v),
            emb_rel_k.astype(x.dtype), emb_rel_v.astype(x.dtype),
            self.window_size, attn_mask, key_mask=key_mask,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.channels)
        return Conv1d(self.channels, self.out_channels, 1, name="conv_o")(out)


class FFN(nn.Module):
    """Conv feed-forward with explicit same padding and ReLU."""

    in_channels: int
    out_channels: int
    filter_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array) -> jax.Array:
        pad = (self.kernel_size - 1) // 2
        x = Conv1d(self.in_channels, self.filter_channels, self.kernel_size,
                   padding=pad, name="conv_1")(x * x_mask)
        x = jnp.maximum(x, 0.0)
        x = Conv1d(self.filter_channels, self.out_channels, self.kernel_size,
                   padding=pad, name="conv_2")(x * x_mask)
        return x * x_mask


class AttentionEncoder(nn.Module):
    """Stack of [rel-pos MHA, post-LN, FFN, post-LN] blocks."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    window_size: int = 10

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array) -> jax.Array:
        # x: (B, T, C); x_mask: (B, T, 1)
        m = x_mask[:, :, 0]  # (B, T)
        x = x * x_mask
        for i in range(self.n_layers):
            y = MultiHeadAttention(self.hidden_channels, self.hidden_channels,
                                   self.n_heads,
                                   name=f"attn_layers_{i}")(x, key_mask=m)
            x = LayerNorm(self.hidden_channels, name=f"norm_layers_1_{i}")(x + y)
            y = FFN(self.hidden_channels, self.hidden_channels,
                    self.filter_channels, self.kernel_size, name=f"ffn_layers_{i}")(x, x_mask)
            x = LayerNorm(self.hidden_channels, name=f"norm_layers_2_{i}")(x + y)
        return x * x_mask


class TextEncoder(nn.Module):
    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    embedding_dim: int = 768
    use_f0: bool = True

    @nn.compact
    def __call__(
        self,
        phone: jax.Array,           # (B, T, embedding_dim)
        pitch: Optional[jax.Array],  # (B, T) int coarse pitch or None
        lengths: jax.Array,          # (B,)
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        x = Linear(self.embedding_dim, self.hidden_channels, name="emb_phone")(phone)
        if self.use_f0 and pitch is not None:
            x = x + Embedding(256, self.hidden_channels, name="emb_pitch")(pitch)
        x = x * math.sqrt(self.hidden_channels)
        x = leaky_relu(x, 0.1)

        x_mask = sequence_mask(lengths, x.shape[1])[:, :, None].astype(x.dtype)  # (B, T, 1)
        x = AttentionEncoder(self.hidden_channels, self.filter_channels,
                             self.n_heads, self.n_layers, self.kernel_size,
                             name="encoder")(x, x_mask)
        stats = Conv1d(self.hidden_channels, self.out_channels * 2, 1, name="proj")(x) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        return m, logs, x_mask


class PosteriorEncoder(nn.Module):
    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,         # (B, T, in_channels) linear spectrogram
        x_lengths: jax.Array,  # (B,)
        g: Optional[jax.Array] = None,  # (B, 1, gin)
        *,
        rng: Optional[jax.Array] = None,
    ):
        x_mask = sequence_mask(x_lengths, x.shape[1])[:, :, None].astype(x.dtype)
        h = Conv1d(self.in_channels, self.hidden_channels, 1, name="pre")(x) * x_mask
        h = WaveNet(self.hidden_channels, self.kernel_size, self.dilation_rate,
                    self.n_layers, self.gin_channels, name="enc")(h, x_mask, g=g)
        stats = Conv1d(self.hidden_channels, self.out_channels * 2, 1, name="proj")(h) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        if rng is None:
            rng = self.make_rng("noise")
        eps = jax.random.normal(rng, m.shape, dtype=m.dtype)
        z = (m + eps * jnp.exp(logs)) * x_mask
        return z, m, logs, x_mask
