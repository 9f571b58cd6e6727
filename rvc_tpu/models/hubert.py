"""HuBERT / ContentVec content encoder.

Capability parity with `rvc_mlx/lib/mlx/hubert.py` (an HF
hubert-base-style encoder, post-layer-norm variant): 7-layer conv feature
extractor (k=10,3,3,3,3,2,2 / s=5,2,2,2,2,2,2, 512ch, GroupNorm on layer
0 only), LayerNorm+Linear feature projection to 768, grouped-conv
positional embedding (k=128, g=16, crop 1, GELU, residual), 12 post-LN
transformer layers (12 heads), optional 768->256 final projection (v1).

TPU design: the conv stack and attention are plain MXU ops; the whole
encoder jits into one program per frame-bucket. Raw 16 kHz audio in
(B, T_samples) -> features (B, T/320, 768|256).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rvc_tpu.models.layers import Conv1d, LayerNorm, Linear


@dataclass(frozen=True)
class HubertConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-5
    conv_dim: int = 512
    classifier_proj_size: int = 768  # 768 = no projection (v2); 256 = v1
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


_CONV_KERNELS = (10, 3, 3, 3, 3, 2, 2)
_CONV_STRIDES = (5, 2, 2, 2, 2, 2, 2)


class FeatureExtractor(nn.Module):
    """Raw audio (B, T) -> (B, T//320, 512). GroupNorm(512, 512) on layer 0."""

    config: HubertConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x[:, :, None]
        C = self.config.conv_dim
        for i, (k, s) in enumerate(zip(_CONV_KERNELS, _CONV_STRIDES)):
            in_ch = 1 if i == 0 else C
            h = Conv1d(in_ch, C, k, stride=s, use_bias=False,
                       name=f"conv_layers_{i}")(h)
            if i == 0:
                # GroupNorm with num_groups == num_channels: per-channel
                # instance norm over time, with affine params.
                w = self.param("gn_weight", nn.initializers.ones, (C,))
                b = self.param("gn_bias", nn.initializers.zeros, (C,))
                mean = jnp.mean(h, axis=1, keepdims=True)
                var = jnp.var(h, axis=1, keepdims=True)
                h = (h - mean) * jax.lax.rsqrt(var + 1e-5) * w + b
            h = jax.nn.gelu(h, approximate=False)
        return h


class SelfAttention(nn.Module):
    config: HubertConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        c = self.config
        B, T, _ = x.shape
        H, D = c.num_attention_heads, c.head_dim
        q = Linear(c.hidden_size, c.hidden_size, name="q_proj")(x)
        k = Linear(c.hidden_size, c.hidden_size, name="k_proj")(x)
        v = Linear(c.hidden_size, c.hidden_size, name="v_proj")(x)

        def split(t):
            return t.reshape(B, T, H, D).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhtd,bhsd->bhts", split(q) * (D ** -0.5), split(k))
        if mask is not None:
            scores = jnp.where(mask == 0, jnp.asarray(-1e4, scores.dtype), scores)
        p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", p, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, T, c.hidden_size)
        return Linear(c.hidden_size, c.hidden_size, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """Post-LN transformer layer (HF Hubert do_stable_layer_norm=False)."""

    config: HubertConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        c = self.config
        x = LayerNorm(c.hidden_size, c.layer_norm_eps, name="layer_norm")(
            x + SelfAttention(c, name="attention")(x, mask))
        h = Linear(c.hidden_size, c.intermediate_size, name="intermediate_dense")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = Linear(c.intermediate_size, c.hidden_size, name="output_dense")(h)
        return LayerNorm(c.hidden_size, c.layer_norm_eps, name="final_layer_norm")(x + h)


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding: k=128, groups=16, pad 64, crop the
    trailing sample (even kernel), GELU, residual add."""

    config: HubertConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.config
        out = Conv1d(c.hidden_size, c.hidden_size, c.pos_conv_kernel,
                     padding=c.pos_conv_kernel // 2, groups=c.pos_conv_groups,
                     name="conv")(x)
        out = out[:, :-1, :]
        return x + jax.nn.gelu(out, approximate=False)


class HubertModel(nn.Module):
    config: HubertConfig = HubertConfig()

    @nn.compact
    def __call__(
        self,
        input_values: jax.Array,          # (B, T_samples) 16 kHz
        output_hidden_states: bool = True,
        attention_mask: Optional[jax.Array] = None,  # (B, T_frames) 1=valid
    ) -> jax.Array:
        c = self.config
        feats = FeatureExtractor(c, name="feature_extractor")(input_values)
        h = LayerNorm(c.conv_dim, c.layer_norm_eps, name="fp_layer_norm")(feats)
        h = Linear(c.conv_dim, c.hidden_size, name="fp_projection")(h)

        h = PositionalConvEmbedding(c, name="pos_conv_embed")(h)
        h = LayerNorm(c.hidden_size, c.layer_norm_eps, name="encoder_layer_norm")(h)

        mask4 = None
        if attention_mask is not None:
            m = attention_mask.astype(h.dtype)
            mask4 = (m[:, None, None, :] * m[:, None, :, None])
            h = h * m[:, :, None]
        for i in range(c.num_hidden_layers):
            h = EncoderLayer(c, name=f"layers_{i}")(h, mask4)

        if output_hidden_states or c.classifier_proj_size == c.hidden_size:
            return h
        return Linear(c.hidden_size, c.classifier_proj_size, name="final_proj")(h)
