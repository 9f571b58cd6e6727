"""Core linen layers with torch-exact semantics and transparent param layout.

Parameters are stored in the framework's canonical layouts
(see `rvc_tpu.ops.conv`) under names ``weight`` / ``bias`` so checkpoint
conversion from upstream .pth files is a pure transpose + rename.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from rvc_tpu.ops import conv as conv_ops
from rvc_tpu.ops.commons import fused_add_tanh_sigmoid_multiply

LRELU_SLOPE = 0.1


def leaky_relu(x: jax.Array, slope: float = LRELU_SLOPE) -> jax.Array:
    return jnp.where(x >= 0, x, x * slope)


def _torch_conv_init(fan_in: int) -> Callable:
    bound = 1.0 / (fan_in ** 0.5)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _normal_init(std: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std
    return init


class Conv1d(nn.Module):
    """1-D conv on (B, T, Cin). weight: (K, Cin//groups, Cout)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_init_std: Optional[float] = None  # None => torch uniform default

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = (self.in_channels // self.groups) * self.kernel_size
        w_init = (_normal_init(self.weight_init_std) if self.weight_init_std
                  else _torch_conv_init(fan_in))
        w = self.param(
            "weight", w_init,
            (self.kernel_size, self.in_channels // self.groups, self.out_channels),
        )
        b = self.param("bias", _torch_conv_init(fan_in), (self.out_channels,)) if self.use_bias else None
        return conv_ops.conv1d(
            x, w.astype(x.dtype), None if b is None else b.astype(x.dtype),
            stride=self.stride, padding=self.padding,
            dilation=self.dilation, groups=self.groups,
        )


class ConvTranspose1d(nn.Module):
    """Transposed 1-D conv on (B, T, Cin). weight: (K, Cin, Cout)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    weight_init_std: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = self.in_channels * self.kernel_size
        w_init = (_normal_init(self.weight_init_std) if self.weight_init_std
                  else _torch_conv_init(fan_in))
        w = self.param("weight", w_init,
                       (self.kernel_size, self.in_channels, self.out_channels))
        b = self.param("bias", _torch_conv_init(fan_in), (self.out_channels,)) if self.use_bias else None
        return conv_ops.conv_transpose1d(
            x, w.astype(x.dtype), None if b is None else b.astype(x.dtype),
            stride=self.stride, padding=self.padding,
            output_padding=self.output_padding,
        )


class Conv2d(nn.Module):
    """2-D conv on (B, H, W, Cin). weight: (KH, KW, Cin//groups, Cout)."""

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = conv_ops._pair(self.kernel_size)
        fan_in = (self.in_channels // self.groups) * kh * kw
        w = self.param("weight", _torch_conv_init(fan_in),
                       (kh, kw, self.in_channels // self.groups, self.out_channels))
        b = self.param("bias", _torch_conv_init(fan_in), (self.out_channels,)) if self.use_bias else None
        return conv_ops.conv2d(
            x, w.astype(x.dtype), None if b is None else b.astype(x.dtype),
            stride=self.stride, padding=self.padding,
            dilation=self.dilation, groups=self.groups,
        )


class ConvTranspose2d(nn.Module):
    """Transposed 2-D conv on (B, H, W, Cin). weight: (KH, KW, Cin, Cout)."""

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    output_padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = conv_ops._pair(self.kernel_size)
        fan_in = self.in_channels * kh * kw
        w = self.param("weight", _torch_conv_init(fan_in),
                       (kh, kw, self.in_channels, self.out_channels))
        b = self.param("bias", _torch_conv_init(fan_in), (self.out_channels,)) if self.use_bias else None
        return conv_ops.conv_transpose2d(
            x, w.astype(x.dtype), None if b is None else b.astype(x.dtype),
            stride=self.stride, padding=self.padding,
            output_padding=self.output_padding,
        )


class BatchNorm(nn.Module):
    """Inference-mode batch norm over the channel (last) axis with torch
    running-stat semantics (RMVPE/CREPE ship frozen BN; training updates
    use `use_running_average=False`)."""

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool = True) -> jax.Array:
        scale = self.param("weight", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        ra_mean = self.variable("batch_stats", "running_mean",
                                lambda: jnp.zeros((self.num_features,)))
        ra_var = self.variable("batch_stats", "running_var",
                               lambda: jnp.ones((self.num_features,)))
        xf = x.astype(jnp.float32)  # stats/affine in f32 under bf16 policy
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
            if not self.is_initializing():
                n = x.size // self.num_features
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        inv = jax.lax.rsqrt(var + self.eps)
        out = (xf - mean) * inv * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return out.astype(x.dtype)


class LayerNorm(nn.Module):
    """Channel-last layer norm, torch eps, params named weight/bias."""

    num_features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.num_features,))
        b = self.param("bias", nn.initializers.zeros, (self.num_features,))
        xf = x.astype(jnp.float32)  # stats/affine in f32 under bf16 policy
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps) * w.astype(jnp.float32) \
            + b.astype(jnp.float32)
        return out.astype(x.dtype)


class Embedding(nn.Module):
    num_embeddings: int
    features: int
    init_std: Optional[float] = None

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        init = _normal_init(self.init_std) if self.init_std else nn.initializers.normal(1.0)
        table = self.param("weight", init, (self.num_embeddings, self.features))
        return jnp.take(table, ids, axis=0)


class Linear(nn.Module):
    """Dense layer with torch param layout: weight (Out, In), bias (Out,)."""

    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        init = _torch_conv_init(self.in_features)
        w = self.param("weight", init, (self.out_features, self.in_features))
        out = x @ w.astype(x.dtype).T
        if self.use_bias:
            b = self.param("bias", init, (self.out_features,))
            out = out + b.astype(x.dtype)
        return out


class WaveNet(nn.Module):
    """Gated dilated conv stack with a single shared conditioning layer.

    Semantics of the reference WaveNet (`rvc_mlx/lib/mlx/modules.py:5`):
    per layer, a dilated conv to 2*H channels, a global-conditioning slice
    added pre-gate, tanh*sigmoid gate, then a 1x1 producing residual (H)
    and skip (H) — last layer emits skip only. Output is the masked skip sum.
    """

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array, g: Optional[jax.Array] = None) -> jax.Array:
        H = self.hidden_channels
        output = jnp.zeros_like(x)
        if g is not None:
            g = Conv1d(self.gin_channels, 2 * H * self.n_layers, 1, name="cond_layer")(g)
        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            padding = (self.kernel_size * dilation - dilation) // 2
            x_in = Conv1d(H, 2 * H, self.kernel_size, padding=padding,
                          dilation=dilation, name=f"in_layers_{i}")(x)
            if g is not None:
                g_l = g[:, :, i * 2 * H : (i + 1) * 2 * H]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = fused_add_tanh_sigmoid_multiply(x_in, g_l, H)
            res_skip_channels = 2 * H if i < self.n_layers - 1 else H
            res_skip = Conv1d(H, res_skip_channels, 1, name=f"res_skip_layers_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[:, :, :H]) * x_mask
                output = output + res_skip[:, :, H:]
            else:
                output = output + res_skip
        return output * x_mask


class ResBlock(nn.Module):
    """HiFi-GAN ResBlock type-1: per dilation, LReLU->dilated conv->LReLU->conv
    with residual (`rvc_mlx/lib/mlx/residuals.py:7`)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: Optional[jax.Array] = None) -> jax.Array:
        if x_mask is None and not self.is_initializing():
            from rvc_tpu.ops.pallas.resblock import (
                fused_resblock_enabled,
                resblock_chain,
            )

            if fused_resblock_enabled():
                # params were created by the standard path during init;
                # read them directly and run the fused Pallas chain
                # (custom_vjp: XLA backward, so training still works)
                w1 = jnp.stack([self.scope.get_variable("params", f"convs1_{i}")["weight"]
                                for i in range(len(self.dilations))])
                b1 = jnp.stack([self.scope.get_variable("params", f"convs1_{i}")["bias"]
                                for i in range(len(self.dilations))])
                w2 = jnp.stack([self.scope.get_variable("params", f"convs2_{i}")["weight"]
                                for i in range(len(self.dilations))])
                b2 = jnp.stack([self.scope.get_variable("params", f"convs2_{i}")["bias"]
                                for i in range(len(self.dilations))])
                out = resblock_chain(
                    x.astype(jnp.float32), w1.astype(jnp.float32),
                    b1.astype(jnp.float32), w2.astype(jnp.float32),
                    b2.astype(jnp.float32), self.kernel_size,
                    tuple(self.dilations))
                return out.astype(x.dtype)
        for i, d in enumerate(self.dilations):
            res = x
            x = leaky_relu(x)
            if x_mask is not None:
                x = x * x_mask
            x = Conv1d(self.channels, self.channels, self.kernel_size,
                       padding=(self.kernel_size * d - d) // 2, dilation=d,
                       weight_init_std=0.01, name=f"convs1_{i}")(x)
            x = leaky_relu(x)
            if x_mask is not None:
                x = x * x_mask
            x = Conv1d(self.channels, self.channels, self.kernel_size,
                       padding=(self.kernel_size - 1) // 2,
                       weight_init_std=0.01, name=f"convs2_{i}")(x)
            x = x + res
        if x_mask is not None:
            x = x * x_mask
        return x
