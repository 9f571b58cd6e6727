"""Normalizing flow: stacked mean-only residual coupling layers with
channel flips.

Capability parity with `rvc_mlx/lib/mlx/residuals.py:45-143` /
`rvc/lib/algorithm/residuals.py`: forward applies [coupling, flip] x n;
reverse applies [flip, coupling^-1] in reversed layer order (flip BEFORE
the layer in reverse — the ordering subtlety that burned the MLX/Swift
ports; locked in by an inverse-consistency unit test).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rvc_tpu.models.layers import Conv1d, WaveNet


class ResidualCouplingLayer(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 3
    gin_channels: int = 0
    mean_only: bool = True

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(half, self.hidden_channels, 1, name="pre")(x0) * x_mask
        h = WaveNet(self.hidden_channels, self.kernel_size, self.dilation_rate,
                    self.n_layers, self.gin_channels, name="enc")(h, x_mask, g=g)
        stats = Conv1d(self.hidden_channels, half * (2 - self.mean_only),
                       1, use_bias=True, name="post")(h) * x_mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = jnp.split(stats, 2, axis=-1)
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
        else:
            x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 3
    n_flows: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g: Optional[jax.Array] = None, reverse: bool = False):
        layers = [
            ResidualCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size,
                self.dilation_rate, self.n_layers,
                gin_channels=self.gin_channels, mean_only=True,
                name=f"flows_{i}",
            )
            for i in range(self.n_flows)
        ]
        if not reverse:
            for layer in layers:
                x = layer(x, x_mask, g=g, reverse=False)
                x = jnp.flip(x, axis=-1)  # channel flip
        else:
            for layer in reversed(layers):
                x = jnp.flip(x, axis=-1)  # flip BEFORE the layer in reverse
                x = layer(x, x_mask, g=g, reverse=True)
        return x
