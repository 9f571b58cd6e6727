"""Multi-Period + Multi-Scale discriminators.

Capability parity with `rvc/lib/algorithm/discriminators.py` /
`rvc_mlx/train/discriminators.py`: DiscriminatorS (grouped 1-D convs,
groups 4/16/64/256) plus DiscriminatorP over periods (v1: 2,3,5,7,11,17;
v2/v3: +23,37), LS-GAN heads, feature maps returned for the
feature-matching loss. Trains with plain weights + gradient guards (the
reference's MLX trainer does the same after folding weight norm).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rvc_tpu.models.layers import Conv1d, Conv2d, leaky_relu

PERIODS_V1 = (2, 3, 5, 7, 11, 17)
PERIODS_V2 = (2, 3, 5, 7, 11, 17, 23, 37)


class DiscriminatorS(nn.Module):
    """Scale discriminator on the raw waveform (B, T, 1)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        fmap = []
        specs = [
            (1, 16, 15, 1, 7, 1),
            (16, 64, 41, 4, 20, 4),
            (64, 256, 41, 4, 20, 16),
            (256, 1024, 41, 4, 20, 64),
            (1024, 1024, 41, 4, 20, 256),
            (1024, 1024, 5, 1, 2, 1),
        ]
        for i, (ci, co, k, s, p, g) in enumerate(specs):
            x = Conv1d(ci, co, k, stride=s, padding=p, groups=g,
                       name=f"convs_{i}")(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = Conv1d(1024, 1, 3, padding=1, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class DiscriminatorP(nn.Module):
    """Period discriminator: fold the waveform at `period` and apply
    (k,1)-kernel 2-D convs."""

    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        B, T, C = x.shape
        p = self.period
        if T % p != 0:
            pad = p - (T % p)
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
            T = T + pad
        x = x.reshape(B, T // p, p, C)

        fmap = []
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
        strides = [self.stride] * 4 + [1]
        for i, ((ci, co), s) in enumerate(zip(chans, strides)):
            x = Conv2d(ci, co, (self.kernel_size, 1), stride=(s, 1),
                       padding=((self.kernel_size - 1) // 2, 0),
                       name=f"convs_{i}")(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = Conv2d(1024, 1, (3, 1), padding=(1, 0), name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class DiscriminatorR(nn.Module):
    """Multi-resolution STFT discriminator (reference
    `rvc/lib/algorithm/discriminators.py:172`, used with RefineGAN):
    rectangular-window magnitude STFT -> five (3,9)/(3,3) conv2d layers."""

    resolution: Tuple[int, int, int]  # (n_fft, hop, win)

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        from rvc_tpu.ops.stft import stft as stft_op

        n_fft, hop, win = self.resolution
        wav = x[:, :, 0]
        pad = int((n_fft - hop) / 2)
        wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
        z = stft_op(wav, n_fft, hop, win,
                    window=jnp.ones((win,), dtype=wav.dtype), center=False)
        mag = jnp.abs(z)  # (B, T, F)
        h = mag[:, :, :, None]  # (B, T, F, 1) — conv over (time, freq)

        fmap = []
        specs = [
            (1, 32, (3, 9), (1, 1), (1, 4)),
            (32, 32, (3, 9), (1, 2), (1, 4)),
            (32, 32, (3, 9), (1, 2), (1, 4)),
            (32, 32, (3, 9), (1, 2), (1, 4)),
            (32, 32, (3, 3), (1, 1), (1, 1)),
        ]
        for i, (ci, co, k, s, p) in enumerate(specs):
            h = Conv2d(ci, co, k, stride=s, padding=p, name=f"convs_{i}")(h)
            h = leaky_relu(h)
            fmap.append(h)
        h = Conv2d(32, 1, (3, 3), padding=(1, 1), name="conv_post")(h)
        fmap.append(h)
        return h.reshape(h.shape[0], -1), fmap


# (n_fft, hop, win) per reference v3 (`rvc/lib/algorithm/
# discriminators.py:40`): 1024/2048/512 — NOT 4096; the stock v3
# discriminator pretrains carry a 512-FFT third bank
MRD_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


class MultiPeriodDiscriminator(nn.Module):
    """Runs DiscriminatorS + all DiscriminatorP's (+ optional
    multi-resolution DiscriminatorR bank for RefineGAN training) on
    (real, generated)."""

    periods: Sequence[int] = PERIODS_V2
    use_multi_resolution: bool = False

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array):
        """y, y_hat: (B, T, 1). Returns (y_d_rs, y_d_gs, fmap_rs, fmap_gs)."""
        discs = [DiscriminatorS(name="disc_s")] + [
            DiscriminatorP(p, name=f"disc_p_{p}") for p in self.periods
        ]
        if self.use_multi_resolution:
            discs += [DiscriminatorR(r, name=f"disc_r_{r[0]}")
                      for r in MRD_RESOLUTIONS]
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d in discs:
            dr, fr = d(y)
            dg, fg = d(y_hat)
            y_d_rs.append(dr)
            y_d_gs.append(dg)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
