"""MRF HiFi-GAN and RefineGAN vocoders.

Capability parity with the torch-only decoders the reference's MLX stack
never ported: `rvc/lib/algorithm/generators/hifigan_mrf.py` (NSF variant
with harmonic_num=8, audio-rate sine bank, MRF blocks) and
`rvc/lib/algorithm/generators/refinegan.py` (sine-template waveform
down/up U-Net with AdaIN noise and ParallelResBlocks).

TPU notes: the audio-rate phase accumulation is a bounded cumsum (the
wrap-correction trick keeps magnitudes small in fp32); RefineGAN's
anti-aliased decimation uses our own kaiser-windowed-sinc strided conv
(replacing torchaudio.functional.resample); linear upsampling is
jax.image.resize.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.models.layers import Conv1d, ConvTranspose1d, Linear, leaky_relu


def audio_rate_sines(
    f0: jax.Array,               # (B, T_audio, 1) f0 at audio rate
    sample_rate: int,
    harmonic_num: int = 0,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-sample sine bank with harmonics (hifigan_mrf.py:128-175).

    Phase = 2*pi * cumsum((f0*k/sr) mod 1, with integer-wrap correction);
    random initial phase for harmonics > 0; voiced gating + noise floor.
    Returns (B, T_audio, harmonic_num+1).
    """
    B, T, _ = f0.shape
    # phase cumsum runs over the full audio length — keep it f32 even
    # under a bf16 compute policy (callers cast the source back down)
    f0 = f0.astype(jnp.float32)
    dims = harmonic_num + 1
    mult = jnp.arange(1, dims + 1, dtype=f0.dtype)[None, None, :]
    rad = jnp.fmod(f0 * mult / sample_rate, 1.0)

    if rng is not None:
        rng, k1 = jax.random.split(rng)
        rand_ini = jax.random.uniform(k1, (B, dims), dtype=f0.dtype)
        rand_ini = rand_ini.at[:, 0].set(0.0)
    else:
        rand_ini = jnp.zeros((B, dims), dtype=f0.dtype)
    rad = rad.at[:, 0, :].add(rand_ini)

    tmp = jnp.fmod(jnp.cumsum(rad, axis=1), 1.0)
    wrap = (tmp[:, 1:, :] - tmp[:, :-1, :]) < 0
    shift = jnp.pad(jnp.where(wrap, -1.0, 0.0), ((0, 0), (1, 0), (0, 0)))
    sines = jnp.sin(2.0 * jnp.pi * jnp.cumsum(rad + shift, axis=1)) * sine_amp

    uv = (f0 > voiced_threshold).astype(f0.dtype)
    noise_amp = uv * noise_std + (1.0 - uv) * (sine_amp / 3.0)
    if rng is not None:
        noise = jax.random.normal(rng, sines.shape, dtype=f0.dtype)
    else:
        noise = jnp.zeros_like(sines)
    return sines * uv + noise_amp * noise


class SourceModuleAudioRate(nn.Module):
    """Audio-rate harmonic source -> tanh(Linear) merge."""

    sample_rate: int
    harmonic_num: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, f0: jax.Array, rng: Optional[jax.Array] = None) -> jax.Array:
        s = audio_rate_sines(f0, self.sample_rate, self.harmonic_num, rng=rng)
        return jnp.tanh(Linear(self.harmonic_num + 1, 1,
                               use_bias=self.use_bias, name="l_linear")(s))


class MRFLayer(nn.Module):
    channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, d = self.kernel_size, self.dilation
        y = leaky_relu(x)
        y = Conv1d(self.channels, self.channels, k, padding=(k * d - d) // 2,
                   dilation=d, name="conv1")(y)
        y = leaky_relu(y)
        y = Conv1d(self.channels, self.channels, k, padding=k // 2, name="conv2")(y)
        return x + y


class MRFBlock(nn.Module):
    channels: int
    kernel_size: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, d in enumerate(self.dilations):
            x = MRFLayer(self.channels, self.kernel_size, d, name=f"layers_{i}")(x)
        return x


class HiFiGANMRFGenerator(nn.Module):
    """MRF NSF generator (`hifigan_mrf.py:223`). (B, T, C) + f0 (B, T)."""

    in_channel: int
    upsample_initial_channel: int
    upsample_rates: Sequence[int]
    upsample_kernel_sizes: Sequence[int]
    resblock_kernel_sizes: Sequence[int]
    resblock_dilations: Sequence[Sequence[int]]
    gin_channels: int
    sample_rate: int
    harmonic_num: int = 8

    @property
    def upp(self) -> int:
        return math.prod(self.upsample_rates)

    @nn.compact
    def __call__(self, x: jax.Array, f0: jax.Array,
                 g: Optional[jax.Array] = None,
                 rng: Optional[jax.Array] = None) -> jax.Array:
        rates = list(self.upsample_rates)
        n_kernels = len(self.resblock_kernel_sizes)
        # nearest-neighbor upsample of frame f0 to audio rate
        f0_up = jnp.repeat(f0[:, :, None], self.upp, axis=1)
        har = SourceModuleAudioRate(self.sample_rate, self.harmonic_num,
                                    name="m_source")(f0_up, rng).astype(x.dtype)

        x = Conv1d(self.in_channel, self.upsample_initial_channel, 7,
                   padding=3, name="conv_pre")(x)
        if g is not None:
            x = x + Conv1d(self.gin_channels, self.upsample_initial_channel,
                           1, name="cond")(g)
        ch = self.upsample_initial_channel
        for i, (u, k) in enumerate(zip(rates, self.upsample_kernel_sizes)):
            new_ch = self.upsample_initial_channel // (2 ** (i + 1))
            pad = (k - u) // 2 if u % 2 == 0 else u // 2 + u % 2
            x = leaky_relu(x)
            x = ConvTranspose1d(ch, new_ch, k, stride=u, padding=pad,
                                output_padding=u % 2, weight_init_std=0.01,
                                name=f"upsamples_{i}")(x)
            stride_f0 = math.prod(rates[i + 1:]) if i + 1 < len(rates) else 1
            nk = 1 if stride_f0 == 1 else stride_f0 * 2 - stride_f0 % 2
            np_ = 0 if stride_f0 == 1 else (nk - stride_f0) // 2
            n = Conv1d(1, new_ch, nk, stride=stride_f0, padding=np_,
                       name=f"noise_convs_{i}")(har)
            if x.shape[1] != n.shape[1]:
                m = min(x.shape[1], n.shape[1])
                x, n = x[:, :m], n[:, :m]
            x = x + n
            xs = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilations)):
                b = MRFBlock(new_ch, rk, tuple(rd), name=f"mrfs_{i}_{j}")(x)
                xs = b if xs is None else xs + b
            x = xs / n_kernels
            ch = new_ch
        x = leaky_relu(x, 0.01)
        x = Conv1d(ch, 1, 7, padding=3, name="conv_post")(x)
        return jnp.tanh(x)


# ---------------------------------------------------------------------------
# RefineGAN
# ---------------------------------------------------------------------------


def kaiser_sinc_decimate(x: jax.Array, factor: int, width: int = 64,
                         rolloff: float = 0.9475937167399596,
                         beta: float = 14.769656459379492) -> jax.Array:
    """Anti-aliased integer decimation: kaiser-windowed sinc lowpass +
    stride (replaces torchaudio sinc_interp_kaiser for integer ratios).
    x: (B, T, C) -> (B, T//factor, C)."""
    if factor == 1:
        return x
    cutoff = rolloff * 0.5 / factor
    half = width * factor
    t = np.arange(-half, half + 1, dtype=np.float64)
    sinc = 2 * cutoff * np.sinc(2 * cutoff * t)
    win = np.kaiser(2 * half + 1, beta)
    kernel = (sinc * win).astype(np.float32)
    kernel = kernel / kernel.sum()
    C = x.shape[-1]
    # depthwise conv: kernel (K, 1, C), groups=C
    kd = jnp.asarray(kernel)[:, None, None] * jnp.ones((1, 1, C), dtype=x.dtype)
    from rvc_tpu.ops.conv import conv1d

    return conv1d(x, kd, stride=factor, padding=half, groups=C)


def linear_resize(x: jax.Array, new_t: int) -> jax.Array:
    """Linear interpolation along time (torch Upsample(mode='linear'))."""
    return jax.image.resize(x, (x.shape[0], new_t, x.shape[2]), method="linear")


class RefineResBlock(nn.Module):
    channels: int
    kernel_size: int = 7
    dilations: Sequence[int] = (1, 3, 5)
    slope: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, d in enumerate(self.dilations):
            k = self.kernel_size
            y = leaky_relu(x, self.slope)
            y = Conv1d(self.channels, self.channels, k, padding=(k * d - d) // 2,
                       dilation=d, weight_init_std=0.01, name=f"convs1_{i}")(y)
            y = leaky_relu(y, self.slope)
            y = Conv1d(self.channels, self.channels, k, padding=(k - 1) // 2,
                       weight_init_std=0.01, name=f"convs2_{i}")(y)
            x = x + y
        return x


class AdaIN(nn.Module):
    channels: int
    slope: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array, rng: Optional[jax.Array] = None) -> jax.Array:
        w = self.param("weight", lambda k, s: jnp.full(s, 1e-4), (self.channels,))
        if rng is not None:
            noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        else:
            noise = jnp.zeros_like(x)
        return leaky_relu(x + noise * w[None, None, :], self.slope)


class ParallelResBlock(nn.Module):
    in_channels: int
    out_channels: int
    kernel_sizes: Sequence[int] = (3, 7, 11)
    dilations: Sequence[int] = (1, 3, 5)
    slope: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array, rng: Optional[jax.Array] = None) -> jax.Array:
        x = Conv1d(self.in_channels, self.out_channels, 7, padding=3,
                   weight_init_std=0.01, name="input_conv")(x)
        outs = []
        for i, k in enumerate(self.kernel_sizes):
            r1 = r2 = None
            if rng is not None:
                rng, r1, r2 = jax.random.split(rng, 3)
            h = AdaIN(self.out_channels, self.slope, name=f"adain1_{i}")(x, r1)
            h = RefineResBlock(self.out_channels, k, tuple(self.dilations),
                               self.slope, name=f"res_{i}")(h)
            h = AdaIN(self.out_channels, self.slope, name=f"adain2_{i}")(h, r2)
            outs.append(h)
        return sum(outs) / len(outs)


class RefineGANGenerator(nn.Module):
    """RefineGAN (`refinegan.py:268`): sine-template waveform is
    progressively decimated (skip taps) then fused with the mel/latent
    stream through linear-upsample + ParallelResBlock stages."""

    sample_rate: int = 44100
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    num_mels: int = 128
    upsample_initial_channel: int = 512
    gin_channels: int = 256
    slope: float = 0.2

    @property
    def upp(self) -> int:
        return math.prod(self.upsample_rates)

    @nn.compact
    def __call__(self, mel: jax.Array, f0: jax.Array,
                 g: Optional[jax.Array] = None,
                 rng: Optional[jax.Array] = None) -> jax.Array:
        # mel: (B, T, num_mels); f0: (B, T)
        B, T, _ = mel.shape
        f0_up = linear_resize(f0[:, :, None], T * self.upp)
        r_sine = None
        if rng is not None:
            rng, r_sine = jax.random.split(rng)
        sines = audio_rate_sines(f0_up, self.sample_rate, 0, rng=r_sine)
        har = jnp.tanh(Linear(1, 1, use_bias=False,
                              name="m_source_merge")(sines)).astype(mel.dtype)

        # the reference fixes start_channels=16, which is exactly
        # upsample_initial_channel / 2^(n_rates+1) at its only supported
        # size (512, 4 rates — `refinegan.py:295,313`); deriving it keeps
        # full-size weights identical and makes reduced test configs work
        rates = list(self.upsample_rates)
        start = max(self.upsample_initial_channel // (2 ** (len(rates) + 1)), 2)
        x = Conv1d(1, start, 7, padding=3, name="pre_conv")(har)
        downs = []
        ch = start
        for i in range(len(rates)):
            factor = rates[-i - 1]
            x = leaky_relu(x, self.slope)
            downs.append(x)
            x = kaiser_sinc_decimate(x, factor)
            x = Conv1d(ch, ch * 2, 7, padding=3, name=f"downsample_blocks_{i}")(x)
            ch = ch * 2

        c = self.upsample_initial_channel
        m = Conv1d(self.num_mels, c // 2, 7, padding=3,
                   weight_init_std=0.01, name="mel_conv")(mel)
        if g is not None:
            m = m + Conv1d(self.gin_channels, c // 2, 1, name="cond")(g)
        x = jnp.concatenate([m, x], axis=-1)

        channels = c
        for i, rate in enumerate(rates):
            r = None
            if rng is not None:
                rng, r = jax.random.split(rng)
            x = leaky_relu(x, self.slope)
            x = linear_resize(x, x.shape[1] * rate)
            d = downs[-i - 1]
            if d.shape[1] != x.shape[1]:
                mlen = min(d.shape[1], x.shape[1])
                x, d = x[:, :mlen], d[:, :mlen]
            x = jnp.concatenate([x, d], axis=-1)
            x = ParallelResBlock(channels + channels // 4, channels // 2,
                                 slope=self.slope,
                                 name=f"upsample_conv_blocks_{i}")(x, r)
            channels //= 2
        x = leaky_relu(x, self.slope)
        x = Conv1d(channels, 1, 7, padding=3, use_bias=False,
                   weight_init_std=0.01, name="conv_post")(x)
        return jnp.tanh(x)
