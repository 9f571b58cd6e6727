"""NSF-HiFiGAN and plain HiFiGAN decoders.

Capability parity with `rvc_mlx/lib/mlx/generators.py` /
`rvc/lib/algorithm/generators/hifigan_nsf.py` (NSF) and
`rvc/lib/algorithm/generators/hifigan.py` (plain), in (B, T, C) layout.

TPU design notes: the sine source's cross-frame phase continuity is a
single `cumsum` over frames (XLA lowers it to a log-depth scan); the
harmonic expansion, tanh-mix, upsample stack and MRF resblocks are all
MXU convs. The whole decoder jits into one fused program — the hottest
path of the pipeline (audio-rate convs).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rvc_tpu.models.layers import (
    Conv1d,
    ConvTranspose1d,
    Linear,
    ResBlock,
    leaky_relu,
)


def _gather_resblock_weights(module, n_kernels, dilation_sizes, base_idx):
    weights = []
    for j in range(n_kernels):
        sub = module.scope.get_variable(
            "params", f"resblocks_{base_idx + j}")
        nd = len(dilation_sizes[j])
        for names in ("convs1", "convs2"):  # -> (w1, b1, w2, b2)
            weights.append(jnp.stack(
                [sub[f"{names}_{s}"]["weight"] for s in range(nd)]
            ).astype(jnp.float32))
            weights.append(jnp.stack(
                [sub[f"{names}_{s}"]["bias"] for s in range(nd)]
            ).astype(jnp.float32))
    return tuple(weights)


def _stage_resblocks(module, x, chan, kernel_sizes, dilation_sizes,
                     base_idx, packed_t: int | None = None) -> jax.Array:
    """Mean of one decoder stage's parallel ResBlocks.

    On single-chip TPU (and C <= 128) the whole stage runs as ONE fused
    Pallas pass (`resblock_group`): the input plane is read from HBM once
    and all chains + the mean stay in VMEM. Elsewhere (init, CPU, C=256
    first stage) each ResBlock runs standalone — which itself rides the
    per-block fused kernel when enabled. With packed_t set, x is in the
    packed-lane layout (B, T/P, 128) from `ops/packed_tail.py` and the
    group kernel consumes/returns it natively (no relayout)."""
    n_kernels = len(kernel_sizes)
    if not module.is_initializing():
        from rvc_tpu.ops.pallas.resblock import (
            LANE,
            _sub_channels,
            fused_resblock_enabled,
            resblock_group,
            resblock_group_packed,
        )

        if packed_t is not None:
            weights = _gather_resblock_weights(
                module, n_kernels, dilation_sizes, base_idx)
            out = resblock_group_packed(
                x.astype(jnp.float32), weights, tuple(kernel_sizes),
                tuple(tuple(d) for d in dilation_sizes), chan, packed_t)
            return out.astype(x.dtype)
        # group kernel only up to C'=128: the C=256 first stage's
        # concatenated tap bank is (126, 256, 256) bf16 = 16.5 MB —
        # alone at the 16 MB scoped-VMEM limit, and under the bf16
        # serving policy the surrounding fusion placement pushed the
        # compile over it (v5e, r4). C=256 falls through to standalone
        # ResBlocks, whose per-block chain kernel banks are ~5.5 MB.
        if fused_resblock_enabled() and _sub_channels(chan) <= LANE:
            weights = _gather_resblock_weights(
                module, n_kernels, dilation_sizes, base_idx)
            out = resblock_group(
                x.astype(jnp.float32), weights, tuple(kernel_sizes),
                tuple(tuple(d) for d in dilation_sizes))
            return out.astype(x.dtype)
    xs = None
    for j in range(n_kernels):
        rb = ResBlock(chan, kernel_sizes[j], tuple(dilation_sizes[j]),
                      name=f"resblocks_{base_idx + j}")(x)
        xs = rb if xs is None else xs + rb
    return xs / n_kernels


def sine_source(
    f0: jax.Array,
    upp: int,
    sample_rate: int,
    harmonic_num: int = 0,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Frame-rate f0 (B, L) -> audio-rate harmonic sine source (B, L*upp, H+1).

    Phase is accumulated across frames via fmod-remainder cumsum so sines
    stay continuous at frame boundaries (reference semantics,
    `rvc_mlx/lib/mlx/generators.py:29-93`). Harmonic 0 has zero initial
    phase; higher harmonics get a random phase offset. Voiced frames carry
    sine + small noise; unvoiced frames carry noise at sine_amp/3.
    Returns (source, voiced_mask) at audio rate.
    """
    B, L = f0.shape
    # phase accumulates over L*upp samples — always f32, even under a
    # bf16 compute policy (callers cast the returned source back down)
    dtype = jnp.float32
    f0 = f0.astype(dtype)
    n_harm = harmonic_num + 1
    grid = jnp.arange(1, upp + 1, dtype=dtype)
    phase_inc = (f0[:, :, None] / sample_rate) * grid[None, None, :]  # (B, L, upp)

    prev_last = phase_inc[:, :-1, -1]                      # (B, L-1)
    rem = jnp.fmod(prev_last + 0.5, 1.0) - 0.5
    cum = jnp.fmod(jnp.cumsum(rem, axis=1), 1.0)
    cum = jnp.pad(cum, ((0, 0), (1, 0)))                   # (B, L)
    phase = phase_inc + cum[:, :, None]
    phase = phase.reshape(B, L * upp, 1)

    harm_scale = jnp.arange(1, n_harm + 1, dtype=dtype)[None, None, :]
    phase = phase * harm_scale
    if n_harm > 1:
        if rng is None:
            rand = jnp.zeros((1, 1, n_harm - 1), dtype=dtype)
        else:
            rng, sub = jax.random.split(rng)
            rand = jax.random.uniform(sub, (1, 1, n_harm - 1), dtype=dtype)
        phase = phase + jnp.concatenate(
            [jnp.zeros((1, 1, 1), dtype=dtype), rand], axis=-1
        )
    sines = jnp.sin(2.0 * jnp.pi * phase) * sine_amp

    voiced = (f0 > voiced_threshold).astype(dtype)[:, :, None]  # (B, L, 1)
    voiced_up = jnp.repeat(voiced, upp, axis=1)                  # (B, L*upp, 1)

    noise_amp = voiced_up * noise_std + (1.0 - voiced_up) * (sine_amp / 3.0)
    if rng is None:
        noise = jnp.zeros_like(sines)
    else:
        noise = jax.random.normal(rng, sines.shape, dtype=dtype)
    source = sines * voiced_up + noise_amp * noise
    return source, voiced_up


class SourceModuleHnNSF(nn.Module):
    """Harmonic-plus-noise source: sine bank -> Linear -> tanh."""

    sample_rate: int
    harmonic_num: int = 0
    sine_amp: float = 0.1
    add_noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(self, f0: jax.Array, upp: int, rng: Optional[jax.Array] = None) -> jax.Array:
        src, _ = sine_source(
            f0, upp, self.sample_rate, self.harmonic_num,
            self.sine_amp, self.add_noise_std, self.voiced_threshold, rng,
        )
        return jnp.tanh(Linear(self.harmonic_num + 1, 1, name="l_linear")(src))


class HiFiGANNSFGenerator(nn.Module):
    """NSF-HiFiGAN: latent (B, T, C) + frame f0 (B, T) -> waveform (B, T*upp, 1)."""

    initial_channel: int
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gin_channels: int
    sr: int

    @property
    def upp(self) -> int:
        return math.prod(self.upsample_rates)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                     # (B, T, initial_channel)
        f0: jax.Array,                    # (B, T)
        g: Optional[jax.Array] = None,    # (B, 1, gin)
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        rates = list(self.upsample_rates)
        n_up = len(rates)
        n_kernels = len(self.resblock_kernel_sizes)
        chans = [self.upsample_initial_channel // (2 ** (i + 1)) for i in range(n_up)]

        har_source = SourceModuleHnNSF(self.sr, harmonic_num=0, name="m_source")(
            f0, self.upp, rng
        ).astype(x.dtype)  # (B, T*upp, 1); follow the main path's compute dtype

        x = Conv1d(self.initial_channel, self.upsample_initial_channel, 7,
                   padding=3, name="conv_pre")(x)
        if g is not None:
            x = x + Conv1d(self.gin_channels, self.upsample_initial_channel, 1,
                           name="cond")(g)

        # packed-lane tail: once C drops below the 128-lane tile, keep
        # P = 128/C timesteps folded into the lane dim BETWEEN ops so no
        # lane-padded (B, T_audio, 32/64) plane ever reaches HBM
        # (`ops/packed_tail.py`; composes with the fused ResBlock group
        # kernel, which consumes/returns the packed layout natively)
        from rvc_tpu.ops.packed_tail import (
            LANE as _LANE,
            conv_packed,
            convt_packed,
            noise_conv_packed,
            packed_tail_enabled,
        )
        if not self.is_initializing():
            from rvc_tpu.ops.pallas.resblock import fused_resblock_enabled
            packed_ok = packed_tail_enabled() and fused_resblock_enabled()
        else:
            packed_ok = False

        har_len = har_source.shape[1]
        pack = 1
        for i, (u, k) in enumerate(zip(rates, self.upsample_kernel_sizes)):
            in_ch = self.upsample_initial_channel // (2 ** i)
            pad = (k - u) // 2 if u % 2 == 0 else u // 2 + u % 2
            out_pad = u % 2

            stride_f0 = math.prod(rates[i + 1:]) if i + 1 < n_up else 1
            nk = 1 if stride_f0 == 1 else stride_f0 * 2 - stride_f0 % 2
            np_ = 0 if stride_f0 == 1 else (nk - stride_f0) // 2

            cur_t = x.shape[1] * pack
            t_up = (cur_t - 1) * u - 2 * pad + k + out_pad
            t_n = (har_len + 2 * np_ - nk) // stride_f0 + 1
            want_pack = (
                packed_ok and chans[i] < _LANE and _LANE % chans[i] == 0
                and out_pad == 0 and in_ch * pack == _LANE
                and _LANE // chans[i] == u * pack
                and t_up == u * cur_t and t_n == t_up
                and (stride_f0 == 1
                     or stride_f0 * ((_LANE // chans[i]) - 1) + nk
                     <= 2 * (_LANE // chans[i]) * stride_f0))
            if want_pack:
                p_out = _LANE // chans[i]
                wt = self.scope.get_variable("params", f"ups_{i}")
                x = convt_packed(
                    leaky_relu(x), wt["weight"].astype(x.dtype),
                    wt["bias"].astype(x.dtype), stride=u, padding=pad,
                    p_in=pack, p_out=p_out)
                nw = self.scope.get_variable("params", f"noise_convs_{i}")
                n = noise_conv_packed(
                    har_source[..., 0], nw["weight"].astype(x.dtype),
                    nw["bias"].astype(x.dtype), stride=stride_f0,
                    padding=np_, p_out=p_out)
                x = x + n
                pack = p_out
                x = _stage_resblocks(self, x, chans[i],
                                     tuple(self.resblock_kernel_sizes),
                                     tuple(tuple(d) for d in
                                           self.resblock_dilation_sizes),
                                     i * n_kernels, packed_t=t_up)
                continue
            if pack > 1:  # config stopped qualifying: back to canonical
                x = x.reshape(x.shape[0], cur_t, in_ch)
                pack = 1

            x = leaky_relu(x)
            x = ConvTranspose1d(in_ch, chans[i], k, stride=u, padding=pad,
                                output_padding=out_pad, weight_init_std=0.01,
                                name=f"ups_{i}")(x)

            # f0 source tap: downsample the audio-rate source to this stage's
            # rate with a strided conv (stride = prod of remaining rates).
            n = Conv1d(1, chans[i], nk, stride=stride_f0, padding=np_,
                       name=f"noise_convs_{i}")(har_source)
            if x.shape[1] != n.shape[1]:
                m = min(x.shape[1], n.shape[1])
                x, n = x[:, :m], n[:, :m]
            x = x + n

            x = _stage_resblocks(self, x, chans[i],
                                 tuple(self.resblock_kernel_sizes),
                                 tuple(tuple(d) for d in
                                       self.resblock_dilation_sizes),
                                 i * n_kernels)

        if pack > 1:
            wp = self.scope.get_variable("params", "conv_post")
            y = conv_packed(leaky_relu(x, 0.01),
                            wp["weight"].astype(x.dtype), None,
                            padding=3, p_in=pack)
            return jnp.tanh(y).reshape(y.shape[0], y.shape[1] * pack, 1)

        x = leaky_relu(x, 0.01)  # default torch leaky_relu slope at the tail
        x = Conv1d(chans[-1], 1, 7, padding=3, use_bias=False, name="conv_post")(x)
        return jnp.tanh(x)


class HiFiGANGenerator(nn.Module):
    """Plain HiFi-GAN (no f0 source) for f0-less models
    (`rvc/lib/algorithm/generators/hifigan.py:11`)."""

    initial_channel: int
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gin_channels: int = 0

    @property
    def upp(self) -> int:
        return math.prod(self.upsample_rates)

    @nn.compact
    def __call__(self, x: jax.Array, g: Optional[jax.Array] = None) -> jax.Array:
        rates = list(self.upsample_rates)
        n_kernels = len(self.resblock_kernel_sizes)
        chans = [self.upsample_initial_channel // (2 ** (i + 1)) for i in range(len(rates))]

        x = Conv1d(self.initial_channel, self.upsample_initial_channel, 7,
                   padding=3, name="conv_pre")(x)
        if g is not None:
            x = x + Conv1d(self.gin_channels, self.upsample_initial_channel, 1,
                           name="cond")(g)
        from rvc_tpu.ops.packed_tail import (
            LANE as _LANE,
            conv_packed,
            convt_packed,
            packed_tail_enabled,
        )
        if not self.is_initializing():
            from rvc_tpu.ops.pallas.resblock import fused_resblock_enabled
            packed_ok = packed_tail_enabled() and fused_resblock_enabled()
        else:
            packed_ok = False

        pack = 1
        for i, (u, k) in enumerate(zip(rates, self.upsample_kernel_sizes)):
            in_ch = self.upsample_initial_channel // (2 ** i)
            pad = (k - u) // 2
            cur_t = x.shape[1] * pack
            t_up = (cur_t - 1) * u - 2 * pad + k
            want_pack = (
                packed_ok and chans[i] < _LANE and _LANE % chans[i] == 0
                and u % 2 == 0 and in_ch * pack == _LANE
                and _LANE // chans[i] == u * pack and t_up == u * cur_t)
            if want_pack:
                p_out = _LANE // chans[i]
                wt = self.scope.get_variable("params", f"ups_{i}")
                x = convt_packed(
                    leaky_relu(x), wt["weight"].astype(x.dtype),
                    wt["bias"].astype(x.dtype), stride=u, padding=pad,
                    p_in=pack, p_out=p_out)
                pack = p_out
                x = _stage_resblocks(self, x, chans[i],
                                     tuple(self.resblock_kernel_sizes),
                                     tuple(tuple(d) for d in
                                           self.resblock_dilation_sizes),
                                     i * n_kernels, packed_t=t_up)
                continue
            if pack > 1:
                x = x.reshape(x.shape[0], cur_t, in_ch)
                pack = 1
            x = leaky_relu(x)
            x = ConvTranspose1d(in_ch, chans[i], k, stride=u, padding=pad,
                                weight_init_std=0.01, name=f"ups_{i}")(x)
            x = _stage_resblocks(self, x, chans[i],
                                 tuple(self.resblock_kernel_sizes),
                                 tuple(tuple(d) for d in
                                       self.resblock_dilation_sizes),
                                 i * n_kernels)
        if pack > 1:
            wp = self.scope.get_variable("params", "conv_post")
            y = conv_packed(leaky_relu(x, 0.01),
                            wp["weight"].astype(x.dtype), None,
                            padding=3, p_in=pack)
            return jnp.tanh(y).reshape(y.shape[0], y.shape[1] * pack, 1)
        x = leaky_relu(x, 0.01)
        x = Conv1d(chans[-1], 1, 7, padding=3, use_bias=False, name="conv_post")(x)
        return jnp.tanh(x)
