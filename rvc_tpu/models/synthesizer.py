"""The RVC Synthesizer: enc_p + enc_q + flow + NSF-HiFiGAN dec + speaker emb.

Capability parity with `rvc_mlx/lib/mlx/synthesizers.py` /
`rvc/lib/algorithm/synthesizers.py`: training forward encodes the prior
(TextEncoder) and posterior (spectrogram), flows the posterior into prior
space, random-slices a segment, and decodes it; inference runs
enc_p -> flow-reverse -> dec. All in (B, T, C), one jittable program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rvc_tpu.configs import ModelConfig, DataConfig
from rvc_tpu.models.encoders import PosteriorEncoder, TextEncoder
from rvc_tpu.models.flow import ResidualCouplingBlock
from rvc_tpu.models.generators import HiFiGANGenerator, HiFiGANNSFGenerator
from rvc_tpu.models.layers import Embedding
from rvc_tpu.ops.commons import rand_slice_segments, slice_segments


class TrainOutputs(NamedTuple):
    wave: jax.Array          # (B, segment_frames*upp, 1) generated segment
    ids_slice: jax.Array     # (B,) slice start frames
    x_mask: jax.Array        # (B, T_enc, 1)
    y_mask: jax.Array        # (B, T_spec, 1)
    z: jax.Array
    z_p: jax.Array
    m_p: jax.Array
    logs_p: jax.Array
    m_q: jax.Array
    logs_q: jax.Array


class Synthesizer(nn.Module):
    spec_channels: int
    segment_frames: int        # decoder training segment, in frames
    model: ModelConfig
    sr: int

    def setup(self):
        m = self.model
        self.enc_p = TextEncoder(
            m.inter_channels, m.hidden_channels, m.filter_channels,
            m.n_heads, m.n_layers, m.kernel_size,
            embedding_dim=m.text_enc_hidden_dim, use_f0=m.use_f0,
        )
        self.enc_q = PosteriorEncoder(
            self.spec_channels, m.inter_channels, m.hidden_channels,
            5, 1, 16, gin_channels=m.gin_channels,
        )
        self.flow = ResidualCouplingBlock(
            m.inter_channels, m.hidden_channels, 5, 1, 3,
            gin_channels=m.gin_channels,
        )
        # activation checkpointing (the reference's `checkpointing` flag,
        # `rvc/lib/algorithm/synthesizers.py:64`): rematerialize the
        # decoder so training trades FLOPs for HBM
        remat = (lambda cls: nn.remat(cls)) if m.checkpointing else (lambda cls: cls)
        if m.use_f0:
            if m.vocoder == "MRF HiFi-GAN":
                from rvc_tpu.models.generators_extra import HiFiGANMRFGenerator

                self.dec = HiFiGANMRFGenerator(
                    in_channel=m.inter_channels,
                    upsample_initial_channel=m.upsample_initial_channel,
                    upsample_rates=m.upsample_rates,
                    upsample_kernel_sizes=m.upsample_kernel_sizes,
                    resblock_kernel_sizes=m.resblock_kernel_sizes,
                    resblock_dilations=m.resblock_dilation_sizes,
                    gin_channels=m.gin_channels,
                    sample_rate=self.sr,
                    harmonic_num=8,
                )
            elif m.vocoder == "RefineGAN":
                from rvc_tpu.models.generators_extra import RefineGANGenerator

                self.dec = RefineGANGenerator(
                    sample_rate=self.sr,
                    upsample_rates=m.upsample_rates,
                    num_mels=m.inter_channels,
                    upsample_initial_channel=m.upsample_initial_channel,
                    gin_channels=m.gin_channels,
                )
            else:
                self.dec = remat(HiFiGANNSFGenerator)(
                    m.inter_channels, m.resblock_kernel_sizes,
                    m.resblock_dilation_sizes, m.upsample_rates,
                    m.upsample_initial_channel, m.upsample_kernel_sizes,
                    m.gin_channels, self.sr,
                )
        else:
            # MRF/RefineGAN require pitch guidance (reference behavior)
            self.dec = HiFiGANGenerator(
                m.inter_channels, m.resblock_kernel_sizes,
                m.resblock_dilation_sizes, m.upsample_rates,
                m.upsample_initial_channel, m.upsample_kernel_sizes,
                m.gin_channels,
            )
        self.emb_g = Embedding(m.spk_embed_dim, m.gin_channels)

    def __call__(
        self,
        phone: jax.Array,          # (B, T, 768)
        phone_lengths: jax.Array,  # (B,)
        pitch: Optional[jax.Array],    # (B, T) coarse
        pitchf: Optional[jax.Array],   # (B, T) continuous f0
        y: jax.Array,              # (B, T_spec, spec_channels)
        y_lengths: jax.Array,      # (B,)
        ds: jax.Array,             # (B,) speaker ids
        *,
        rng: jax.Array,
    ) -> TrainOutputs:
        """Training forward (reference `synthesizers.py:85`)."""
        g = self.emb_g(ds)[:, None, :]  # (B, 1, gin)
        m_p, logs_p, x_mask = self.enc_p(phone, pitch, phone_lengths)
        r_post, r_slice, r_dec = jax.random.split(rng, 3)
        z, m_q, logs_q, y_mask = self.enc_q(y, y_lengths, g=g, rng=r_post)
        z_p = self.flow(z, y_mask, g=g, reverse=False)

        z_slice, ids_slice = rand_slice_segments(z, y_lengths, self.segment_frames, r_slice)
        if self.model.use_f0:
            pitchf_slice = slice_segments(pitchf, ids_slice, self.segment_frames)
            o = self.dec(z_slice, pitchf_slice, g=g, rng=r_dec)
        else:
            o = self.dec(z_slice, g=g)
        return TrainOutputs(o, ids_slice, x_mask, y_mask, z, z_p, m_p, logs_p, m_q, logs_q)

    def infer(
        self,
        phone: jax.Array,           # (B, T, 768)
        phone_lengths: jax.Array,   # (B,)
        pitch: Optional[jax.Array],  # (B, T) coarse
        nsff0: Optional[jax.Array],  # (B, T) continuous f0
        sid: jax.Array,              # (B,)
        rng: Optional[jax.Array] = None,
        noise_scale: float = 0.0,
    ) -> Tuple[jax.Array, jax.Array]:
        """Inference: enc_p -> (+ prior noise) -> flow reverse -> dec.

        noise_scale=0.0 matches the reference MLX stack
        (`rvc_mlx/lib/mlx/synthesizers.py:206`); the torch stack uses
        0.66666 (`rvc/lib/algorithm/synthesizers.py:228`).
        Returns (wave (B, T*upp, 1), x_mask).
        """
        g = self.emb_g(sid)[:, None, :]
        m_p, logs_p, x_mask = self.enc_p(phone, pitch, phone_lengths)
        if noise_scale > 0.0 and rng is not None:
            rng, sub = jax.random.split(rng)
            eps = jax.random.normal(sub, m_p.shape, dtype=m_p.dtype)
            z_p = (m_p + jnp.exp(logs_p) * eps * noise_scale) * x_mask
        else:
            z_p = m_p * x_mask
        z = self.flow(z_p, x_mask, g=g, reverse=True)
        # decoder activations are pinned to f32 regardless of the compute
        # dtype: bf16 activations at audio rate raise the vocoder's
        # spectral noise floor (measured: log-spec corr 0.50 vs 0.9999
        # with f32 decode under an otherwise-bf16 pipeline); bf16 decoder
        # *params* are fine and upcast at use
        zd = (z * x_mask).astype(jnp.float32)
        gd = g.astype(jnp.float32)
        if self.model.use_f0:
            o = self.dec(zd, nsff0, g=gd, rng=rng)
        else:
            o = self.dec(zd, g=gd)
        return o, x_mask


def build_synthesizer(cfg, sr: Optional[int] = None) -> Synthesizer:
    """Construct a Synthesizer from an RVCConfig."""
    sr = sr or cfg.data.sample_rate
    return Synthesizer(
        spec_channels=cfg.data.spec_channels,
        segment_frames=cfg.segment_frames,
        model=cfg.model,
        sr=sr,
    )


def source_noise_rng() -> Optional[jax.Array]:
    """Deterministic PRNG key for the NSF source's additive noise at
    inference. The reference draws fresh noise on every forward
    (`rvc_mlx/lib/mlx/generators.py:105-116`): voiced frames get jitter
    at ``add_noise_std`` and unvoiced frames get their ENTIRE excitation
    as noise at ``sine_amp/3`` — with a silent source, unvoiced segments
    lose their aspiration energy. A fixed key keeps runs reproducible
    while matching those noise statistics. RVC_TPU_SOURCE_NOISE=0
    disables it (noise-free runs for exact oracle comparisons)."""
    import os

    if os.environ.get("RVC_TPU_SOURCE_NOISE", "1") == "0":
        return None
    return jax.random.PRNGKey(0x5EED)
