"""GAN training losses.

Capability parity with `rvc/train/losses.py` + the MLX trainer's numeric
guards (`rvc_mlx/train/losses.py:103-114`): LS-GAN discriminator and
generator losses, x2 feature-matching, masked KL with log-variance
clamping, L1 mel loss. All pure jnp, differentiable, jit-safe.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def discriminator_loss(
    disc_real: Sequence[jax.Array], disc_gen: Sequence[jax.Array]
) -> jax.Array:
    """LS-GAN: sum_d mean((1-D(y))^2) + mean(D(G(z))^2)."""
    loss = 0.0
    for dr, dg in zip(disc_real, disc_gen):
        loss = loss + jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def generator_loss(disc_gen: Sequence[jax.Array]) -> jax.Array:
    """LS-GAN: sum_d mean((1-D(G(z)))^2)."""
    loss = 0.0
    for dg in disc_gen:
        loss = loss + jnp.mean((1.0 - dg) ** 2)
    return loss


def feature_loss(fmap_real, fmap_gen) -> jax.Array:
    """2 * sum over all layers of mean |fmap_r - fmap_g| (stop-grad on real)."""
    loss = 0.0
    for dr, dg in zip(fmap_real, fmap_gen):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(jax.lax.stop_gradient(rl) - gl))
    return 2.0 * loss


def kl_loss(
    z_p: jax.Array,     # (B, T, C) posterior flowed into prior space
    logs_q: jax.Array,  # (B, T, C)
    m_p: jax.Array,     # (B, T, C)
    logs_p: jax.Array,  # (B, T, C)
    z_mask: jax.Array,  # (B, T, 1)
    clamp: float = 10.0,
) -> jax.Array:
    """KL(q||p) per masked element (`rvc/train/losses.py:118-140`), with
    the MLX trainer's +-clamp on log-variances for numerical safety."""
    logs_p = jnp.clip(logs_p, -clamp, clamp)
    logs_q = jnp.clip(logs_q, -clamp, clamp)
    kl = logs_p - logs_q - 0.5 + 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    kl = jnp.sum(kl * z_mask)
    # torch normalizes by z_mask.sum() (no channel factor): rvc/train/losses.py:139
    return kl / jnp.maximum(jnp.sum(z_mask), 1.0)


def mel_l1_loss(mel_real: jax.Array, mel_gen: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(mel_real - mel_gen))


def multi_scale_mel_loss(
    real: jax.Array,            # (B, T) waveform
    fake: jax.Array,            # (B, T)
    sample_rate: int,
    n_mels: Sequence[int] = (5, 10, 20, 40, 80, 160, 320),
    window_lengths: Sequence[int] = (32, 64, 128, 256, 512, 1024, 2048),
) -> jax.Array:
    """Multi-scale log10-mel L1 (reference
    `rvc/train/mel_processing.py:114-200`, used with RefineGAN): for each
    (n_mels, win) pair, center STFT at hop win//4, slaney mel, log10, L1."""
    from rvc_tpu.ops.stft import mel_filterbank, stft as stft_op

    loss = 0.0
    log10 = jnp.log(10.0)
    for m, win in zip(n_mels, window_lengths):
        fb = jnp.asarray(mel_filterbank(sample_rate, win, m, 0.0, None, htk=False))

        def logmel(w):
            z = stft_op(w, win, win // 4, win, center=True)
            mag = jnp.sqrt(jnp.real(z) ** 2 + jnp.imag(z) ** 2 + 1e-6)
            mel = jnp.einsum("btf,mf->btm", mag, fb)
            return jnp.log(jnp.clip(mel, min=1e-5)) / log10

        loss = loss + jnp.mean(jnp.abs(logmel(real) - logmel(fake)))
    return loss
