"""FCPE pitch estimator — full PCmer (performer) implementation.

The reference's MLX port is an unfinished stub that falls back to RMVPE
(`rvc_mlx/lib/mlx/fcpe.py:50,91`); the torch implementation
(`rvc/lib/predictors/FCPE.py:242-724`) is the spec implemented here:

  log-mel(128) -> conv stack (Conv1d->GroupNorm(4)->LeakyReLU->Conv1d) ->
  12 x PCmer layer [x += FastAttention(LN(x)); x += ConformerConvModule(x)]
  -> LN -> weight-normed Linear -> 360 sigmoid -> local-argmax cents decode
  with confidence threshold.

FastAttention is the performer softmax-kernel linear attention: q/k are
mapped through exp(w^T x - |x|^2/2) random features (gaussian orthogonal
projection), giving O(T) attention — a natural fit for long mels on TPU
(all matmuls, no softmax over T^2).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.models.layers import Conv1d, LayerNorm, Linear
from rvc_tpu.ops.stft import mel_filterbank, stft as stft_op

N_MELS = 128
OUT_DIMS = 360
F0_MIN_CENT = 32.70
F0_MAX_CENT = 1975.5


def gaussian_orthogonal_matrix(nb_rows: int, nb_cols: int, key: jax.Array) -> jax.Array:
    """Orthogonal random features (performer): stacked QR blocks with
    chi-distributed row norms (scaling=0)."""
    blocks = []
    n_full = nb_rows // nb_cols
    keys = jax.random.split(key, n_full + 2)
    for i in range(n_full):
        m = jax.random.normal(keys[i], (nb_cols, nb_cols))
        q, _ = jnp.linalg.qr(m)
        blocks.append(q.T)
    rem = nb_rows - n_full * nb_cols
    if rem > 0:
        m = jax.random.normal(keys[n_full], (nb_cols, nb_cols))
        q, _ = jnp.linalg.qr(m)
        blocks.append(q.T[:rem])
    final = jnp.concatenate(blocks, axis=0)
    mult = jnp.linalg.norm(jax.random.normal(keys[-1], (nb_rows, nb_cols)), axis=1)
    return mult[:, None] * final


def softmax_kernel(data: jax.Array, projection: jax.Array, is_query: bool,
                   eps: float = 1e-4) -> jax.Array:
    """exp random-feature map (reference `softmax_kernel:179-213`).
    data: (B, H, T, D); projection: (M, D) -> (B, H, T, M)."""
    normalizer = data.shape[-1] ** -0.25
    ratio = projection.shape[0] ** -0.5
    dash = jnp.einsum("bhtd,md->bhtm", normalizer * data, projection)
    diag = jnp.sum(data ** 2, axis=-1, keepdims=True) / 2.0 * (normalizer ** 2)
    if is_query:
        out = ratio * (jnp.exp(dash - diag - jnp.max(dash, axis=-1, keepdims=True)) + eps)
    else:
        out = ratio * jnp.exp(dash - diag + eps)
    return out


def linear_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """O(T) attention: out = q (k^T v) / (q k_sum)."""
    k_cumsum = jnp.sum(k, axis=-2)
    d_inv = 1.0 / (jnp.einsum("bhtm,bhm->bht", q, k_cumsum) + 1e-8)
    context = jnp.einsum("bhtm,bhtd->bhmd", k, v)
    return jnp.einsum("bhmd,bhtm,bht->bhtd", context, q, d_inv)


class FastSelfAttention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64  # torch SelfAttention fixes head dim at 64

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        B, T, _ = x.shape
        H = self.heads
        D = self.dim_head
        inner = H * D
        nb_features = int(D * math.log(D))
        q = Linear(self.dim, inner, name="to_q")(x)
        k = Linear(self.dim, inner, name="to_k")(x)
        v = Linear(self.dim, inner, name="to_v")(x)

        def split(t):
            return t.reshape(B, T, H, D).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if mask is not None:
            v = v * mask[:, None, :, None]

        proj = self.param(
            "projection_matrix",
            lambda key, shape: gaussian_orthogonal_matrix(shape[0], shape[1], key),
            (nb_features, D),
        )
        proj = jax.lax.stop_gradient(proj)  # buffer, not trained
        qp = softmax_kernel(q, proj, is_query=True)
        kp = softmax_kernel(k, proj, is_query=False)
        out = linear_attention(qp, kp, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, inner)
        return Linear(inner, self.dim, name="to_out")(out)


class ConformerConvModule(nn.Module):
    dim: int
    expansion_factor: int = 2
    kernel_size: int = 31

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.dim * self.expansion_factor
        h = LayerNorm(self.dim, name="ln")(x)
        h = Conv1d(self.dim, inner * 2, 1, name="conv_in")(h)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(g)  # GLU
        pad = self.kernel_size // 2
        h = Conv1d(inner, inner, self.kernel_size,
                   padding=(pad, pad - (self.kernel_size + 1) % 2),
                   groups=inner, name="depthwise")(h)
        h = h * jax.nn.sigmoid(h)  # Swish
        return Conv1d(inner, self.dim, 1, name="conv_out")(h)


class PCmerLayer(nn.Module):
    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        x = x + FastSelfAttention(self.dim, self.heads, name="attn")(
            LayerNorm(self.dim, name="norm")(x), mask)
        x = x + ConformerConvModule(self.dim, name="conformer")(x)
        return x


class FCPEModel(nn.Module):
    input_channel: int = N_MELS
    out_dims: int = OUT_DIMS
    n_layers: int = 12
    n_chans: int = 512

    @nn.compact
    def __call__(self, mel: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        """mel (B, T, 128) -> salience (B, T, 360)."""
        C = self.n_chans
        h = Conv1d(self.input_channel, C, 3, padding=1, name="stack_conv1")(mel)
        # GroupNorm(4, C) over channels
        gw = self.param("stack_gn_weight", nn.initializers.ones, (C,))
        gb = self.param("stack_gn_bias", nn.initializers.zeros, (C,))
        B, T, _ = h.shape
        hg = h.reshape(B, T, 4, C // 4)
        mean = hg.mean(axis=(1, 3), keepdims=True)
        var = hg.var(axis=(1, 3), keepdims=True)
        h = ((hg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(B, T, C) * gw + gb
        h = jnp.where(h >= 0, h, 0.01 * h)  # LeakyReLU default slope
        h = Conv1d(C, C, 3, padding=1, name="stack_conv2")(h)

        for i in range(self.n_layers):
            h = PCmerLayer(C, name=f"decoder_layers_{i}")(h, mask)
        h = LayerNorm(C, name="norm")(h)
        h = Linear(C, self.out_dims, name="dense_out")(h)
        return jax.nn.sigmoid(h)


CENT_TABLE = np.linspace(
    1200.0 * np.log2(F0_MIN_CENT / 10.0),
    1200.0 * np.log2(F0_MAX_CENT / 10.0),
    OUT_DIMS,
).astype(np.float32)


def cents_local_decoder(y: jax.Array, threshold: float = 0.05) -> jax.Array:
    """(B, T, 360) -> f0 (B, T); local 9-bin weighted argmax with
    confidence gate (reference `cents_local_decoder:689`)."""
    ci = jnp.asarray(CENT_TABLE)
    confident = jnp.max(y, axis=-1)
    max_idx = jnp.argmax(y, axis=-1)
    idx = jnp.clip(max_idx[..., None] + jnp.arange(9) - 4, 0, OUT_DIMS - 1)
    y_l = jnp.take_along_axis(y, idx, axis=-1)
    ci_l = ci[idx]
    cents = jnp.sum(ci_l * y_l, axis=-1) / jnp.maximum(jnp.sum(y_l, axis=-1), 1e-12)
    f0 = 10.0 * 2.0 ** (cents / 1200.0)
    return jnp.where(confident > threshold, f0, 0.0)


class FCPE:
    """End-to-end FCPE predictor: 16 kHz audio -> f0 @ hop 160."""

    def __init__(self, params=None, seed: int = 0, threshold: float = 0.05):
        self.model = FCPEModel()
        self.threshold = threshold
        if params is None:
            from rvc_tpu.utils.init_utils import cpu_backend

            with cpu_backend():
                params = self.model.init(jax.random.PRNGKey(seed),
                                         jnp.zeros((1, 32, N_MELS)))["params"]
            from rvc_tpu.utils.init_utils import to_default_device

            params = to_default_device(params)
        self.variables = {"params": params}
        self._jit = jax.jit(lambda v, mel: self.model.apply(v, mel))

    def mel(self, audio: jax.Array) -> jax.Array:
        """(B, T) -> (B, frames, 128) log-mel (slaney, fmax 8000,
        torch-spectrogram padding, clamp 1e-5)."""
        n_fft, hop, win = 1024, 160, 1024
        pad_l = (win - hop) // 2
        pad_r = (win - hop + 1) // 2
        y = jnp.pad(audio, ((0, 0), (pad_l, pad_r)), mode="reflect")
        z = stft_op(y, n_fft, hop, win, center=False)
        mag = jnp.sqrt(jnp.real(z) ** 2 + jnp.imag(z) ** 2 + 1e-9)
        fb = jnp.asarray(mel_filterbank(16000, n_fft, N_MELS, 0, 8000, htk=False))
        return jnp.log(jnp.clip(jnp.einsum("btf,mf->btm", mag, fb), min=1e-5))

    def infer_from_audio(self, audio, threshold: Optional[float] = None):
        audio = jnp.asarray(audio)
        squeeze = audio.ndim == 1
        if squeeze:
            audio = audio[None]
        sal = self._jit(self.variables, self.mel(audio))
        f0 = cents_local_decoder(sal, threshold or self.threshold)
        return np.asarray(f0[0] if squeeze else f0)
