"""CREPE pitch estimator (full & tiny), fully on-device.

Capability parity with `rvc_mlx/lib/mlx/crepe.py` (an MLX port of
torchcrepe): 1024-sample frames at hop 160, per-frame mean/std normalize,
6 conv layers (k=(512,1) stride (4,1) then (64,1)x5, ReLU -> BatchNorm
(eps=1e-3) -> MaxPool(2,1)), Linear -> 360-bin sigmoid; weighted local
average decode (±4 bins) with periodicity thresholding, mean/median
smoothing.

TPU design: framing is a conv-patches op, all frames batch through the
conv stack in one jitted call (no 512-frame python chunking), and decode
runs in jnp on device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.models.layers import BatchNorm, Conv2d, Linear
from rvc_tpu.ops.stft import frame_signal

PITCH_BINS = 360
SAMPLE_RATE = 16000
HOP_SIZE = 160
WINDOW_SIZE = 1024
CENTS_PER_BIN = 20.0
FMIN_REF = 10.0
CENTS = (CENTS_PER_BIN * np.arange(PITCH_BINS) + 1997.3794084376191).astype(np.float32)

_SIZES = {
    "full": dict(channels=(1024, 128, 128, 128, 256, 512), in_features=2048),
    "tiny": dict(channels=(128, 16, 16, 16, 32, 64), in_features=256),
}


class CREPEModel(nn.Module):
    """Frames (B, 1024) -> pitch-bin probabilities (B, 360)."""

    variant: str = "full"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        spec = _SIZES[self.variant]
        chans = spec["channels"]
        B = x.shape[0]
        h = x[:, :, None, None]  # (B, 1024, 1, 1)
        in_ch = 1
        for i, out_ch in enumerate(chans):
            k = (512, 1) if i == 0 else (64, 1)
            s = (4, 1) if i == 0 else (1, 1)
            pad = ((254, 254), (0, 0)) if i == 0 else ((31, 32), (0, 0))
            h = jnp.pad(h, ((0, 0), pad[0], (0, 0), (0, 0)))
            h = Conv2d(in_ch, out_ch, k, stride=s, name=f"conv{i + 1}")(h)
            h = jnp.maximum(h, 0.0)
            h = BatchNorm(out_ch, eps=1e-3, name=f"conv{i + 1}_BN")(h)
            # MaxPool (2,1) over the "height" (frequency-ish) axis
            Bh, H, W, C = h.shape
            h = h.reshape(Bh, H // 2, 2, W, C).max(axis=2)
            in_ch = out_ch
        h = h.reshape(B, spec["in_features"])
        return jax.nn.sigmoid(Linear(spec["in_features"], PITCH_BINS, name="classifier")(h))


def frame_audio(audio: jax.Array, hop: int = HOP_SIZE) -> jax.Array:
    """(B, T) -> normalized frames (B, n_frames, 1024), reflect pad.

    `hop` is the analysis hop in 16 kHz samples (reference
    `rvc_cli.py --hop_length`, crepe-only; default 160 = 10 ms)."""
    pad = WINDOW_SIZE // 2
    audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(audio, WINDOW_SIZE, hop)
    mean = jnp.mean(frames, axis=-1, keepdims=True)
    std = jnp.std(frames, axis=-1, keepdims=True)
    return (frames - mean) / jnp.maximum(std, 1e-10)


def decode_probabilities(
    probs: jax.Array, f0_min: float, f0_max: float
) -> Tuple[jax.Array, jax.Array]:
    """(T, 360) -> (f0 (T,), periodicity (T,)). Weighted ±4-bin average."""
    cents = jnp.asarray(CENTS)
    cmin = 1200.0 * jnp.log2(f0_min / FMIN_REF)
    cmax = 1200.0 * jnp.log2(f0_max / FMIN_REF)
    valid = (cents >= cmin) & (cents <= cmax)
    p = jnp.where(valid[None, :], probs, 0.0)

    peak = jnp.argmax(p, axis=-1)
    periodicity = jnp.take_along_axis(p, peak[:, None], axis=-1)[:, 0]

    padded = jnp.pad(p, ((0, 0), (4, 4)))
    cents_pad = jnp.pad(cents, (4, 4))
    idx = peak[:, None] + jnp.arange(9)[None, :]
    w = jnp.take_along_axis(padded, idx, axis=-1)
    cw = cents_pad[idx]
    wsum = jnp.sum(w, axis=-1)
    f0_cents = jnp.where(wsum > 0, jnp.sum(w * cw, axis=-1) / jnp.maximum(wsum, 1e-12), 0.0)
    f0 = FMIN_REF * (2.0 ** (f0_cents / 1200.0))
    return f0, periodicity


def _mean_filter3(x: jax.Array) -> jax.Array:
    xp = jnp.pad(x, (1, 1), mode="edge")
    return (xp[:-2] + xp[1:-1] + xp[2:]) / 3.0


def _median_filter3(x: jax.Array) -> jax.Array:
    xp = jnp.pad(x, (1, 1), mode="edge")
    stacked = jnp.stack([xp[:-2], xp[1:-1], xp[2:]], axis=0)
    return jnp.median(stacked, axis=0)


class CREPE:
    """CREPE extractor facade (`CREPE(variant).get_f0(audio)`)."""

    def __init__(self, variant: str = "full", params=None, batch_stats=None, seed: int = 0):
        self.variant = variant
        self.model = CREPEModel(variant)
        if params is None:
            from rvc_tpu.utils.init_utils import cpu_backend

            with cpu_backend():
                v = self.model.init(jax.random.PRNGKey(seed),
                                    jnp.zeros((1, WINDOW_SIZE)))
            from rvc_tpu.utils.init_utils import to_default_device

            v = to_default_device(v)
            params, batch_stats = v["params"], v.get("batch_stats", {})
        self.variables = {"params": params, "batch_stats": batch_stats or {}}
        self._jit = jax.jit(lambda v, frames: self.model.apply(v, frames))

    def get_f0(
        self,
        audio: np.ndarray,
        f0_min: float = 50.0,
        f0_max: float = 1100.0,
        threshold: float = 0.1,
        return_periodicity: bool = False,
        hop: int = HOP_SIZE,
    ):
        n_samples = len(np.asarray(audio))
        audio = jnp.asarray(np.asarray(audio, dtype=np.float32))[None]
        frames = frame_audio(audio, hop)[0]  # (T, 1024)
        probs = self._jit(self.variables, frames)
        f0, per = decode_probabilities(probs, f0_min, f0_max)
        per = _median_filter3(per)
        f0 = _mean_filter3(f0)
        f0_raw, per = np.asarray(f0), np.asarray(per)
        f0 = np.where(per < threshold, 0.0, f0_raw).astype(np.float32)
        if hop != HOP_SIZE:
            # resample the analysis-hop track onto the pipeline's 10 ms
            # frame grid (the reference interpolates torchcrepe's
            # hop_length output to p_len the same way). Interpolate the
            # PRE-gating pitch: interpolating zeroed frames would drag
            # voicing-boundary frames toward spurious sub-pitch glides
            # while their interpolated periodicity still passes the gate
            t_src = np.arange(len(f0_raw)) * hop
            t_dst = np.arange(n_samples // HOP_SIZE + 1) * HOP_SIZE
            per_i = np.interp(t_dst, t_src, per)
            f0 = np.interp(t_dst, t_src, f0_raw)
            f0 = np.where(per_i < threshold, 0.0, f0).astype(np.float32)
            per = per_i.astype(np.float32)
        if return_periodicity:
            return f0, per
        return f0
