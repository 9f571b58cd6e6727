"""STFT / mel-spectrogram frontend, fully on-device.

Capability parity with the reference's audio frontends:
  * training linear spectrogram + mel (`rvc/train/mel_processing.py:10-105`):
    reflect pad (n_fft-hop)/2, center=False, periodic hann,
    mag = sqrt(re^2+im^2+1e-6), slaney mel + log(clamp 1e-5);
  * RMVPE log-mel (`rvc/lib/predictors/RMVPE.py:359-417`,
    `rvc_mlx/lib/mlx/rmvpe.py:299-315`): center=True (512 reflect pad),
    HTK mel scale with slaney area-normalisation, log(clamp 1e-5).

TPU design: framing is one `conv_general_dilated_patches` call (XLA turns
it into a tiled gather), the FFT runs on-device via XLA's rfft, and the
mel projection is a single (F, bins) x (bins, mels) matmul on the MXU.
No librosa / host round-trips anywhere.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (matches torch.hann_window / librosa sym=False)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def frame_signal(y: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """(B, T) -> (B, n_frames, frame_length) with n_frames = 1 + (T - frame_length)//hop.

    Frames start on hop boundaries, so they are g = ceil(frame/hop)
    row-slices of a (n_frames + g, hop) reshape — a few contiguous slices
    and one concat. (conv_general_dilated_patches lowers to an identity
    conv with `frame_length` channels; for the 1024-tap mel frontend that
    measured several ms per clip on v5e.)"""
    B, T = y.shape
    n_frames = 1 + (T - frame_length) // hop_length
    g = -(-frame_length // hop_length)
    need = (n_frames + g) * hop_length
    if need > T:
        y = jnp.pad(y, ((0, 0), (0, need - T)))
    else:
        y = y[:, :need]
    rows = y.reshape(B, n_frames + g, hop_length)
    frames = jnp.concatenate(
        [rows[:, i : n_frames + i] for i in range(g)], axis=-1)
    return frames[:, :, :frame_length]


def stft(
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    *,
    window: jax.Array | None = None,
    center: bool = False,
) -> jax.Array:
    """Complex STFT. y: (B, T) -> (B, n_frames, n_fft//2 + 1) complex64.

    center=True reflect-pads n_fft//2 on both sides (torch.stft semantics).
    """
    if win_length is None:
        win_length = n_fft
    if window is None:
        window = hann_window(win_length, dtype=y.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        y = jnp.pad(y, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    frames = frame_signal(y, n_fft, hop_length) * window[None, None, :]
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def spectrogram(
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
) -> jax.Array:
    """Training linear magnitude spectrogram (B, T) -> (B, n_frames, n_fft//2+1).

    Matches `spectrogram_torch`: reflect pad (n_fft-hop)//2 both sides then
    center=False STFT; magnitude = sqrt(re^2 + im^2 + 1e-6).
    """
    pad = int((n_fft - hop_length) / 2)
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    z = stft(y, n_fft, hop_length, win_length, center=False)
    return jnp.sqrt(jnp.real(z) ** 2 + jnp.imag(z) ** 2 + 1e-6)


# ---------------------------------------------------------------------------
# Mel filterbanks (our own implementation of the standard HTK/Slaney scales;
# validated against transformers.audio_utils in tests)
# ---------------------------------------------------------------------------


def _hz_to_mel(f: np.ndarray, htk: bool) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz(m: np.ndarray, htk: bool) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = m >= min_log_mel
    freqs = np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


@lru_cache(maxsize=32)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank (n_mels, n_fft//2 + 1), float32 numpy.

    Same formulas as librosa.filters.mel (the reference's source of truth).
    Cached on host; consumed as a constant by jitted code.
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin), htk), _hz_to_mel(np.array(fmax), htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        fb *= enorm[:, None]
    return fb.astype(np.float32)


def mel_spectrogram(
    y: jax.Array,
    n_fft: int,
    n_mels: int,
    sample_rate: int,
    hop_length: int,
    win_length: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jax.Array:
    """Training mel-spectrogram (B, T) -> (B, n_frames, n_mels) in log scale.

    spectrogram() then slaney mel matmul then log(clamp 1e-5), matching
    `mel_spectrogram_torch`.
    """
    spec = spectrogram(y, n_fft, hop_length, win_length)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax, htk=False))
    mel = jnp.einsum("btf,mf->btm", spec, fb)
    return jnp.log(jnp.clip(mel, min=1e-5))


def log_mel_spectrogram(
    y: jax.Array,
    n_fft: int,
    n_mels: int,
    sample_rate: int,
    hop_length: int,
    win_length: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    clamp: float = 1e-5,
) -> jax.Array:
    """center=True log-mel used by the RMVPE frontend. (B, T) -> (B, frames, mels)."""
    z = stft(y, n_fft, hop_length, win_length, center=True)
    mag = jnp.abs(z)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax, htk=htk))
    mel = jnp.einsum("btf,mf->btm", mag, fb)
    return jnp.log(jnp.clip(mel, min=clamp))
