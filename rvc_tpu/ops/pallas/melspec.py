"""Fused mel-spectrogram Pallas kernel (matmul-DFT on the MXU).

The designated Pallas target from the build's north star: the STFT/mel
frontend. Instead of XLA's generic FFT (a weak spot on TPU), the DFT is
expressed as two real matmuls against cos/sin basis matrices — landing on
the MXU — and the whole chain

    frame window -> DFT -> |.| -> mel filterbank -> log clamp

fuses into ONE kernel: frames stream through VMEM tile by tile, the
(n_fft, n_bins) bases and (n_bins, n_mels) filterbank stay resident, and
only the (frames, n_mels) log-mel ever returns to HBM.

Cost: 2*F*n_fft*n_bins MACs vs FFT's F*n_fft*log(n_fft) — ~50x more
FLOPs, but on a v5e MXU at ~200 TFLOP/s a 13.5 s clip costs ~3 GFLOP
(~0.05 ms), far below the HBM-bandwidth cost of materializing the
complex STFT that the unfused path pays.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rvc_tpu.ops.stft import hann_window, mel_filterbank


def _dft_bases(n_fft: int, dtype=np.float32):
    """cos/sin DFT bases including the analysis window folded in later.
    Shapes (n_fft, n_bins) with n_bins = n_fft//2 + 1."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def _mel_kernel(frames_ref, cosb_ref, sinb_ref, fb_ref, out_ref, *, clamp):
    f = frames_ref[:]                      # (TILE_F, n_fft) pre-windowed
    # HIGHEST precision: the MXU runs multi-pass bf16 for f32-equivalent
    # accuracy — needed for parity-grade log-mels near the clamp floor
    hp = jax.lax.Precision.HIGHEST
    re = jnp.dot(f, cosb_ref[:], preferred_element_type=jnp.float32, precision=hp)
    im = jnp.dot(f, sinb_ref[:], preferred_element_type=jnp.float32, precision=hp)
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, fb_ref[:], preferred_element_type=jnp.float32, precision=hp)
    out_ref[:] = jnp.log(jnp.clip(mel, min=clamp))


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "n_mels", "sample_rate", "fmin",
                     "fmax", "htk", "clamp", "tile_f", "interpret"),
)
def pallas_log_mel(
    audio: jax.Array,            # (B, T) — padded/centered by the caller
    n_fft: int = 1024,
    hop: int = 160,
    n_mels: int = 128,
    sample_rate: int = 16000,
    fmin: float = 30.0,
    fmax: float = 8000.0,
    htk: bool = True,
    clamp: float = 1e-5,
    tile_f: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """(B, T) -> (B, n_frames, n_mels) log-mel, center=True semantics."""
    B, T = audio.shape
    audio = jnp.pad(audio, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    n_frames = 1 + T // hop

    # frame + window on the XLA side (one gather-free conv-patches op);
    # everything bandwidth-heavy after that lives in the kernel
    from rvc_tpu.ops.stft import frame_signal

    win = hann_window(n_fft, dtype=audio.dtype)
    frames = frame_signal(audio, n_fft, hop) * win[None, None, :]
    frames = frames.reshape(B * n_frames, n_fft)

    # pad frame count to the tile size
    F = frames.shape[0]
    F_pad = ((F + tile_f - 1) // tile_f) * tile_f
    frames = jnp.pad(frames, ((0, F_pad - F), (0, 0)))

    cosb, sinb = _dft_bases(n_fft)
    n_bins = n_fft // 2 + 1
    # pad bins to a lane multiple for clean tiling
    bins_pad = ((n_bins + 127) // 128) * 128
    cosb = np.pad(cosb, ((0, 0), (0, bins_pad - n_bins)))
    sinb = np.pad(sinb, ((0, 0), (0, bins_pad - n_bins)))
    fb = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax, htk=htk).T  # (bins, mels)
    fb = np.pad(fb, ((0, bins_pad - n_bins), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_mel_kernel, clamp=clamp),
        grid=(F_pad // tile_f,),
        in_specs=[
            pl.BlockSpec((tile_f, n_fft), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, bins_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, bins_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bins_pad, n_mels), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_f, n_mels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F_pad, n_mels), jnp.float32),
        interpret=interpret,
    )(frames, jnp.asarray(cosb), jnp.asarray(sinb), jnp.asarray(fb))

    return out[:F].reshape(B, n_frames, n_mels)
