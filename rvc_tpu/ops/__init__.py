"""TPU-native op layer: the framework primitives RVC needs.

Everything here is pure-functional jnp/lax (jit/vmap/grad-safe), with
Pallas kernels for the hottest paths under ``rvc_tpu.ops.pallas``.
Canonical tensor layout throughout the framework is (B, T, C).
"""

from rvc_tpu.ops.commons import (
    sequence_mask,
    fused_add_tanh_sigmoid_multiply,
    slice_segments,
    rand_slice_segments,
)
from rvc_tpu.ops.conv import conv1d, conv_transpose1d, conv2d, conv_transpose2d
from rvc_tpu.ops.stft import (
    stft,
    spectrogram,
    mel_filterbank,
    mel_spectrogram,
    log_mel_spectrogram,
    hann_window,
)
from rvc_tpu.ops.gru import gru, bigru

__all__ = [
    "sequence_mask",
    "fused_add_tanh_sigmoid_multiply",
    "slice_segments",
    "rand_slice_segments",
    "conv1d",
    "conv_transpose1d",
    "conv2d",
    "conv_transpose2d",
    "stft",
    "spectrogram",
    "mel_filterbank",
    "mel_spectrogram",
    "log_mel_spectrogram",
    "hann_window",
    "gru",
    "bigru",
]
