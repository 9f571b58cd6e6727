"""Pallas fused mel kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from rvc_tpu.ops.pallas.melspec import pallas_log_mel
from rvc_tpu.ops.stft import log_mel_spectrogram


@pytest.mark.parametrize("T", [16000, 8000])
def test_pallas_mel_matches_xla(sine_wave, T):
    y, sr = sine_wave
    a = jnp.asarray(y[:T])[None]
    ref = np.asarray(log_mel_spectrogram(a, 1024, 128, 16000, 160, 1024,
                                         fmin=30, fmax=8000, htk=True))
    out = np.asarray(pallas_log_mel(a, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-3)
