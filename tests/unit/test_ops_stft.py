"""STFT/mel frontend vs torch.stft + transformers mel filterbanks."""

import numpy as np
import torch

import jax.numpy as jnp

from rvc_tpu.ops.stft import (
    hann_window,
    stft,
    spectrogram,
    mel_filterbank,
    mel_spectrogram,
    log_mel_spectrogram,
)


def test_hann_window_periodic():
    ref = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(np.asarray(hann_window(1024)), ref, atol=1e-6)


def test_stft_matches_torch_center_false(sine_wave):
    y, sr = sine_wave
    n_fft, hop = 1024, 160
    ref = torch.stft(
        torch.from_numpy(y)[None], n_fft=n_fft, hop_length=hop, win_length=n_fft,
        window=torch.hann_window(n_fft), center=False, return_complex=True,
    ).numpy()  # (1, F, T)
    out = np.asarray(stft(jnp.asarray(y)[None], n_fft, hop, center=False))  # (1, T, F)
    out = out.transpose(0, 2, 1)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.abs(out), np.abs(ref), rtol=1e-3, atol=1e-4)


def test_stft_matches_torch_center_true(chirp_wave):
    y, sr = chirp_wave
    n_fft, hop = 1024, 160
    ref = torch.stft(
        torch.from_numpy(y)[None], n_fft=n_fft, hop_length=hop,
        window=torch.hann_window(n_fft), center=True, pad_mode="reflect",
        return_complex=True,
    ).numpy()
    out = np.asarray(stft(jnp.asarray(y)[None], n_fft, hop, center=True)).transpose(0, 2, 1)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.abs(out), np.abs(ref), rtol=1e-3, atol=1e-4)


def _torch_spectrogram(y, n_fft, hop, win):
    # independent re-statement of spectrogram_torch (rvc/train/mel_processing.py:10)
    yt = torch.from_numpy(y)[None]
    pad = int((n_fft - hop) / 2)
    yt = torch.nn.functional.pad(yt[None], (pad, pad), mode="reflect")[0]
    spec = torch.stft(yt, n_fft, hop_length=hop, win_length=win,
                      window=torch.hann_window(win), center=False,
                      return_complex=True)
    return torch.sqrt(spec.real.pow(2) + spec.imag.pow(2) + 1e-6).numpy()


def test_training_spectrogram_matches_reference_semantics(chirp_wave):
    y, _ = chirp_wave
    n_fft, hop, win = 2048, 480, 2048
    ref = _torch_spectrogram(y, n_fft, hop, win)  # (1, F, T)
    out = np.asarray(spectrogram(jnp.asarray(y)[None], n_fft, hop, win)).transpose(0, 2, 1)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_mel_filterbank_matches_transformers_slaney():
    from transformers.audio_utils import mel_filter_bank

    ref = mel_filter_bank(
        num_frequency_bins=1025, num_mel_filters=128, min_frequency=0.0,
        max_frequency=24000.0, sampling_rate=48000, norm="slaney",
        mel_scale="slaney",
    ).T  # transformers returns (freq, mel)
    ours = mel_filterbank(48000, 2048, 128, 0.0, None, htk=False, norm="slaney")
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_mel_filterbank_matches_transformers_htk():
    from transformers.audio_utils import mel_filter_bank

    # RMVPE frontend: htk scale + slaney area norm (librosa defaults)
    ref = mel_filter_bank(
        num_frequency_bins=513, num_mel_filters=128, min_frequency=30.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="htk",
    ).T
    ours = mel_filterbank(16000, 1024, 128, 30.0, 8000.0, htk=True, norm="slaney")
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_mel_spectrogram_shape_and_range(chirp_wave):
    y, _ = chirp_wave
    out = np.asarray(mel_spectrogram(jnp.asarray(y)[None], 2048, 128, 48000, 480, 2048))
    assert out.shape[0] == 1 and out.shape[2] == 128
    assert out.min() >= np.log(1e-5) - 1e-5
    assert np.isfinite(out).all()


def test_rmvpe_log_mel_center_true(sine_wave):
    y, sr = sine_wave
    out = np.asarray(
        log_mel_spectrogram(jnp.asarray(y)[None], 1024, 128, 16000, 160, 1024,
                            fmin=30, fmax=8000, htk=True)
    )
    # center=True -> n_frames = 1 + T//hop
    assert out.shape == (1, 1 + len(y) // 160, 128)
    # 220 Hz sine should put energy in the low mel bins
    peak_bin = out[0].mean(axis=0).argmax()
    assert peak_bin < 30
