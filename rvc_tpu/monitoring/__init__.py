"""Training monitoring: trackers + voice-quality metrics."""

from rvc_tpu.monitoring.tracker import SimpleTracker, create_tracker
from rvc_tpu.monitoring.voice_metrics import (
    f0_accuracy,
    mel_cepstral_distortion,
    spectrogram_correlation,
    signal_to_noise_ratio,
)

__all__ = [
    "SimpleTracker",
    "create_tracker",
    "f0_accuracy",
    "mel_cepstral_distortion",
    "spectrogram_correlation",
    "signal_to_noise_ratio",
]
