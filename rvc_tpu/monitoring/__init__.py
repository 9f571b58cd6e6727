"""Training monitoring: trackers + voice-quality metrics."""

from rvc_tpu.monitoring.tracker import (
    AimTracker,
    RollingMean,
    SimpleTracker,
    TensorBoardTracker,
    create_tracker,
    spectrogram_image,
)
from rvc_tpu.monitoring.voice_metrics import (
    f0_accuracy,
    mel_cepstral_distortion,
    spectrogram_correlation,
    signal_to_noise_ratio,
)

__all__ = [
    "AimTracker",
    "RollingMean",
    "SimpleTracker",
    "TensorBoardTracker",
    "spectrogram_image",
    "create_tracker",
    "f0_accuracy",
    "mel_cepstral_distortion",
    "spectrogram_correlation",
    "signal_to_noise_ratio",
]
