"""Pitch extraction subsystem.

Capability parity with `rvc_mlx/lib/mlx/pitch_extractors.py`: a unified
facade over the neural extractors (rmvpe, crepe, crepe-tiny, fcpe) and
DSP extractors (dio, harvest, pm). The reference wraps the WORLD C++
library for the DSP methods; this framework ships its own vectorized
numpy implementations (autocorrelation + YIN family) and uses pyworld
transparently when it is installed.
"""

from rvc_tpu.pitch.extractors import PitchExtractor
from rvc_tpu.pitch.autotune import Autotune, autotune_f0

__all__ = ["PitchExtractor", "Autotune", "autotune_f0"]
