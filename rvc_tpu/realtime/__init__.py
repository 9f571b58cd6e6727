"""Realtime (streaming) voice conversion: SOLA-aligned block engine.

Capability parity with `rvc_mlx/realtime/` (core, pipeline, buffer, vad):
circular convert/pitch buffers, VAD + volume gating, SOLA overlap-add
alignment with sin^2 equal-power crossfade, post-FX chain. TPU design:
the convert buffer has a FIXED size, so the block converter is one
compiled program reused every block — no recompiles in the audio loop.
"""

from rvc_tpu.realtime.core import Realtime, VoiceChanger
from rvc_tpu.realtime.buffer import circular_write

__all__ = ["Realtime", "VoiceChanger", "circular_write"]
