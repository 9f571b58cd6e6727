"""Conversion pipelines: offline (batch) and realtime (SOLA streaming)."""

from rvc_tpu.pipelines.offline import Pipeline

__all__ = ["Pipeline"]
