"""Tracing/profiling helpers.

The reference's closest analog is wall-clock spans
(`EpochRecorder`, realtime timings). TPU-native: xprof traces via
`jax.profiler` plus lightweight host-side span timers with JSONL export.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class SpanTimer:
    """Accumulating named wall-clock spans (per-stage pipeline timing)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_ms": round(1000 * v / max(self.counts[k], 1), 3)}
                for k, v in sorted(self.totals.items())}

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def xprof_trace(log_dir: str = "/tmp/rvc_tpu_trace"):
    """Capture an xprof/TensorBoard trace around a code block."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in xprof timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)


_GLOBAL = SpanTimer()


def global_tracer() -> SpanTimer:
    """Process-wide tracer used by the pipelines when RVC_TPU_TRACE=1."""
    return _GLOBAL


@contextlib.contextmanager
def trace_span(name: str):
    """Span on the global tracer; no-op unless RVC_TPU_TRACE=1."""
    if os.environ.get("RVC_TPU_TRACE", "0") != "1":
        yield
        return
    with _GLOBAL.span(name):
        yield
