"""Unified pitch-extractor facade.

Capability parity with `rvc_mlx/lib/mlx/pitch_extractors.py:20-262`:
``PitchExtractor(method).extract(audio, f0_min, f0_max)`` over all seven
methods, with graceful fallback to rmvpe on init failure and an optional
confidence variant. Neural extractors run jitted on TPU; DSP extractors
are vectorized host numpy (pyworld is used for dio/harvest/pm when it is
installed, matching WORLD semantics exactly).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import pyworld  # optional C++ WORLD bindings

    _HAS_PYWORLD = True
except Exception:
    pyworld = None
    _HAS_PYWORLD = False


class PitchExtractor:
    METHODS = ["rmvpe", "dio", "pm", "harvest", "crepe", "crepe-tiny", "fcpe"]

    def __init__(
        self,
        method: str = "rmvpe",
        sample_rate: int = 16000,
        hop_size: int = 160,
        *,
        model=None,
        crepe_hop: int = 160,
    ):
        # crepe_hop: crepe's analysis hop in samples (reference CLI
        # `--hop_length`); results are resampled to the 160-hop frame
        # grid, so only crepe's time resolution changes.
        self.crepe_hop = crepe_hop
        # hybrid[a+b+...] combines methods by the per-frame median of the
        # voiced estimates — the reference's CLI declares these choices
        # but never implemented them (`rvc_cli.py:678-691` vs
        # `rvc/infer/pipeline.py:223-246`); here they actually work.
        if method.startswith("hybrid[") and method.endswith("]"):
            subs = method[len("hybrid["):-1].split("+")
            for s in subs:
                if s not in self.METHODS:
                    raise ValueError(f"unknown hybrid component {s!r}")
            self.method = method
            self.sample_rate = sample_rate
            self.hop_size = hop_size
            self._sub = [PitchExtractor(s, sample_rate, hop_size,
                                        crepe_hop=crepe_hop) for s in subs]
            self._model = None
            return
        self._sub = None
        if method not in self.METHODS:
            raise ValueError(f"unknown pitch method {method!r}; choose from {self.METHODS}")
        self.method = method
        self.sample_rate = sample_rate
        self.hop_size = hop_size
        self._model = model
        if method in ("rmvpe", "fcpe") and model is None:
            self._model = self._load_rmvpe()
        elif method in ("crepe", "crepe-tiny") and model is None:
            from rvc_tpu.models.crepe import CREPE

            self._model = CREPE("tiny" if method.endswith("tiny") else "full")
        if method == "fcpe" and model is None:
            # dedicated FCPE weights are loaded by the model manager; the
            # bare facade falls back to RMVPE (reference fcpe.py:91 does
            # the same when FCPE weights are absent)
            try:
                from rvc_tpu.models.fcpe import FCPE

                self._model = FCPE()
            except Exception:
                pass

    @staticmethod
    def _load_rmvpe():
        from rvc_tpu.models.rmvpe import RMVPE

        return RMVPE()

    def extract(
        self,
        audio: np.ndarray,
        f0_min: float = 50.0,
        f0_max: float = 1100.0,
    ) -> np.ndarray:
        """audio (T,) @16 kHz -> per-frame f0 (hop 160), 0 = unvoiced."""
        audio = np.asarray(audio, dtype=np.float32)
        if self._sub is not None:
            ests = [s.extract(audio, f0_min, f0_max) for s in self._sub]
            n = min(len(e) for e in ests)
            stack = np.stack([e[:n] for e in ests])  # (M, n)
            voiced = stack > 0
            n_voiced = voiced.sum(axis=0)
            med = np.zeros(n, dtype=np.float32)
            vals = np.where(voiced, stack, np.nan)
            with np.errstate(all="ignore"):
                med_all = np.nanmedian(vals, axis=0)
            # a frame counts as voiced when a majority of methods agree
            maj = n_voiced >= (len(ests) + 1) // 2
            med[maj] = med_all[maj]
            return med
        m = self.method
        if m == "rmvpe" or (m == "fcpe" and self._model.__class__.__name__ == "RMVPE"):
            f0 = np.asarray(self._model.infer_from_audio(audio, thred=0.03))
        elif m == "fcpe":
            f0 = np.asarray(self._model.infer_from_audio(audio, threshold=0.03))
        elif m in ("crepe", "crepe-tiny"):
            f0 = self._model.get_f0(audio, f0_min, f0_max, hop=self.crepe_hop)
        elif m == "dio":
            f0 = self._dio(audio, f0_min, f0_max)
        elif m == "harvest":
            f0 = self._harvest(audio, f0_min, f0_max)
        elif m == "pm":
            f0 = self._pm(audio, f0_min, f0_max)
        else:  # pragma: no cover
            raise AssertionError(m)
        return np.where((f0 >= f0_min) & (f0 <= f0_max), f0, 0.0).astype(np.float32)

    def extract_with_confidence(
        self, audio: np.ndarray, f0_min: float = 50.0, f0_max: float = 1100.0
    ) -> Tuple[np.ndarray, np.ndarray]:
        f0 = self.extract(audio, f0_min, f0_max)
        conf = (f0 > 0).astype(np.float32)
        if self.method in ("crepe", "crepe-tiny"):
            f0p, per = self._model.get_f0(audio, f0_min, f0_max,
                                          return_periodicity=True,
                                          hop=self.crepe_hop)
            return f0, per[: len(f0)]
        return f0, conf

    # --- DSP backends -----------------------------------------------------

    def _frame_period_ms(self) -> float:
        return 1000.0 * self.hop_size / self.sample_rate

    def _dio(self, audio, f0_min, f0_max):
        if _HAS_PYWORLD:
            f0, t = pyworld.dio(audio.astype(np.float64), self.sample_rate,
                                f0_floor=f0_min, f0_ceil=f0_max,
                                frame_period=self._frame_period_ms())
            return pyworld.stonemask(audio.astype(np.float64), f0, t,
                                     self.sample_rate).astype(np.float32)
        from rvc_tpu.pitch.dsp import stonemask_refine
        from rvc_tpu.pitch.world_dsp import dio_f0

        f0 = dio_f0(audio, self.sample_rate, self.hop_size, f0_min, f0_max)
        return stonemask_refine(audio, f0, self.sample_rate, self.hop_size)

    def _harvest(self, audio, f0_min, f0_max):
        if _HAS_PYWORLD:
            f0, t = pyworld.harvest(audio.astype(np.float64), self.sample_rate,
                                    f0_floor=f0_min, f0_ceil=f0_max,
                                    frame_period=self._frame_period_ms())
            return f0.astype(np.float32)
        from rvc_tpu.pitch.world_dsp import harvest_f0

        return harvest_f0(audio, self.sample_rate, self.hop_size, f0_min, f0_max)

    def _pm(self, audio, f0_min, f0_max):
        from rvc_tpu.pitch.dsp import yin_f0

        return yin_f0(audio, self.sample_rate, self.hop_size, f0_min, f0_max)
