"""Benchmark: full RVC pipeline realtime factor on one chip.

Mirrors the reference's headline benchmark (13.5 s clip through the full
pipeline: HuBERT -> RMVPE f0 -> retrieval -> synthesizer -> vocoder;
`/root/reference/README.md:24-27`: MLX 1.27 s = 10.63x realtime on
M3 Max). Prints one JSON line with the realtime factor and the ratio to
that baseline.
"""

import json
import sys
import time

import numpy as np


def synth_speech_like(duration_s: float, sr: int = 16000, seed: int = 0) -> np.ndarray:
    """Speech-like test signal: gliding f0 with harmonics, amplitude
    modulation, and unvoiced noise bursts."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(duration_s * sr)) / sr
    f0 = 140.0 + 40.0 * np.sin(2 * np.pi * 0.5 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    sig = np.zeros_like(t)
    for h, amp in [(1, 0.5), (2, 0.25), (3, 0.12), (4, 0.06)]:
        sig += amp * np.sin(h * phase + rng.uniform(0, np.pi))
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 1.3 * t)
    sig *= env
    # unvoiced bursts every ~1.5 s
    burst = (np.sin(2 * np.pi * 0.66 * t) > 0.95).astype(np.float64)
    sig = sig * (1 - burst) + burst * 0.1 * rng.standard_normal(len(t))
    return (0.7 * sig / np.abs(sig).max()).astype(np.float32)


def main():
    import os

    from rvc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    # serving configuration: split the clip at a min-energy point so the
    # second chunk's compute overlaps the first chunk's D2H + link
    # overhead (measured 154.6 -> 131.2 ms on the 13.5 s clip,
    # scripts/profile_chunk_pipeline.py; waveform-equivalence tested in
    # tests/unit/test_edge_cases.py::test_chunk_s_env_pipelined_split)
    os.environ.setdefault("RVC_TPU_CHUNK_S", "6.75")

    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config

    duration = 13.5
    audio = synth_speech_like(duration)

    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)

    kwargs = dict(sid=0, pitch=0.0, f0_method="rmvpe", index_rate=0.0,
                  volume_envelope=1.0, protect=0.5)

    # warmup (compiles all jitted stages)
    out = rvc.infer(audio, **kwargs)
    assert np.isfinite(out).all() and len(out) > 0

    # 5 runs: the tunneled link's RTT jitter dominates run-to-run spread,
    # a larger sample stabilizes the median
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = rvc.infer(audio, **kwargs)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    median = sorted(times)[len(times) // 2]
    rtf = duration / median

    baseline_rtf = 10.63  # reference MLX full pipeline, M3 Max (README.md:26)
    print(json.dumps({
        "metric": "full_pipeline_realtime_factor_13.5s",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / baseline_rtf, 3),
    }))


if __name__ == "__main__":
    main()
