"""e2e A/B: f32 defaults vs RVC_TPU_BF16 vs +RVC_TPU_BF16_F0 (one
process; dtype switches recompile the affected program)."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import synth_speech_like
from rvc_tpu.api import RVC
from rvc_tpu.configs import get_config


def run(rvc, audio, kwargs, n=9):
    np.asarray(rvc.infer(audio, **kwargs))  # compile/warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = np.asarray(rvc.infer(audio, **kwargs))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2], out


def main():
    duration = 13.5
    audio = synth_speech_like(duration)
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    kwargs = dict(sid=0, pitch=0.0, f0_method="rmvpe", index_rate=0.0,
                  volume_envelope=1.0, protect=0.5)

    results = {}
    for name, env in (
        ("f32", {"RVC_TPU_BF16": "0", "RVC_TPU_BF16_F0": "0"}),
        ("bf16", {"RVC_TPU_BF16": "1", "RVC_TPU_BF16_F0": "0"}),
        ("bf16+f0", {"RVC_TPU_BF16": "1", "RVC_TPU_BF16_F0": "1"}),
    ):
        os.environ.update(env)
        rvc.pipeline.refresh()
        m, out = run(rvc, audio, kwargs)
        results[name] = (m, out)
        print(f"{name:8s}: e2e {m*1e3:.1f} ms ({duration/m:.1f}x rt)",
              flush=True)

    from rvc_tpu.monitoring.voice_metrics import spectrogram_correlation
    ref = results["f32"][1]
    for name in ("bf16", "bf16+f0"):
        o = results[name][1]
        L = min(len(ref), len(o))
        sc = spectrogram_correlation(ref[:L], o[:L], 48000)
        wc = float(np.corrcoef(ref[:L], o[:L])[0, 1])
        print(f"{name} vs f32: spec_corr {sc:.5f}  wave_corr {wc:.6f}",
              flush=True)


if __name__ == "__main__":
    main()
