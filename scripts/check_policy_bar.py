"""Measure the serving-policy parity legs on the real TPU without the
timed bench: runs bench.self_check only (staged f32 oracle vs fused
exact/policy legs) and prints every metric, including the reference's
80-mel log-power correlation (`benchmark_audio_parity.py:396-419`) that
gates the policy legs at the reference's own 0.95 bar (VERDICT r4 #2).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config
    from rvc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    os.environ.setdefault("RVC_TPU_CHUNK_S", "6.75")
    audio = bench.synth_speech_like(13.5)
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    rvc.index = bench.bench_index()
    corrs = bench.self_check(rvc, audio)
    print(json.dumps({k: round(float(v), 6) for k, v in corrs.items()}))


if __name__ == "__main__":
    main()
