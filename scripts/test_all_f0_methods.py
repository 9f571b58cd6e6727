"""Integration runner: full conversion through EVERY f0 method
(the reference's `test_rvc_all_methods.py` / `test_all_f0_methods.py`
capability). Uses a random-weight tiny model unless --model is given.

Usage: python scripts/test_all_f0_methods.py [--model m.safetensors]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

METHODS = ["rmvpe", "crepe", "crepe-tiny", "fcpe", "dio", "pm", "harvest",
           "hybrid[rmvpe+fcpe]"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the TPU plugin registers "
                         "itself in every process; env vars alone don't win)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config

    if args.model:
        rvc = RVC(args.model)
    else:
        cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                         model_upsample_initial_channel=64)
        rvc = RVC(config=cfg, seed=0)

    sr = 16000
    t = np.arange(int(args.seconds * sr)) / sr
    audio = (0.5 * np.sin(2 * np.pi * (150 + 60 * np.sin(2 * np.pi * 0.7 * t)) * t)
             ).astype(np.float32)

    results = {}
    for m in METHODS:
        t0 = time.perf_counter()
        try:
            out = rvc.infer(audio, f0_method=m, index_rate=0.0)
            ok = bool(np.isfinite(out).all()) and len(out) > 0
            results[m] = {"ok": ok, "seconds": round(time.perf_counter() - t0, 2),
                          "out_samples": int(len(out))}
        except Exception as e:  # pragma: no cover
            results[m] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
    print(json.dumps(results, indent=2))
    failed = [m for m, r in results.items() if not r.get("ok")]
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
