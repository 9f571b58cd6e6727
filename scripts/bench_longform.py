"""BASELINE config 5 at its STATED shape: 64 x 60 s utterances,
data-parallel batched long-form conversion (VERDICT r3 #4).

Single chip: `BatchConverter.convert_long_batch` splits each utterance
into 10 s chunks (+1 s reflect-pad context per side), batches chunks
across utterances (`--batch-size` per dispatch), converts, reassembles.
Reports audio-seconds/s and the HBM math that sets the batch size.

Memory math (48 kHz model, bf16 policy, B = chunks/dispatch):
  input chunk    12 s x 16 kHz                      = 192k samples
  HuBERT         B x 600 frames x 768 x 13 layers   ~ B x 12 MB (bf16)
  decoder peak   B x 12 s x 48 kHz x 32ch (last up) ~ B x 37 MB f32
  waveform out   B x 576k x f16                     = B x 1.2 MB
  weights (bf16 packed)                             ~ 0.4 GB
B=8 keeps peak well under the 16 GB HBM of a v5e; raise on bigger
chips.

Usage:
  python scripts/bench_longform.py                  # 64x60s on the TPU
  python scripts/bench_longform.py --utts 4 --secs 4 --batch-size 2
  python scripts/bench_longform.py --dryrun         # 8-dev CPU mesh,
        scaled shape (64 utts kept, short clips), per-device throughput
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_utterances(n: int, seconds: float, sr: int = 16000):
    import numpy as np

    utts = []
    for i in range(n):
        rng = np.random.default_rng(100 + i)
        t = np.arange(int(seconds * sr)) / sr
        f0 = 120.0 + 60.0 * np.sin(2 * np.pi * (0.2 + 0.05 * (i % 7)) * t)
        phase = 2 * np.pi * np.cumsum(f0) / sr
        sig = sum((0.5 / h) * np.sin(h * phase + rng.uniform(0, np.pi))
                  for h in (1, 2, 3))
        env = 0.6 + 0.4 * np.sin(2 * np.pi * 1.1 * t + i)
        utts.append((0.6 * sig * env / np.abs(sig).max()).astype(np.float32))
    return utts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=64)
    ap.add_argument("--secs", type=float, default=60.0)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--chunk-seconds", type=float, default=10.0)
    ap.add_argument("--dryrun", action="store_true",
                    help="8 virtual CPU devices, scaled-down clips "
                    "(shards + reassembly exercised; throughput labeled "
                    "per-device)")
    args = ap.parse_args()

    if args.dryrun:
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        args.secs = min(args.secs, 2.0)
        args.chunk_seconds = min(args.chunk_seconds, 1.0)
        args.batch_size = max(args.batch_size, 8)

    import jax
    import numpy as np

    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config
    from rvc_tpu.parallel.infer import BatchConverter
    from rvc_tpu.parallel.mesh import make_mesh
    from rvc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=n_dev, n_model=1)

    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    bc = BatchConverter(rvc, mesh)

    utts = synth_utterances(args.utts, args.secs)
    total_audio_s = sum(len(u) for u in utts) / 16000.0

    # warmup: compile both programs at the chunk-batch shape
    warm = utts[: max(args.batch_size, n_dev)]
    warm = [u[: int(args.chunk_seconds * 16000)] for u in warm]
    t0 = time.perf_counter()
    bc.convert_long_batch(warm, chunk_seconds=args.chunk_seconds,
                          batch_size=args.batch_size)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = bc.convert_long_batch(utts, chunk_seconds=args.chunk_seconds,
                                 batch_size=args.batch_size)
    wall = time.perf_counter() - t0
    for o, u in zip(outs, utts):
        assert np.isfinite(o).all()
        assert abs(len(o) - 3 * len(u)) <= 3 * 16000 * 0.05  # 48k out

    aps = total_audio_s / wall
    print(json.dumps({
        "metric": "batched_longform_audio_s_per_s",
        "shape": f"{args.utts}x{args.secs:.0f}s",
        "chunk_seconds": args.chunk_seconds,
        "batch_size": args.batch_size,
        "n_devices": n_dev,
        "backend": jax.default_backend(),
        "wall_s": round(wall, 2),
        "compile_s": round(compile_s, 1),
        "audio_s_per_s": round(aps, 1),
        "audio_s_per_s_per_device": round(aps / n_dev, 2),
    }))


if __name__ == "__main__":
    main()
