"""Turnkey multi-host pod benchmark (VERDICT r2 #4).

Measures audio-seconds/s throughput on REAL multi-host hardware for
both workloads, and the weak-scaling efficiency vs a single-host
baseline number:

  train: the sharded GAN train step (global batch = per-device batch x
         n_devices, fixed per device — weak scaling)
  infer: sharded batched conversion (BatchConverter over the "data"
         axis; rows of equal-length audio)

Launch one process per host, e.g. on a 2-host pod:

  host0$ python scripts/bench_pod.py --coordinator host0:8476 \
             --num_hosts 2 --host_id 0 --mode train
  host1$ ... --host_id 1 ...

Then efficiency vs single host:

  python scripts/bench_pod.py --mode train            # 1 host, note audio_s_per_s
  ... 2-host run with --baseline <that number> prints efficiency =
  audio_s_per_s / (baseline * n_hosts); the repo's target is >=0.80
  (BASELINE.json). This cannot be measured in the single-chip dev
  environment — this script IS the measurement for the day hardware
  exists; `scripts/bench_scaling.py` provides the CPU-mesh sharding
  proxy meanwhile.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num_hosts", type=int, default=None)
    ap.add_argument("--host_id", type=int, default=None)
    ap.add_argument("--mesh_model", type=int, default=1)
    ap.add_argument("--mode", choices=["train", "infer"], default="train")
    ap.add_argument("--batch_per_device", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--frames", type=int, default=400,
                    help="train: frames per sample; infer: 10ms frames per row")
    ap.add_argument("--sample_rate", type=int, default=48000)
    ap.add_argument("--baseline", type=float, default=None,
                    help="single-host audio_s_per_s for efficiency")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (smoke-test the script on CPU)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env alone is too late "
                         "on images whose sitecustomize pre-imports jax)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rvc_tpu.parallel.distributed import global_mesh, initialize

    info = initialize(args.coordinator, args.num_hosts, args.host_id)
    mesh = global_mesh(n_model=args.mesh_model)
    n_dev = mesh.size
    first = jax.process_index() == 0
    if first:
        print(f"pod: {info}; mesh={dict(mesh.shape)}")

    from rvc_tpu.configs import get_config

    tiny = dict(model_spk_embed_dim=2, model_n_layers=1,
                model_upsample_initial_channel=64,
                train_segment_size=320 * 12) if args.tiny else {}

    if args.mode == "train":
        from rvc_tpu.parallel.train import (make_sharded_train_step,
                                            shard_batch, shard_state,
                                            state_bytes_per_device)
        from rvc_tpu.train.train_step import Batch, create_train_state

        cfg = get_config(args.sample_rate,
                         **{"model_spk_embed_dim": 4, **tiny})
        state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
        state = shard_state(state, mesh)
        if first:
            print("state memory:", state_bytes_per_device(state, mesh))
        step = make_sharded_train_step(cfg, net_g, net_d, mesh, state=state)

        B_local = args.batch_per_device * len(jax.local_devices())
        T = args.frames
        hop = cfg.data.hop_length
        rng = np.random.default_rng(jax.process_index())
        batch = Batch(
            phone=rng.standard_normal((B_local, T, 768)).astype(np.float32),
            phone_lengths=np.full((B_local,), T, np.int32),
            pitch=rng.integers(1, 255, (B_local, T)).astype(np.int32),
            pitchf=np.full((B_local, T), 200.0, np.float32),
            spec=rng.standard_normal(
                (B_local, T, cfg.data.spec_channels)).astype(np.float32),
            spec_lengths=np.full((B_local,), T, np.int32),
            wave=(0.1 * rng.standard_normal((B_local, T * hop))).astype(np.float32),
            sid=rng.integers(0, cfg.model.spk_embed_dim,
                             (B_local,)).astype(np.int32),
        )
        batch = shard_batch(batch, mesh)
        rngk = jax.random.PRNGKey(1)
        state, m = step(state, batch, rngk)
        jax.block_until_ready(m["loss_g_total"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, batch, rngk)
        jax.block_until_ready(m["loss_g_total"])
        dt = (time.perf_counter() - t0) / args.steps
        audio_s = args.batch_per_device * n_dev * T * hop / cfg.data.sample_rate
    else:
        from rvc_tpu.api import RVC
        from rvc_tpu.parallel.infer import BatchConverter

        cfg = get_config(args.sample_rate,
                         **{"model_spk_embed_dim": 4, **tiny})
        rvc = RVC(config=cfg, seed=0)
        bc = BatchConverter(rvc, mesh)
        B = args.batch_per_device * n_dev
        T16 = args.frames * 160
        rng = np.random.default_rng(0)
        t = np.arange(T16) / 16000
        audio = np.stack([
            (0.4 * np.sin(2 * np.pi * (120 + 10 * (i % 16)) * t)).astype(np.float32)
            for i in range(B)])
        out = bc.convert_batch(audio)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = bc.convert_batch(audio)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.steps
        audio_s = B * T16 / 16000

    result = {
        "mode": args.mode, "n_devices": int(n_dev),
        "n_hosts": int(jax.process_count()),
        "global_batch": int(args.batch_per_device * n_dev),
        "step_s": round(dt, 4),
        "audio_s_per_s": round(audio_s / dt, 2),
    }
    if args.baseline:
        result["scaling_efficiency"] = round(
            (audio_s / dt) / (args.baseline * jax.process_count()), 3)
    if first:
        print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
