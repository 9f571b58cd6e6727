"""Weak-scaling curve on the virtual CPU mesh (VERDICT r2 #4).

Times the sharded GAN train step at 1 / 4 / 8 virtual devices with a
FIXED per-device batch (weak scaling): steps/s and audio-seconds/s per
mesh size. Each mesh size runs in a fresh subprocess because the
virtual-device count must be set before jax initializes.

CAVEAT (stated next to every number this produces): virtual CPU devices
share one physical CPU's cores, so this curve measures SHARDING OVERHEAD
(collective insertion, partitioned compile), not real chip scaling —
ideal weak scaling here is flat audio-seconds/s TOTAL (each "device"
adds no new silicon). The real >=80% audio-seconds/s target needs real
multi-host hardware: run `scripts/bench_pod.py` there.

Usage: python scripts/bench_scaling.py [--sizes 1,4,8] [--steps 8]
"""

import argparse
import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys, time, json
    n_dev = int(sys.argv[1]); n_steps = int(sys.argv[2]); b_pd = int(sys.argv[3])
    T = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_dev}"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    sys.path.insert(0, %(repo)r)
    from rvc_tpu.configs import get_config
    from rvc_tpu.parallel.mesh import make_mesh
    from rvc_tpu.parallel.train import (make_sharded_train_step, shard_batch,
                                        shard_state)
    from rvc_tpu.train.train_step import Batch, create_train_state

    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64,
                     train_segment_size=320 * 12)
    mesh = make_mesh(n_data=n_dev, n_model=1)
    state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
    state = shard_state(state, mesh, min_size=1 << 14)
    step = make_sharded_train_step(cfg, net_g, net_d, mesh, state=state)

    B = b_pd * n_dev
    hop = cfg.data.hop_length
    rng = np.random.default_rng(0)
    batch = Batch(
        phone=jnp.asarray(rng.standard_normal((B, T, 768)).astype(np.float32)),
        phone_lengths=jnp.full((B,), T, dtype=jnp.int32),
        pitch=jnp.asarray(rng.integers(1, 255, (B, T)).astype(np.int32)),
        pitchf=jnp.full((B, T), 200.0),
        spec=jnp.asarray(rng.standard_normal((B, T, cfg.data.spec_channels)).astype(np.float32)),
        spec_lengths=jnp.full((B,), T, dtype=jnp.int32),
        wave=jnp.asarray((0.1 * rng.standard_normal((B, T * hop))).astype(np.float32)),
        sid=jnp.asarray(rng.integers(0, 2, (B,)).astype(np.int32)),
    )
    batch = shard_batch(batch, mesh)
    rngk = jax.random.PRNGKey(1)
    state, m = step(state, batch, rngk)          # compile + warmup
    jax.block_until_ready(m["loss_g_total"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step(state, batch, rngk)
    jax.block_until_ready(m["loss_g_total"])
    dt = (time.perf_counter() - t0) / n_steps
    audio_s = B * T * hop / cfg.data.sample_rate
    print(json.dumps({"n_devices": n_dev, "global_batch": B,
                      "step_s": round(dt, 4),
                      "steps_per_s": round(1.0 / dt, 4),
                      "audio_s_per_s": round(audio_s / dt, 2)}))
""") % {"repo": REPO}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,4,8")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch_per_device", type=int, default=2)
    ap.add_argument("--frames", type=int, default=200)
    args = ap.parse_args()

    path = "/tmp/rvc_tpu_scaling_worker.py"
    with open(path, "w") as f:
        f.write(WORKER)
    rows = []
    for n in [int(s) for s in args.sizes.split(",")]:
        out = subprocess.run(
            [sys.executable, path, str(n), str(args.steps),
             str(args.batch_per_device), str(args.frames)],
            capture_output=True, text=True, timeout=3600)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode != 0 or not line:
            print(out.stdout + out.stderr, file=sys.stderr)
            return 1
        rows.append(json.loads(line[-1]))
        print(line[-1], flush=True)

    base = rows[0]
    print("\nweak-scaling (CPU-mesh proxy: measures sharding overhead, "
          "NOT chip scaling — see module docstring):")
    print(f"{'devices':>8} {'global_B':>9} {'step_s':>8} "
          f"{'audio_s/s':>10} {'vs 1-dev step':>14}")
    for r in rows:
        print(f"{r['n_devices']:>8} {r['global_batch']:>9} "
              f"{r['step_s']:>8.3f} {r['audio_s_per_s']:>10.1f} "
              f"{base['step_s'] / r['step_s']:>13.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
