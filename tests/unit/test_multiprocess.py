"""Multi-PROCESS distributed tests (the path the reference never tested —
SURVEY.md §4: "Multi-node/distributed testing: none").

Spawns real python processes, each owning its own virtual CPU devices,
joined with `jax.distributed.initialize` (gloo collectives over
localhost stand in for DCN). Validates that the `rvc_tpu.parallel`
helpers — process-spanning mesh, `batch_sharding` / `param_shardings`
device placement, and the jit-inserted gradient all-reduce (the DDP
equivalent of `rvc/train/train.py:475-478`) — work across process
boundaries, not just inside one process.

The full GAN-step variant lives in `scripts/dryrun_multiprocess.py`
(too heavy for the suite on a 2-core box).
"""

import subprocess
import sys

import numpy as np
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    pid = int(sys.argv[1]); port = sys.argv[2]
    sys.path.insert(0, os.getcwd())

    from rvc_tpu.parallel.distributed import initialize

    info = initialize(f"localhost:{port}", 2, pid)
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 4, info
    assert info["local_devices"] == 2, info

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from rvc_tpu.parallel.mesh import (
        batch_sharding, make_mesh, param_shardings, replicate)

    # (data=2, model=2) mesh spanning both processes
    mesh = make_mesh(n_data=2, n_model=2)
    assert {d.process_index for d in mesh.devices.flat} == {0, 1}

    rng = np.random.default_rng(0)
    params = {
        "w": rng.standard_normal((256, 512)).astype(np.float32),
        "b": np.zeros((512,), np.float32),
    }
    sh = param_shardings(params, mesh, min_size=1 << 10)
    # the TP rule must shard the big matrix over "model" and replicate b
    assert "model" in str(sh["w"].spec), sh["w"]
    params = jax.tree.map(jax.device_put, params, sh)
    x = jax.device_put(rng.standard_normal((8, 256)).astype(np.float32),
                       batch_sharding(mesh, 2))

    def loss_fn(p, x):
        y = x @ p["w"] + p["b"]
        return jnp.mean((y - 1.0) ** 2)

    @jax.jit
    def step(p, x):
        loss, g = jax.value_and_grad(loss_fn)(p, x)
        # SGD update; jit inserts the cross-process grad all-reduce
        return loss, jax.tree.map(lambda a, b: a - 0.01 * b, p, g)

    loss0, params = step(params, x)
    loss1, params = step(params, x)
    assert float(loss1) < float(loss0), (loss0, loss1)

    # every process must see the same (replicated) loss; the explicit
    # host-level broadcast exercises a cross-process collective directly
    sync = multihost_utils.broadcast_one_to_all(np.asarray(float(loss1)))
    np.testing.assert_allclose(sync, float(loss1), rtol=1e-6)
    print(f"OK pid={pid} loss0={float(loss0):.6f} loss1={float(loss1):.6f}",
          flush=True)
""")


@pytest.mark.slow
def test_two_process_mesh_train_update(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = "39621"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd="/root/repo")
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"OK pid={i}" in out, out
    # both processes converged to the identical loss value
    l0 = outs[0].split("loss1=")[1].split()[0]
    l1 = outs[1].split("loss1=")[1].split()[0]
    assert l0 == l1, (l0, l1)


def _write_corpus(exp_dir, n=8, T=48, spec_ch=513, hop=320, sr=32000):
    """Synthetic extracted dataset in the filelist layout cmd_train reads."""
    import os

    import numpy as np

    from rvc_tpu.utils.audio import save_wav

    os.makedirs(exp_dir, exist_ok=True)
    rng = np.random.default_rng(7)
    rows = []
    for i in range(n):
        base = os.path.join(exp_dir, f"s{i}")
        feats = rng.standard_normal((T // 2, 768)).astype(np.float32)
        f0 = np.full(T, 150.0 + 10 * i, np.float32)
        f0c = np.clip((f0 / 4).astype(np.int32), 1, 255)
        spec = rng.standard_normal((T, spec_ch)).astype(np.float32)
        wav = (0.1 * rng.standard_normal(T * hop)).astype(np.float32)
        np.save(base + "_feats.npy", feats)
        np.save(base + "_f0.npy", f0)
        np.save(base + "_f0c.npy", f0c)
        np.save(base + "_spec.npy", spec)
        save_wav(base + ".wav", wav, sr)
        rows.append("|".join([base + ".wav", base + "_feats.npy",
                              base + "_f0.npy", base + "_f0c.npy", "0",
                              base + "_spec.npy"]))
    with open(os.path.join(exp_dir, "filelist_train.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")


_TINY = ('{"model_spk_embed_dim": 2, "model_n_layers": 1, '
         '"model_upsample_initial_channel": 64, '
         '"train_segment_size": 3840}')


def _run_cli_train(logs_dir, model_name, batch_size, env_extra, extra_args,
                   timeout=1500):
    import os

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra)
    cmd = [sys.executable, "-m", "rvc_tpu.cli", "--device", "cpu", "train",
           "--model_name", model_name, "--logs_dir", str(logs_dir),
           "--sample_rate", "32000", "--total_epoch", "2",
           "--batch_size", str(batch_size), "--save_every_epoch", "5",
           "--warmup_epochs", "0", "--no_shuffle",
           "--config_overrides", _TINY] + extra_args
    return subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, cwd="/root/repo",
                            env=env)


@pytest.mark.slow
def test_cli_train_two_process_matches_single(tmp_path):
    """One CLI command trains across 2 gloo-joined processes; the loss
    trajectory matches a single-process run at the same global batch
    (VERDICT round-1 item 3). Global batch 8 = 1x8 = 2 hosts x 4."""
    import json
    import os

    _write_corpus(tmp_path / "solo" / "m")
    _write_corpus(tmp_path / "dual" / "m")

    p = _run_cli_train(tmp_path / "solo", "m", 8, {}, [])
    out, _ = p.communicate(timeout=1500)
    assert p.returncode == 0, out.decode()

    port = "39733"
    procs = [
        _run_cli_train(
            tmp_path / "dual", "m", 4,
            {"JAX_CPU_COLLECTIVES_IMPLEMENTATION": "gloo"},
            ["--coordinator", f"localhost:{port}", "--num_hosts", "2",
             "--host_id", str(i)])
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1500)[0].decode() for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}:\n{o}"

    def traj(d):
        log = os.path.join(d, "m", "ckpt", "train_log.jsonl")
        return [json.loads(l)["loss_g_total"] for l in open(log)]

    solo, dual = traj(tmp_path / "solo"), traj(tmp_path / "dual")
    assert len(solo) == len(dual) == 2
    assert len(set(np.round(solo, 10))) >= 1
    np.testing.assert_allclose(dual, solo, rtol=2e-3)
    # the exported model exists exactly once (host-0-only writes)
    assert os.path.exists(tmp_path / "dual" / "m" / "m.safetensors")
