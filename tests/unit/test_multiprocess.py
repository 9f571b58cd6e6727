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
