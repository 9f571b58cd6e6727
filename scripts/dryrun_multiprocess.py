"""True multi-PROCESS dryrun of the sharded GAN training step.

The driver's `dryrun_multichip` simulates a multi-chip mesh inside one
process (8 virtual CPU devices). This script goes one step further and
validates the multi-HOST path the reference never tested
(`SURVEY.md §4`: "Multi-node/distributed testing: none"): it spawns
N_PROC python processes, each with its own virtual CPU devices, wires
them together with `jax.distributed.initialize` (gloo collectives over
localhost — the DCN stand-in), and runs ONE sharded G+D train step over
the process-spanning ("data", "model") mesh.

Usage: python scripts/dryrun_multiprocess.py [n_proc] [devices_per_proc]
"""

import os
import subprocess
import sys
import textwrap
import time

N_PROC = int(sys.argv[1]) if len(sys.argv) > 1 else 2
DEV_PER_PROC = int(sys.argv[2]) if len(sys.argv) > 2 else 2
PORT = int(os.environ.get("RVC_TPU_MP_PORT", "39511"))

WORKER = textwrap.dedent(f"""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count={DEV_PER_PROC}"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    pid = int(sys.argv[1])
    sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
    from rvc_tpu.parallel.distributed import initialize
    info = initialize("localhost:{PORT}", {N_PROC}, pid)
    assert info["process_count"] == {N_PROC}, info
    assert info["global_devices"] == {N_PROC * DEV_PER_PROC}, info
    print(f"[proc {{pid}}] {{info}}", flush=True)
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip({N_PROC * DEV_PER_PROC})
""")


def main() -> int:
    path = "/tmp/rvc_tpu_mp_worker.py"
    with open(path, "w") as f:
        f.write(WORKER)
    t0 = time.time()
    procs = [
        subprocess.Popen([sys.executable, path, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(N_PROC)
    ]
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=3600)
        print(f"--- proc {i} (rc={p.returncode}) ---")
        print(out.decode())
        rc |= p.returncode
    print(f"wall: {time.time() - t0:.1f}s")
    return rc


if __name__ == "__main__":
    sys.exit(main())
