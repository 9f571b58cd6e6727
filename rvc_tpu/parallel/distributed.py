"""Multi-host initialization and host-sharded data helpers.

TPU-native replacement for the reference's torch.distributed bootstrap
(`rvc/train/train.py:337-343`: env:// rendezvous, one process per GPU):
`jax.distributed.initialize` + process-spanning meshes; each host feeds
its shard of the global batch (`DataLoader(num_hosts, host_id)`).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX. No-ops on single-host.

    Env fallbacks mirror common launchers: COORDINATOR_ADDRESS,
    NUM_PROCESSES, PROCESS_ID (and TPU pod auto-detection when run
    under a TPU runtime that sets the usual metadata).
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", "0") or 0)
    process_id = process_id if process_id is not None else int(
        os.environ.get("PROCESS_ID", "-1"))

    if coordinator_address and num_processes > 1 and process_id >= 0:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return dict(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=len(jax.local_devices()),
        global_devices=len(jax.devices()),
    )


def global_mesh(n_model: int = 1):
    """(data x model) mesh spanning all processes' devices."""
    from rvc_tpu.parallel.mesh import make_mesh

    return make_mesh(n_model=n_model)


def host_shard_info() -> dict:
    return dict(num_hosts=jax.process_count(), host_id=jax.process_index())
