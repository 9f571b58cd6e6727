"""Multi-chip/multi-host scaling via jax.sharding.

The reference's only distributed strategy is single-node DDP
(`rvc/train/train.py:337-478`). Here the TPU-native replacement: a
(data x model) device mesh, batch sharded over "data", large parameter
matrices sharded over "model" (GSPMD inserts the ICI collectives),
host-sharded input iteration, and sharded retrieval (each shard scans its
vector slice; global top-k merge).
"""

from rvc_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicate,
    partition_params,
    param_shardings,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate",
    "partition_params",
    "param_shardings",
]
