"""Sharded training: the single-chip train step under a device mesh.

DP: batch tensors shard over "data"; TP: large params shard over "model"
(via `param_shardings`); optimizer state follows its params. XLA inserts
the gradient all-reduce (the DDP equivalent) and TP collectives from the
sharding annotations — no hand-written psums.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rvc_tpu.configs import RVCConfig
from rvc_tpu.parallel.mesh import batch_sharding, param_shardings, replicate
from rvc_tpu.train.train_step import Batch, TrainState, create_train_state, make_train_step


def shard_state(state: TrainState, mesh: Mesh, min_size: int = 1 << 16) -> TrainState:
    g_sh = param_shardings(state.g_params, mesh, min_size)
    d_sh = param_shardings(state.d_params, mesh, min_size)

    def put(tree, sh):
        return jax.tree.map(jax.device_put, tree, sh)

    return TrainState(
        g_params=put(state.g_params, g_sh),
        d_params=put(state.d_params, d_sh),
        g_opt=jax.device_put(state.g_opt, replicate(mesh)),
        d_opt=jax.device_put(state.d_opt, replicate(mesh)),
        step=jax.device_put(state.step, replicate(mesh)),
    )


def shard_batch(batch: Batch, mesh: Mesh) -> Batch:
    return Batch(*[
        jax.device_put(x, batch_sharding(mesh, x.ndim)) for x in batch
    ])


def make_sharded_train_step(
    cfg: RVCConfig,
    net_g,
    net_d,
    mesh: Mesh,
    steps_per_epoch: int = 100,
    adversarial: bool = True,
):
    """The same jitted G+D update, constrained to the mesh. Inputs arrive
    pre-sharded (shard_state / shard_batch); jit propagates shardings."""
    step = make_train_step(cfg, net_g, net_d, steps_per_epoch, adversarial)

    def sharded_step(state, batch, rng):
        with jax.set_mesh(mesh):
            return step(state, batch, rng)

    return sharded_step
