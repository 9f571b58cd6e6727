"""Sharded training: the single-chip train step under a device mesh.

DP: batch tensors shard over "data"; TP: large params shard over "model"
(via `param_shardings`); optimizer moments are ZeRO-1 sharded over both
axes (`opt_state_shardings`). XLA inserts the gradient all-reduce (the
DDP equivalent), the ZeRO-1 update all-gather, and TP collectives from
the sharding annotations — no hand-written psums.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rvc_tpu.configs import RVCConfig
from rvc_tpu.parallel.mesh import (batch_sharding, opt_state_shardings,
                                   param_shardings, replicate)
from rvc_tpu.train.train_step import Batch, TrainState, create_train_state, make_train_step


def shard_state(state: TrainState, mesh: Mesh, min_size: int = 1 << 16) -> TrainState:
    """Place a TrainState on the mesh: params follow the TP rule
    (replicated over "data", large dims split over "model") and optimizer
    moments are ZeRO-1 sharded over BOTH axes — per-device optimizer
    bytes scale ~1/n_devices (the reference's DDP replicates them,
    `rvc/train/train.py:475-478`)."""
    g_sh = param_shardings(state.g_params, mesh, min_size)
    d_sh = param_shardings(state.d_params, mesh, min_size)

    def put(tree, sh):
        return jax.tree.map(jax.device_put, tree, sh)

    return TrainState(
        g_params=put(state.g_params, g_sh),
        d_params=put(state.d_params, d_sh),
        g_opt=put(state.g_opt, opt_state_shardings(state.g_opt, mesh, min_size)),
        d_opt=put(state.d_opt, opt_state_shardings(state.d_opt, mesh, min_size)),
        step=jax.device_put(state.step, replicate(mesh)),
    )


def state_bytes_per_device(state: TrainState, mesh: Mesh) -> dict:
    """Memory accounting: global vs per-device bytes for params and
    optimizer state under the current shardings (ZeRO-1 evidence)."""
    def tally(tree):
        glob = dev = 0
        for leaf in jax.tree.leaves(tree):
            nbytes = leaf.size * leaf.dtype.itemsize
            glob += nbytes
            sh = getattr(leaf, "sharding", None)
            n_shards = 1
            if sh is not None:
                n_shards = max(1, len(set(
                    tuple(idx) if isinstance(idx, tuple) else idx
                    for idx in sh.devices_indices_map(leaf.shape).values())))
            dev += nbytes // n_shards
        return glob, dev

    pg, pd = tally((state.g_params, state.d_params))
    og, od = tally((state.g_opt, state.d_opt))
    return {
        "param_bytes_global": pg, "param_bytes_per_device": pd,
        "opt_bytes_global": og, "opt_bytes_per_device": od,
        "n_devices": mesh.size,
    }


def shard_batch(batch: Batch, mesh: Mesh) -> Batch:
    """Place a host-local batch onto the mesh's "data" axis.

    Single-host: a plain device_put slice. Multi-host: each host's loader
    yields its OWN rows (`DataLoader(num_hosts, host_id)` strides the
    batch list), so the global batch is assembled from process-local data
    — the jax-native DistributedBucketSampler (global batch =
    per-host batch x num_hosts, every row consumed exactly once)."""
    multihost = any(d.process_index != jax.process_index()
                    for d in mesh.devices.flat)

    def put(x):
        sh = batch_sharding(mesh, getattr(x, "ndim", 0))
        if multihost:
            import numpy as np

            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return Batch(*[put(x) for x in batch])


def make_sharded_train_step(
    cfg: RVCConfig,
    net_g,
    net_d,
    mesh: Mesh,
    steps_per_epoch: int = 100,
    adversarial: bool = True,
    state: Optional[TrainState] = None,
):
    """The same jitted G+D update, constrained to the mesh. Inputs arrive
    pre-sharded (shard_state / shard_batch). Pass the sharded `state` so
    the output layout is PINNED to the input layout (params replicated
    over "data", moments ZeRO-1 sharded): otherwise GSPMD may re-layout
    params toward the sharded moments, recompiling on step 2 and leaving
    params cross-host-sharded — which turns host-local param fetches
    into collectives and hangs any host that fetches alone (e.g. the
    main-host model export)."""
    out_shardings = None
    if state is not None:
        out_shardings = (jax.tree.map(lambda x: x.sharding, state),
                         replicate(mesh))
    step = make_train_step(cfg, net_g, net_d, steps_per_epoch, adversarial,
                           out_shardings=out_shardings)

    def sharded_step(state, batch, rng):
        with jax.set_mesh(mesh):
            return step(state, batch, rng)

    return sharded_step
