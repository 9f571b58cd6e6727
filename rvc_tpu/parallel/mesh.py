"""Device mesh construction and sharding rules.

TPU-first design: a 2-D ("data", "model") mesh; batches shard over
"data" (DP over ICI/DCN), and parameter matrices with a large
model-parallel-friendly dimension shard over "model" (TP) — GSPMD
propagates activation shardings and inserts all-gather/reduce-scatter
collectives. With model=1 this degrades to pure DP, the reference's
only strategy (`rvc/train/train.py:475-478`), but scales further.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Create a ("data", "model") mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard dim 0 over "data", replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def _spec_for_array(x, model_size: int, min_size: int = 1 << 16) -> P:
    """Tensor-parallel rule: shard the largest dimension divisible by the
    model axis, if the array is big enough to be worth sharding."""
    if model_size <= 1 or x.size < min_size:
        return P()
    dims = sorted(range(x.ndim), key=lambda i: -x.shape[i])
    for d in dims:
        if x.shape[d] % model_size == 0 and x.shape[d] >= 2 * model_size:
            spec = [None] * x.ndim
            spec[d] = "model"
            return P(*spec)
    return P()


def param_shardings(params, mesh: Mesh, min_size: int = 1 << 16):
    """Pytree of NamedShardings for a param tree under the TP rule."""
    model_size = mesh.shape["model"]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, _spec_for_array(x, model_size, min_size)),
        params,
    )


def partition_params(params, mesh: Mesh, min_size: int = 1 << 16):
    """Device-put a param tree according to `param_shardings`."""
    sh = param_shardings(params, mesh, min_size)
    return jax.tree.map(jax.device_put, params, sh)
