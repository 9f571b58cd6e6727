"""Param-tree packing: one flat device buffer per model.

On a remote-dispatch link every jitted call marshals a handle per input
buffer; a converted RVC stack is ~600 tensors, and that marshalling —
not compute — dominates per-call latency (~0.25 ms/handle measured).
Packing the whole tree into ONE f32 buffer (static offsets, sliced and
reshaped back inside the jitted program — free views for XLA) reduces a
dispatch to a handful of handles.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PackSpec:
    def __init__(self, treedef, shapes, dtypes, offsets, sizes, total):
        self.treedef = treedef
        self.shapes = shapes
        self.dtypes = dtypes
        self.offsets = offsets
        self.sizes = sizes
        self.total = total


def pack_tree(tree: Any, dtype=jnp.float32) -> Tuple[jax.Array, PackSpec]:
    """Flatten a float pytree into one flat buffer + static spec.

    ``dtype`` is the storage (and, for float leaves, the unpack) dtype —
    pass ``jnp.bfloat16`` for a half-bandwidth buffer whose float leaves
    come back as bf16 (the inference compute-dtype policy). Non-float
    leaves round-trip through the buffer but keep their own dtype.
    """
    leaves, treedef = jax.tree.flatten(tree)
    shapes = [tuple(np.shape(l)) for l in leaves]
    dtypes = [
        dtype if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
        else jnp.asarray(l).dtype
        for l in leaves
    ]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    offsets = list(np.cumsum([0] + sizes[:-1]))
    flat = [jnp.ravel(jnp.asarray(l)).astype(dtype) for l in leaves]
    buf = jnp.concatenate(flat) if flat else jnp.zeros((0,), dtype)
    return buf, PackSpec(treedef, shapes, dtypes, offsets, sizes, int(sum(sizes)))


def unpack_tree(buf: jax.Array, spec: PackSpec) -> Any:
    """Rebuild the pytree inside a jitted program (static slices)."""
    leaves = []
    for off, size, shape, dtype in zip(spec.offsets, spec.sizes,
                                       spec.shapes, spec.dtypes):
        leaf = buf[off : off + size].reshape(shape).astype(dtype)
        leaves.append(leaf)
    return jax.tree.unflatten(spec.treedef, leaves)
