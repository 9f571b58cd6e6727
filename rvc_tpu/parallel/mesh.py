"""Device mesh construction and sharding rules.

TPU-first design: a 2-D ("data", "model") mesh; batches shard over
"data" (DP over ICI/DCN), and parameter matrices with a large
model-parallel-friendly dimension shard over "model" (TP) — GSPMD
propagates activation shardings and inserts all-gather/reduce-scatter
collectives. With model=1 this degrades to pure DP, the reference's
only strategy (`rvc/train/train.py:475-478`), but scales further.
"""

from __future__ import annotations

import re
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
    """Fallback tensor-parallel rule: shard the largest eligible dim
    divisible by the model axis, if the array is big enough to be worth
    sharding. Conv kernels (ndim >= 3, layout (..window.., C_in, C_out))
    only ever shard a CHANNEL dim — splitting a kernel window would make
    XLA all-gather the weights around every conv."""
    if model_size <= 1 or x.size < min_size:
        return P()
    dims = sorted(range(x.ndim), key=lambda i: -x.shape[i])
    if x.ndim >= 3:
        # conv kernels only consider channel dims, preferring C_out so
        # the layer is column-parallel by default (input replicated)
        dims = [x.ndim - 1, x.ndim - 2]
    for d in dims:
        if x.shape[d] % model_size == 0 and x.shape[d] >= 2 * model_size:
            spec = [None] * x.ndim
            spec[d] = "model"
            return P(*spec)
    return P()


# Semantic TP rules for the hot layers (VERDICT r2 #6): Megatron-style
# column/row pairs so each attention / FFN block costs ONE all-reduce
# instead of per-layer all-gathers from the shape heuristic.
# Layouts: synthesizer rel-pos attention + FFN use Conv1d kernels
# (K, C_in, C_out); HuBERT keeps torch Linear layout (out, in).
# Biases always replicate (1: P()): adding a replicated bias to a
# "model"-sharded output is a local slice under GSPMD (no collective),
# and it keeps biases consistent with weights that the min_size gate
# replicates.
_SEMANTIC_TP_RULES = (
    # synthesizer enc_p attention: QKV split by heads (column), O row
    (re.compile(r"(conv_q|conv_k|conv_v)/\w+$"), {3: P(None, None, "model"),
                                                  1: P()}),
    (re.compile(r"conv_o/\w+$"), {3: P(None, "model", None), 1: P()}),
    # synthesizer FFN: hidden dim column, projection back row
    (re.compile(r"ffn_layers_\d+/conv_1/\w+$"), {3: P(None, None, "model"),
                                                 1: P()}),
    (re.compile(r"ffn_layers_\d+/conv_2/\w+$"), {3: P(None, "model", None),
                                                 1: P()}),
    # HuBERT attention (torch layout): QKV column = split OUT (dim 0)
    (re.compile(r"(q_proj|k_proj|v_proj)/\w+$"), {2: P("model", None),
                                                  1: P()}),
    (re.compile(r"out_proj/\w+$"), {2: P(None, "model"), 1: P()}),
    # HuBERT FFN
    (re.compile(r"intermediate_dense/\w+$"), {2: P("model", None),
                                              1: P()}),
    (re.compile(r"output_dense/\w+$"), {2: P(None, "model"), 1: P()}),
    # decoder ResBlock pairs: convs1 column, convs2 row (one all-reduce
    # per dilated pair; the residual add stays replicated)
    (re.compile(r"resblocks_\d+/convs1_\d+/\w+$"), {3: P(None, None, "model"),
                                                    1: P()}),
    (re.compile(r"resblocks_\d+/convs2_\d+/\w+$"), {3: P(None, "model", None),
                                                    1: P()}),
)


def _semantic_spec(path: str, x, model_size: int,
                   min_size: int = 1 << 16) -> Optional[P]:
    """Spec from the semantic rule table, or None to fall back.

    min_size applies to weight leaves just like the heuristic: a
    column/row pair's members are similar in size, so the threshold
    replicates both together (no one-sided reshard)."""
    for pat, by_ndim in _SEMANTIC_TP_RULES:
        if pat.search(path):
            if x.ndim >= 2 and x.size < min_size:
                return P()
            spec = by_ndim.get(x.ndim)
            if spec is None:
                return None
            # the sharded dim must actually divide; tiny biases replicate
            for d, axis in enumerate(tuple(spec) + (None,) * (x.ndim - len(spec))):
                if axis == "model" and (x.shape[d] % model_size != 0
                                        or x.shape[d] < 2 * model_size):
                    return P()
            if x.ndim == 1 and x.size < 2 * model_size:
                return P()
            return spec
    return None


def _zero1_spec(base: P, x, data_size: int, min_size: int = 1 << 16) -> P:
    """ZeRO-1 step shared by the production path (opt_state_shardings)
    and the per-array helper: given a leaf's base TP spec, additionally
    shard the largest remaining divisible dim over "data", so per-device
    optimizer bytes scale ~1/n_devices instead of replicating 2x-params
    of AdamW moments on every chip."""
    spec = list(base) + [None] * (x.ndim - len(base))
    if data_size > 1 and x.size >= min_size:
        for d in sorted(range(x.ndim), key=lambda i: -x.shape[i]):
            if (spec[d] is None and x.shape[d] % data_size == 0
                    and x.shape[d] >= 2 * data_size):
                spec[d] = "data"
                break
    while spec and spec[-1] is None:
        spec.pop()
    return P(*spec)


def _opt_spec_for_array(x, data_size: int, model_size: int,
                        min_size: int = 1 << 16) -> P:
    """ZeRO-1 rule for optimizer-moment leaves: keep the param's TP spec
    (moment shards must line up with their param's "model" sharding) and
    apply the shared _zero1_spec data-axis step."""
    return _zero1_spec(_spec_for_array(x, model_size, min_size), x,
                       data_size, min_size)


def _path_str(path) -> str:
    def seg(k):
        for attr in ("key", "name", "idx"):
            if hasattr(k, attr):
                return str(getattr(k, attr))
        return str(k)

    return "/".join(seg(k) for k in path)


def opt_state_shardings(opt_state, mesh: Mesh, min_size: int = 1 << 16):
    """Pytree of NamedShardings for an optax state under the ZeRO-1 rule.

    Optax state paths END with the owning param's path (e.g.
    `0/mu/enc_p/.../conv_q/weight`), so the SAME semantic rule table
    that shards the params applies — moments line up with their param's
    "model" sharding (a heuristic-only base would put row-parallel
    layers' moments on a different dim and force per-step reshards).
    The largest remaining divisible dim then shards over "data"
    (ZeRO-1), so per-device optimizer bytes scale ~1/n_devices instead
    of replicating 2x-params of AdamW moments on every chip. Scalars
    like the Adam `count` replicate via P()."""
    data_size = mesh.shape["data"]
    model_size = mesh.shape["model"]
    flat, treedef = jax.tree_util.tree_flatten_with_path(opt_state)
    out = []
    for path, x in flat:
        if not hasattr(x, "ndim") or x.ndim == 0:
            out.append(NamedSharding(mesh, P()))
            continue
        base = _semantic_spec(_path_str(path), x, model_size, min_size)
        if base is None:
            base = _spec_for_array(x, model_size, min_size)
        out.append(NamedSharding(
            mesh, _zero1_spec(base, x, data_size, min_size)))
    return jax.tree_util.tree_unflatten(treedef, out)


def param_shardings(params, mesh: Mesh, min_size: int = 1 << 16,
                    semantic: bool = True):
    """Pytree of NamedShardings for a param tree: the semantic rule table
    for known hot layers (attention QKV/O, FFN, decoder ResBlocks), the
    shape heuristic for everything else. semantic=False keeps the pure
    heuristic (used by tests to compare compiled collective counts)."""
    model_size = mesh.shape["model"]
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, x in flat:
        p = _path_str(path)
        spec = _semantic_spec(p, x, model_size, min_size) if semantic else None
        if spec is None:
            spec = _spec_for_array(x, model_size, min_size)
        specs.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, specs)


def partition_params(params, mesh: Mesh, min_size: int = 1 << 16):
    """Device-put a param tree according to `param_shardings`."""
    sh = param_shardings(params, mesh, min_size)
    return jax.tree.map(jax.device_put, params, sh)
