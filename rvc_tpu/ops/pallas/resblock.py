"""Fused HiFi-GAN ResBlock Pallas kernel.

The decoder's resblocks are the pipeline's memory-traffic hot spot: each
ResBlock is 6 audio-rate convs (3 dilation stages x [LReLU -> dilated
conv -> LReLU -> conv -> add]), and XLA executes them as ~12 HBM passes
over a tensor that is up to 648k samples long (measured 42 GB accessed /
64 ms for one 13.5 s clip = 80% of v5e HBM peak). This kernel computes
the ENTIRE residual chain for one kernel-size branch in a single pass:
the tile (plus a halo covering the chain's receptive field) lives in
VMEM, each conv is a k-tap sum of shifted (T, C) @ (C, C) MXU matmuls,
and HBM sees one read + one write.

Semantics match `rvc_tpu/models/layers.py:ResBlock` (reference
`rvc_mlx/lib/mlx/residuals.py:7`) with x_mask=None, including the
zero-padding of each conv's input at the sequence boundary.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _reach(kernel_size: int, dilations: Sequence[int]) -> int:
    """Receptive-field halo of the full chain: per stage, the dilated
    conv reaches (k-1)/2*d and the plain conv another (k-1)/2."""
    c = (kernel_size - 1) // 2
    return sum(c * d + c for d in dilations)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, xbuf, sem,
            *, kernel_size: int, dilations: Sequence[int], slope: float,
            tile: int, halo: int, t_valid: int):
    i = pl.program_id(0)
    k = kernel_size
    c = (k - 1) // 2
    W = tile + 2 * halo

    dma = pltpu.make_async_copy(
        x_ref.at[0, pl.ds(i * tile, W), :], xbuf, sem)
    dma.start()
    dma.wait()

    # rows outside the true sequence must read as zero for every conv
    # input ('same' zero padding at the boundary)
    g = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0) + i * tile - halo
    inseq = jnp.logical_and(g >= 0, g < t_valid)

    cur = xbuf[:]
    for s, d in enumerate(dilations):
        y = jnp.where(cur > 0, cur, slope * cur)
        y = jnp.where(inseq, y, 0.0)  # f32: Mosaic rotate needs 32-bit
        acc = jnp.broadcast_to(b1_ref[s][None, :], cur.shape).astype(jnp.float32)
        for tau in range(k):
            shift = (-(tau - c) * d) % W  # roll(y, s)[t] = y[t - s]
            tap = pltpu.roll(y, shift, axis=0).astype(jnp.bfloat16)
            acc = acc + jnp.dot(tap, w1_ref[s, tau],
                                preferred_element_type=jnp.float32)
        y2 = jnp.where(acc > 0, acc, slope * acc)
        y2 = jnp.where(inseq, y2, 0.0)
        acc2 = jnp.broadcast_to(b2_ref[s][None, :], cur.shape).astype(jnp.float32)
        for tau in range(k):
            shift = (-(tau - c)) % W
            tap = pltpu.roll(y2, shift, axis=0).astype(jnp.bfloat16)
            acc2 = acc2 + jnp.dot(tap, w2_ref[s, tau],
                                  preferred_element_type=jnp.float32)
        cur = cur + acc2
    out_ref[:] = cur[halo:halo + tile, :][None]


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "dilations", "slope", "interpret"))
def fused_resblock(
    x: jax.Array,                 # (B, T, C) float32
    w1: jax.Array,                # (S, K, C, C)  dilated-conv taps
    b1: jax.Array,                # (S, C)
    w2: jax.Array,                # (S, K, C, C)  plain-conv taps
    b2: jax.Array,                # (S, C)
    kernel_size: int,
    dilations: Sequence[int] = (1, 3, 5),
    slope: float = 0.1,
    interpret: bool | None = None,
) -> jax.Array:
    """One HiFi-GAN ResBlock chain (all dilation stages) in one pass.

    interpret=None auto-selects: compiled on TPU, interpret elsewhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, C = x.shape
    S, K = w1.shape[0], w1.shape[1]
    assert K == kernel_size and S == len(dilations)

    Cp = max(LANE, ((C + LANE - 1) // LANE) * LANE)
    halo = ((_reach(kernel_size, dilations) + 7) // 8) * 8
    # tile sizes chosen to keep the kernel's live temporaries (~5 (W, Cp)
    # f32 buffers + out tile + weight taps) inside the 16 MB scoped-VMEM
    # stack; 4096x128 measured 23 MB and OOMed at compile time
    tile = 1024 if Cp > LANE else 2048
    n_t = max(1, math.ceil(T / tile))

    if Cp != C:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Cp - C)))
        w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, Cp - C), (0, Cp - C)))
        w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, Cp - C), (0, Cp - C)))
        b1 = jnp.pad(b1, ((0, 0), (0, Cp - C)))
        b2 = jnp.pad(b2, ((0, 0), (0, Cp - C)))
    # front halo + tail out to n_t*tile + 2*halo
    tail = n_t * tile + halo - T
    xp = jnp.pad(x, ((0, 0), (halo, tail), (0, 0)))

    kern = functools.partial(
        _kernel, kernel_size=kernel_size, dilations=tuple(dilations),
        slope=slope, tile=tile, halo=halo, t_valid=T)

    def one(batch_row):  # (1, Tp, Cp)
        return pl.pallas_call(
            kern,
            grid=(n_t,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile, Cp), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n_t * tile, Cp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tile + 2 * halo, Cp), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(batch_row, w1.astype(jnp.bfloat16), b1.astype(jnp.float32),
          w2.astype(jnp.bfloat16), b2.astype(jnp.float32))

    out = jnp.concatenate([one(xp[b:b + 1]) for b in range(B)], axis=0)
    return out[:, :T, :C]


def fused_resblock_enabled() -> bool:
    """Default ON for single-chip TPU (where the kernel beats XLA), OFF
    elsewhere: pallas interpret mode on CPU is slow, and on multi-chip
    meshes the custom call has no GSPMD partitioning rule (use shard_map
    and set RVC_TPU_PALLAS_RESBLOCK=1 explicitly there).
    RVC_TPU_PALLAS_RESBLOCK=0/1 overrides."""
    import os

    default = ("1" if jax.default_backend() == "tpu"
               and jax.device_count() == 1 else "0")
    return os.environ.get("RVC_TPU_PALLAS_RESBLOCK", default) == "1"


def _xla_resblock(x, w1, b1, w2, b2, *, kernel_size, dilations, slope):
    """Reference chain in plain XLA — used for the backward pass (and as
    the differentiation semantics of `resblock_chain`)."""
    from rvc_tpu.ops import conv as conv_ops

    k = kernel_size
    cur = x
    for s, d in enumerate(dilations):
        y = jnp.where(cur > 0, cur, slope * cur)
        y = conv_ops.conv1d(y, w1[s], b1[s], padding=(k * d - d) // 2,
                            dilation=d)
        y = jnp.where(y > 0, y, slope * y)
        y = conv_ops.conv1d(y, w2[s], b2[s], padding=(k - 1) // 2)
        cur = cur + y
    return cur


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def resblock_chain(x, w1, b1, w2, b2, kernel_size, dilations, slope=0.1):
    """Differentiable fused ResBlock: Pallas forward, XLA backward.

    The backward pass re-runs the XLA reference forward under `jax.vjp`
    (remat-style), so training through this op is exact f32 autodiff of
    the reference chain while inference rides the fused kernel.
    """
    return fused_resblock(x, w1, b1, w2, b2, kernel_size, dilations, slope)


def _chain_fwd(x, w1, b1, w2, b2, kernel_size, dilations, slope):
    out = fused_resblock(x, w1, b1, w2, b2, kernel_size, dilations, slope)
    return out, (x, w1, b1, w2, b2)


def _chain_bwd(kernel_size, dilations, slope, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        functools.partial(_xla_resblock, kernel_size=kernel_size,
                          dilations=dilations, slope=slope),
        x, w1, b1, w2, b2)
    return vjp(g)


resblock_chain.defvjp(_chain_fwd, _chain_bwd)
