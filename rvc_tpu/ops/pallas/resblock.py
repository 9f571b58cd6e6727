"""Fused HiFi-GAN ResBlock Pallas kernel (packed-lane layout).

The decoder's resblocks are the pipeline's memory-traffic hot spot: each
ResBlock is 6 audio-rate convs (3 dilation stages x [LReLU -> dilated
conv -> LReLU -> conv -> add]), and XLA executes them as ~12 HBM passes
over a tensor that is up to 648k samples long (measured 42 GB accessed /
64 ms for one 13.5 s clip = 80% of v5e HBM peak). This kernel computes
the ENTIRE residual chain in a single pass: the tile (plus a halo
covering the chain's receptive field) lives in VMEM, each conv is a
tap-bank sum of row-shifted (T, C) @ (C, C) MXU matmuls, and HBM sees
one read + one write.

Packed-lane layout: the late decoder stages have C = 32/64 channels,
which would waste 4x/2x of every 128-lane MXU pass. Instead, P = 128/C
consecutive time steps are folded into the lane dimension (row r holds
times [rP, rP+P), lanes grouped [t0 c0..c_C | t1 c0..c_C | ...]), and a
k-tap dilated conv becomes a sum over ROW shifts s of
`x_packed[r+s] @ W_s`, where W_s is a (PC, PC) block matrix holding
tap w[tau] at block (in_slot q, out_slot p) whenever the tap's time
offset lands in (row shift s, slot q) from output slot p. The tap banks
are built in XLA from the conv weights (one einsum per conv against a
constant 0/1 placement tensor). For k=11/d=5 at C=32 this is 6x fewer
MXU+roll passes than lane-padding to 128.

Semantics match `rvc_tpu/models/layers.py:ResBlock` (reference
`rvc_mlx/lib/mlx/residuals.py:7`) with x_mask=None, including the
zero-padding of each conv's input at the sequence boundary (enforced
in-kernel with a per-lane time-validity mask).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _sub_channels(C: int) -> int:
    """Smallest C' >= C with 128 % C' == 0 (or C rounded up to a lane
    multiple when C > 128)."""
    if C > LANE:
        return ((C + LANE - 1) // LANE) * LANE
    for cp in (8, 16, 32, 64, 128):
        if cp >= C:
            return cp
    return LANE


def _shift_sets(kernel_size: int, dilation: int, pack: int):
    """Row shifts s (sorted) with at least one tap landing there, plus
    the (tau, p, s, q) placement list."""
    c = (kernel_size - 1) // 2
    placements = []
    for tau in range(kernel_size):
        off = (tau - c) * dilation
        for p in range(pack):
            s, q = divmod(p + off, pack)
            placements.append((tau, p, s, q))
    shifts = sorted({s for (_, _, s, _) in placements})
    return tuple(shifts), placements


def _placement_tensor(kernel_size, dilation, pack, cprime, dtype=jnp.float32):
    """Constant sel[tau, j, q, p] = 1 where tap tau maps output slot p to
    (row shift shifts[j], input slot q)."""
    shifts, placements = _shift_sets(kernel_size, dilation, pack)
    j_of = {s: j for j, s in enumerate(shifts)}
    sel = np.zeros((kernel_size, len(shifts), pack, pack), np.float32)
    for tau, p, s, q in placements:
        sel[tau, j_of[s], q, p] = 1.0
    return shifts, jnp.asarray(sel, dtype)


def _pack_conv(w, kernel_size, dilation, pack, cprime):
    """(K, C, C) conv weight -> (J, pack*C', pack*C') packed tap bank."""
    K, C = w.shape[0], w.shape[1]
    if C != cprime:
        w = jnp.pad(w, ((0, 0), (0, cprime - C), (0, cprime - C)))
    shifts, sel = _placement_tensor(kernel_size, dilation, pack, cprime,
                                    w.dtype)
    # bank[j, q*C'+i, p*C'+o] = sum_tau sel[tau,j,q,p] * w[tau,i,o]
    bank = jnp.einsum("tjqp,tio->jqipo", sel, w)
    return shifts, bank.reshape(len(shifts), pack * cprime, pack * cprime)


def _kernel(x_ref, bank_ref, b1_ref, b2_ref, out_ref, xbuf, sem, *,
            meta, slope: float, tile: int, halo: int, t_valid: int,
            pack: int, cprime: int):
    i = pl.program_id(0)
    W = tile + 2 * halo
    PC = pack * cprime

    dma = pltpu.make_async_copy(
        x_ref.at[0, pl.ds(i * tile, W), :], xbuf, sem)
    dma.start()
    dma.wait()

    # per-lane time validity: row r covers times [r*P, r*P+P); lanes
    # outside [0, T) must read as zero for every conv input ('same'
    # zero padding at the sequence boundary)
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, PC), 0) + i * tile - halo
    slot = jax.lax.broadcasted_iota(jnp.int32, (W, PC), 1) // cprime
    time = rows * pack + slot
    inseq = jnp.logical_and(time >= 0, time < t_valid)

    cur = xbuf[:]
    for s, (off1, shifts1, off2, shifts2) in enumerate(meta):
        y = jnp.where(cur > 0, cur, slope * cur)
        # row shift commutes with the right-matmul (it is a row
        # permutation), so cast ONCE per conv and roll the f32 product:
        # one fewer VPU pass per tap than rolling + casting the input
        y = jnp.where(inseq, y, 0.0).astype(jnp.bfloat16)
        acc = jnp.broadcast_to(b1_ref[s][None, :], cur.shape).astype(jnp.float32)
        for j, sh in enumerate(shifts1):
            # roll(t, m)[r] = t[r - m]; tap needs (y @ B)[r + sh]
            t = jnp.dot(y, bank_ref[off1 + j],
                        preferred_element_type=jnp.float32)
            acc = acc + pltpu.roll(t, (-sh) % W, axis=0)
        y2 = jnp.where(acc > 0, acc, slope * acc)
        y2 = jnp.where(inseq, y2, 0.0).astype(jnp.bfloat16)
        acc2 = jnp.broadcast_to(b2_ref[s][None, :], cur.shape).astype(jnp.float32)
        for j, sh in enumerate(shifts2):
            t = jnp.dot(y2, bank_ref[off2 + j],
                        preferred_element_type=jnp.float32)
            acc2 = acc2 + pltpu.roll(t, (-sh) % W, axis=0)
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

    cprime = _sub_channels(C)
    pack = max(1, LANE // cprime)
    PC = pack * cprime

    # packed tap banks, one per conv, concatenated (static offsets)
    banks, meta, off = [], [], 0
    for s, d in enumerate(dilations):
        sh1, bank1 = _pack_conv(w1[s], kernel_size, d, pack, cprime)
        sh2, bank2 = _pack_conv(w2[s], kernel_size, 1, pack, cprime)
        banks += [bank1, bank2]
        meta.append((off, sh1, off + len(sh1), sh2))
        off += len(sh1) + len(sh2)
    bank = jnp.concatenate(banks, axis=0).astype(jnp.bfloat16)

    if cprime != C:
        b1 = jnp.pad(b1, ((0, 0), (0, cprime - C)))
        b2 = jnp.pad(b2, ((0, 0), (0, cprime - C)))
    b1p = jnp.tile(b1, (1, pack)).astype(jnp.float32)   # (S, PC)
    b2p = jnp.tile(b2, (1, pack)).astype(jnp.float32)

    # rows of packed layout; halo covers the chain's receptive field in
    # row units (sum over convs of the largest row shift)
    reach_rows = sum(
        max(abs(sh1[0]), abs(sh1[-1])) + max(abs(sh2[0]), abs(sh2[-1]))
        for (_, sh1, _, sh2) in meta)
    halo = ((reach_rows + 7) // 8) * 8
    # tile sized to keep the kernel's live temporaries (~5 (W, PC) f32
    # buffers + out tile + tap banks) inside the 16 MB scoped-VMEM stack
    # (2048x128 with a >48-tap bank measured 16.8 MB and OOMed)
    if PC > LANE:
        tile = 1024
    else:
        tile = 2048 if off <= 48 else 1536

    R = math.ceil(T / pack)
    if cprime != C:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, cprime - C)))
    if R * pack != T:
        x = jnp.pad(x, ((0, 0), (0, R * pack - T), (0, 0)))
    xp = x.reshape(B, R, PC)

    n_t = max(1, math.ceil(R / tile))
    tail = n_t * tile + halo - R        # front halo + tail padding
    xp = jnp.pad(xp, ((0, 0), (halo, tail), (0, 0)))

    kern = functools.partial(
        _kernel, meta=tuple(meta), slope=slope, tile=tile, halo=halo,
        t_valid=T, pack=pack, cprime=cprime)

    def one(batch_row):  # (1, Rp, PC)
        return pl.pallas_call(
            kern,
            grid=(n_t,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile, PC), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n_t * tile, PC), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tile + 2 * halo, PC), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(batch_row, bank, b1p, b2p)

    out = jnp.concatenate([one(xp[b:b + 1]) for b in range(B)], axis=0)
    out = out[:, :R, :].reshape(B, R * pack, cprime)
    return out[:, :T, :C]


def _kernel_group(x_ref, bank_ref, b1_ref, b2_ref, out_ref, xbuf, sem, *,
                  metas, slope: float, tile: int, halo: int, t_valid: int,
                  pack: int, cprime: int):
    """All parallel ResBlocks of one decoder stage + their mean, one pass.

    metas: tuple (one per block) of per-stage (off1, shifts1, boff, off2,
    shifts2) tuples; bias rows in b1_ref/b2_ref are indexed by the running
    stage counter boff across blocks."""
    i = pl.program_id(0)
    W = tile + 2 * halo
    PC = pack * cprime

    dma = pltpu.make_async_copy(
        x_ref.at[0, pl.ds(i * tile, W), :], xbuf, sem)
    dma.start()
    dma.wait()

    rows = jax.lax.broadcasted_iota(jnp.int32, (W, PC), 0) + i * tile - halo
    slot = jax.lax.broadcasted_iota(jnp.int32, (W, PC), 1) // cprime
    time = rows * pack + slot
    inseq = jnp.logical_and(time >= 0, time < t_valid)

    acc_out = jnp.zeros((W, PC), jnp.float32)
    for meta in metas:
        cur = xbuf[:]
        for (off1, shifts1, boff, off2, shifts2) in meta:
            y = jnp.where(cur > 0, cur, slope * cur)
            # cast once per conv; roll the f32 product (see _kernel)
            y = jnp.where(inseq, y, 0.0).astype(jnp.bfloat16)
            acc = jnp.broadcast_to(b1_ref[boff][None, :], cur.shape
                                   ).astype(jnp.float32)
            for j, sh in enumerate(shifts1):
                t = jnp.dot(y, bank_ref[off1 + j],
                            preferred_element_type=jnp.float32)
                acc = acc + pltpu.roll(t, (-sh) % W, axis=0)
            y2 = jnp.where(acc > 0, acc, slope * acc)
            y2 = jnp.where(inseq, y2, 0.0).astype(jnp.bfloat16)
            acc2 = jnp.broadcast_to(b2_ref[boff][None, :], cur.shape
                                    ).astype(jnp.float32)
            for j, sh in enumerate(shifts2):
                t = jnp.dot(y2, bank_ref[off2 + j],
                            preferred_element_type=jnp.float32)
                acc2 = acc2 + pltpu.roll(t, (-sh) % W, axis=0)
            cur = cur + acc2
        acc_out = acc_out + cur
    out_ref[:] = (acc_out * (1.0 / len(metas)))[halo:halo + tile, :][None]


@functools.partial(
    jax.jit, static_argnames=("kernel_sizes", "dilations", "slope",
                              "interpret", "packed_channels", "packed_t"))
def fused_resblock_group(
    x: jax.Array,                       # (B, T, C) float32
    weights: tuple,                     # flat (w1, b1, w2, b2) per block
    kernel_sizes: tuple,                # one per block, e.g. (3, 7, 11)
    dilations: tuple,                   # per block, e.g. ((1,3,5),)*3
    slope: float = 0.1,
    interpret: bool | None = None,
    packed_channels: int | None = None,
    packed_t: int | None = None,
) -> jax.Array:
    """Mean of several parallel ResBlock chains (one HiFi-GAN decoder
    stage) computed in a single Pallas pass: the input tile is read from
    HBM once and every chain runs from the same VMEM copy, vs one
    read+write per block plus a mean pass.

    Requires pack*C' <= 128 (the C=256 first stage exceeds the VMEM
    budget for the concatenated tap banks — use `resblock_chain` there).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if packed_channels is not None:
        # x arrives ALREADY in the packed-lane layout (B, R, pack*C')
        # from `ops/packed_tail.py` (decoder tail keeps time folded
        # into lanes across stage boundaries); packed_t is the true
        # sequence length for the boundary-validity mask.
        B, _, _ = x.shape
        C, T = packed_channels, packed_t
    else:
        B, T, C = x.shape
    n_blocks = len(kernel_sizes)
    assert len(weights) == 4 * n_blocks and len(dilations) == n_blocks

    cprime = _sub_channels(C)
    pack = max(1, LANE // cprime)
    PC = pack * cprime
    if packed_channels is not None:
        assert cprime == C and x.shape[2] == PC, (C, x.shape)
    # C == 256 runs un-packed with a 256-lane tile (two native lane
    # groups): banks are (J, 256, 256) bf16 ≈ 5.5 MB for the NSF stage-0
    # chain set, which fits scoped VMEM beside a 512-row tile
    assert PC <= 2 * LANE, "group kernel supports pack*C' <= 256"

    banks, metas, b1_rows, b2_rows = [], [], [], []
    off = boff = 0
    for bi in range(n_blocks):
        w1, b1, w2, b2 = weights[4 * bi: 4 * bi + 4]
        K = kernel_sizes[bi]
        meta = []
        for s, d in enumerate(dilations[bi]):
            sh1, bank1 = _pack_conv(w1[s], K, d, pack, cprime)
            sh2, bank2 = _pack_conv(w2[s], K, 1, pack, cprime)
            banks += [bank1, bank2]
            b1_rows.append(b1[s])
            b2_rows.append(b2[s])
            meta.append((off, sh1, boff, off + len(sh1), sh2))
            off += len(sh1) + len(sh2)
            boff += 1
        metas.append(tuple(meta))
    bank = jnp.concatenate(banks, axis=0).astype(jnp.bfloat16)

    def pad_rows(rows):
        rows = jnp.stack(rows)
        if cprime != C:
            rows = jnp.pad(rows, ((0, 0), (0, cprime - C)))
        return jnp.tile(rows, (1, pack)).astype(jnp.float32)

    b1p, b2p = pad_rows(b1_rows), pad_rows(b2_rows)

    reach_rows = max(
        sum(max(abs(sh1[0]), abs(sh1[-1])) + max(abs(sh2[0]), abs(sh2[-1]))
            for (_, sh1, _, _, sh2) in meta)
        for meta in metas)
    halo = ((reach_rows + 7) // 8) * 8
    # the group kernel holds ~7 (W, PC) f32 temporaries + ALL blocks'
    # tap banks in scoped VMEM; 1536 rows with a 126-bank stage measured
    # 18.07 MB and OOMed the 16 MB limit -> shrink tile with bank count
    if PC > LANE:
        tile = 512
    else:
        tile = 1536 if off <= 48 else 1024

    if packed_channels is not None:
        R = x.shape[1]
        assert R * pack == T, (R, pack, T)
        xp = x
    else:
        R = math.ceil(T / pack)
        if cprime != C:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, cprime - C)))
        if R * pack != T:
            x = jnp.pad(x, ((0, 0), (0, R * pack - T), (0, 0)))
        xp = x.reshape(B, R, PC)

    n_t = max(1, math.ceil(R / tile))
    tail = n_t * tile + halo - R
    xp = jnp.pad(xp, ((0, 0), (halo, tail), (0, 0)))

    kern = functools.partial(
        _kernel_group, metas=tuple(metas), slope=slope, tile=tile,
        halo=halo, t_valid=T, pack=pack, cprime=cprime)

    def one(batch_row):
        return pl.pallas_call(
            kern,
            grid=(n_t,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile, PC), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n_t * tile, PC), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tile + 2 * halo, PC), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(batch_row, bank, b1p, b2p)

    out = jnp.concatenate([one(xp[b:b + 1]) for b in range(B)], axis=0)
    if packed_channels is not None:
        return out[:, :R, :]            # stay in the packed layout
    out = out[:, :R, :].reshape(B, R * pack, cprime)
    return out[:, :T, :C]


def _xla_resblock_group(x, weights, *, kernel_sizes, dilations, slope):
    """Reference mean-of-chains in plain XLA (backward semantics)."""
    outs = []
    for bi in range(len(kernel_sizes)):
        w1, b1, w2, b2 = weights[4 * bi: 4 * bi + 4]
        outs.append(_xla_resblock(x, w1, b1, w2, b2,
                                  kernel_size=kernel_sizes[bi],
                                  dilations=dilations[bi], slope=slope))
    return sum(outs) / len(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def resblock_group(x, weights, kernel_sizes, dilations, slope=0.1):
    """Differentiable fused stage (mean of parallel ResBlocks): Pallas
    forward, XLA backward (remat-style), like `resblock_chain`."""
    return fused_resblock_group(x, weights, kernel_sizes, dilations, slope)


def _group_fwd(x, weights, kernel_sizes, dilations, slope):
    out = fused_resblock_group(x, weights, kernel_sizes, dilations, slope)
    return out, (x, weights)


def _group_bwd(kernel_sizes, dilations, slope, res, g):
    x, weights = res
    _, vjp = jax.vjp(
        functools.partial(_xla_resblock_group, kernel_sizes=kernel_sizes,
                          dilations=dilations, slope=slope),
        x, weights)
    return vjp(g)


resblock_group.defvjp(_group_fwd, _group_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def resblock_group_packed(x, weights, kernel_sizes, dilations,
                          channels, t_valid, slope=0.1):
    """`resblock_group` on the packed-lane layout (B, R, 128) from
    `ops/packed_tail.py`: Pallas forward stays packed end-to-end; the
    XLA backward unpacks (a reshape — exact for C' == C), runs the
    reference chain's vjp, and repacks the gradient."""
    return fused_resblock_group(x, weights, kernel_sizes, dilations,
                                slope, packed_channels=channels,
                                packed_t=t_valid)


def _group_packed_fwd(x, weights, kernel_sizes, dilations, channels,
                      t_valid, slope):
    out = fused_resblock_group(x, weights, kernel_sizes, dilations,
                               slope, packed_channels=channels,
                               packed_t=t_valid)
    return out, (x, weights)


def _group_packed_bwd(kernel_sizes, dilations, channels, t_valid, slope,
                      res, g):
    x, weights = res
    B, R, PC = x.shape

    def ref(xp, ws):
        xc = xp.reshape(B, t_valid, channels)
        yc = _xla_resblock_group(xc, ws, kernel_sizes=kernel_sizes,
                                 dilations=dilations, slope=slope)
        return yc.reshape(B, R, PC)

    _, vjp = jax.vjp(ref, x, weights)
    return vjp(g)


resblock_group_packed.defvjp(_group_packed_fwd, _group_packed_bwd)


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
