"""Frequency space-to-depth packing for small-channel 2-D conv stacks.

The RMVPE DeepUnet's full-resolution stages run 3x3 convs at C=16/32
over (T, F=128) planes. On TPU, a C=16 minor dim occupies 16 of 128
vector lanes — every conv pass, elementwise op and HBM tile wastes
~87% of the machine (measured 2.2 TFLOP/s on v5e,
`scripts/profile_conv_chain.py`). Packing P consecutive frequency bins
into channels makes the stage a dense (3 time x 3 group) conv at
C' = P*C = 128: measured 4.5x faster for the stage-1 stack
(`scripts/profile_conv_chain2.py`).

The transform is EXACT (not an approximation): the packed weight is
block-structured so every output element is the same sum of products
as the canonical conv, including zero-padding at the frequency edges
(the packed conv's zero group pad supplies exactly the canonical zero
rows). `pack`/`unpack` are pure reshapes — packed channel index is
(freq_within_group * C + c), so (G, P*C) -> (G, P, C) -> (F, C) needs
no transpose.

Reference capability anchor: the RMVPE U-Net architecture itself
(`rvc_mlx/lib/mlx/rmvpe.py:198-253`); this module is TPU-only layout
optimization on top.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def packed_unet_enabled() -> bool:
    """RVC_TPU_PACKED_UNET=0/1 — packed-frequency evaluation of the
    DeepUnet's small-channel stages. Default ON for TPU (4.5x the
    canonical conv stack at stage-1 shape), OFF elsewhere (CPU tests
    compare the canonical path; a dedicated unit test forces the knob
    on for packed-vs-canonical equivalence)."""
    import os

    default = "1" if jax.default_backend() == "tpu" else "0"
    return os.environ.get("RVC_TPU_PACKED_UNET", default) == "1"


def packed_tc_enabled() -> bool:
    """RVC_TPU_PACKED_TC=0/1 — evaluate the decoder's stride-2
    ConvTranspose via zero-interleave + packed conv instead of the
    canonical lhs-dilated conv. Sub-knob of RVC_TPU_PACKED_UNET.
    Default OFF: with host-prepacked weights the packed-blocks-only
    configuration measured 3.98 ms e2e vs 6.04 with the packed
    transpose (the 4x structural-zero FLOPs of the interleaved dense
    conv cost more than the lhs-dilated canonical form; v5e,
    scripts/profile_packed_ab.py)."""
    import os

    return os.environ.get("RVC_TPU_PACKED_TC", "0") == "1"


def packed_pool_enabled() -> bool:
    """RVC_TPU_PACKED_POOL=0/1 — encoder 2x2 avg-pool in packed space.
    Sub-knob of RVC_TPU_PACKED_UNET. Default OFF: measured SLOWER than
    the canonical pool (6.33 vs 5.03 ms e2e on v5e — the 6-D reshape
    mean defeats XLA's pooling pattern), kept for re-evaluation on
    other hardware."""
    import os

    return os.environ.get("RVC_TPU_PACKED_POOL", "0") == "1"


def pick_pack(n_freq: int, c_out: int) -> int:
    """Largest P with P*c_out <= 128 that divides n_freq. Returns 1
    when packing is pointless (output channels already lane-wide). The
    INPUT side may exceed 128 packed channels (e.g. a decoder concat
    block at P=8, Cin=32 -> K=256) — K is a contraction dim and wide K
    is fine on the MXU; it is the OUTPUT lane dim that must fill."""
    p = 1
    while (p * 2 * max(c_out, 1) <= 128 and n_freq % (p * 2) == 0
           and p * 2 <= n_freq):
        p *= 2
    return p


def pack(x: jax.Array, p: int) -> jax.Array:
    """(B, T, F, C) -> (B, T, F//P, P*C). Pure reshape."""
    b, t, f, c = x.shape
    return x.reshape(b, t, f // p, p * c)


def unpack(x: jax.Array, p: int) -> jax.Array:
    """(B, T, G, P*C) -> (B, T, G*P, C). Pure reshape."""
    b, t, g, pc = x.shape
    return x.reshape(b, t, g * p, pc // p)


def packed_conv3_weight(w: jax.Array, p: int) -> jax.Array:
    """Canonical (KT, 3, Cin, Cout) freq-3-tap conv weight -> packed
    (KT, 3, P*Cin, P*Cout) group conv weight.

    For output position j in its group and freq tap df, the source bin
    j+df-1 lives in group offset dg = (j+df-1)//P at position
    i = (j+df-1) % P; all other blocks are zero."""
    kt, kf, cin, cout = w.shape
    assert kf == 3, "freq kernel must be 3-tap"
    wp = jnp.zeros((kt, 3, p * cin, p * cout), w.dtype)
    for j in range(p):
        for df in range(3):
            src = j + df - 1
            dg, i = src // p, src % p
            wp = wp.at[:, dg + 1, i * cin:(i + 1) * cin,
                       j * cout:(j + 1) * cout].set(w[:, df])
    return wp


def packed_pointwise_weight(w: jax.Array, p: int) -> jax.Array:
    """(1, 1, Cin, Cout) 1x1 conv weight -> block-diagonal
    (1, 1, P*Cin, P*Cout)."""
    _, _, cin, cout = w.shape
    wp = jnp.zeros((1, 1, p * cin, p * cout), w.dtype)
    for i in range(p):
        wp = wp.at[:, :, i * cin:(i + 1) * cin,
                   i * cout:(i + 1) * cout].set(w[0, 0])
    return wp


def tile_channel(v: jax.Array, p: int) -> jax.Array:
    """Per-channel vector (C,) -> packed (P*C,): packed channel
    i*C + c maps to canonical channel c."""
    return jnp.tile(v, p)


def packed_conv3(x_packed: jax.Array, w: jax.Array, p: int,
                 bias: jax.Array | None = None,
                 cin: int | None = None) -> jax.Array:
    """Packed 3x3 conv (canonical padding=1 on both dims).

    `w` may be the canonical (KT, 3, Cin, Cout) weight (packed weight is
    then built IN-GRAPH — ~24 dynamic-update-slices per conv, which is
    measurably expensive when it runs per forward) or an already-packed
    (KT, 3, P*Cin, P*Cout) weight from `prepack` (preferred for serving:
    pass `cin` so the shape check can tell the two apart)."""
    if cin is not None and w.shape[2] == p * cin:
        wp = w  # host-prepacked
    else:
        wp = packed_conv3_weight(w, p)
    y = jax.lax.conv_general_dilated(
        x_packed, wp.astype(x_packed.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + tile_channel(bias, p).astype(y.dtype)
    return y


def packed_pointwise(x_packed: jax.Array, w: jax.Array, p: int,
                     bias: jax.Array | None = None,
                     cin: int | None = None) -> jax.Array:
    """Packed 1x1 conv; `w` canonical or host-prepacked (see
    packed_conv3)."""
    if cin is not None and w.shape[2] == p * cin:
        wp = w
    else:
        wp = packed_pointwise_weight(w, p)
    y = jax.lax.conv_general_dilated(
        x_packed, wp.astype(x_packed.dtype), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + tile_channel(bias, p).astype(y.dtype)
    return y


def _np_packed_conv3_weight(w, p):
    import numpy as np

    kt, kf, cin, cout = w.shape
    wp = np.zeros((kt, 3, p * cin, p * cout), w.dtype)
    for j in range(p):
        for df in range(3):
            src = j + df - 1
            dg, i = src // p, src % p
            wp[:, dg + 1, i * cin:(i + 1) * cin,
               j * cout:(j + 1) * cout] = w[:, df]
    return wp


def _np_packed_pointwise_weight(w, p):
    import numpy as np

    _, _, cin, cout = w.shape
    wp = np.zeros((1, 1, p * cin, p * cout), w.dtype)
    for i in range(p):
        wp[:, :, i * cin:(i + 1) * cin, i * cout:(i + 1) * cout] = w[0, 0]
    return wp


def packed_avg_pool2(x_packed: jax.Array, p: int) -> jax.Array:
    """2x2 avg-pool (stride 2, no pad) computed in packed space:
    (B, T, G, P*C) -> (B, T//2, G, (P//2)*C) — the result is packed
    with P//2 over the SAME groups, i.e. `unpack(out, p//2)` is the
    canonical pooled plane. Requires even T and even P."""
    b, t, g, pc = x_packed.shape
    c = pc // p
    x = x_packed.reshape(b, t // 2, 2, g, p // 2, 2, c)
    return x.mean(axis=(2, 5)).reshape(b, t // 2, g, (p // 2) * c)


def packed_conv_transpose2x(x_canonical: jax.Array, w: jax.Array, p: int,
                            bias: jax.Array | None = None) -> jax.Array:
    """ConvTranspose2d(k=3, stride=2, padding=1, output_padding=1) —
    the DeepUnet decoder upsampler — evaluated as zero-interleave (pure
    reshapes) + a packed 3x3 conv with the flipped kernel. Input is the
    canonical (B, T, F, Cin) plane; output is PACKED (B, 2T, 2F/P, P*Cout).

    Identity used: conv_transpose(x, w) == conv(dilate2(x) ++ zero,
    flip(w), pad=1) — the appended zero row/bin supplies the
    output_padding. Exact, not an approximation."""
    b, t, f, cin_x = x_canonical.shape
    # freq interleave inside packed groups: P/2 real positions + zeros
    xp = x_canonical.reshape(b, t, 2 * f // p, p // 2, cin_x)
    xp = jnp.stack([xp, jnp.zeros_like(xp)], axis=4)
    xp = xp.reshape(b, t, 2 * f // p, p * cin_x)
    # time interleave
    xp = jnp.stack([xp, jnp.zeros_like(xp)], axis=2)
    xp = xp.reshape(b, 2 * t, 2 * f // p, p * cin_x)
    if w.shape[2] == p * cin_x:  # host-prepacked (already flipped)
        return packed_conv3(xp, w, p, bias, cin=cin_x)
    return packed_conv3(xp, jnp.flip(w, axis=(0, 1)), p, bias)


def packed_batchnorm(x_packed: jax.Array, scale, bias, mean, var, p: int,
                     eps: float = 1e-5) -> jax.Array:
    """Inference batch norm with per-canonical-channel stats, applied in
    packed space (stats tiled per frequency position)."""
    xf = x_packed.astype(jnp.float32)
    inv = jax.lax.rsqrt(tile_channel(var, p) + eps)
    out = ((xf - tile_channel(mean, p)) * inv * tile_channel(scale, p)
           + tile_channel(bias, p))
    return out.astype(x_packed.dtype)
