"""Convolution primitives with exact PyTorch semantics on (B, T, C)/(B, H, W, C).

The reference had to hand-build transposed convs with ``output_padding``,
grouped convs, and dilation emulation on MLX
(`rvc_mlx/lib/mlx/rmvpe.py:33-67`, `rvc_mlx/train/discriminators.py:19-91`).
On TPU all of these lower to a single `lax.conv_general_dilated` call that
XLA tiles onto the MXU; transposed convolution is expressed as an
lhs-dilated convolution with a flipped kernel (so fwd and bwd share the
same highly-tuned conv path).

Weight layouts (our canonical storage):
  conv1d:            (K, Cin // groups, Cout)            -- "WIO"
  conv_transpose1d:  (K, Cin, Cout)                      -- input-major
  conv2d:            (KH, KW, Cin // groups, Cout)       -- "HWIO"
  conv_transpose2d:  (KH, KW, Cin, Cout)
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOrPair = Union[int, Tuple[int, int]]


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def _conv1d_cin1_framed(x, w, b, stride: int, padding: int):
    """C_in == 1, stride > 1: frame the signal at the output grid and run
    ONE dense (T_out, K) @ (K, Cout) MXU matmul.

    XLA's conv path pads the single input channel to a full lane group, so
    the NSF noise_convs (1 -> C, stride 40/4/2 over audio-rate sources)
    measured 3.5-3.7 ms EACH on v5e; framed they are ~0.3 GFLOP matmuls.
    Frames start on output-stride boundaries, so they are g = ceil(K/s)
    row-slices of a (T_out + g, s) reshape — no gather, no im2col blowup.
    """
    B, L, _ = x.shape
    K, _, cout = w.shape
    s = stride
    t_out = (L + 2 * padding - K) // s + 1
    g = -(-K // s)
    need = (t_out + g) * s
    src = x[..., 0]
    back = need - L - padding
    if back >= 0:
        src = jnp.pad(src, ((0, 0), (padding, back)))
    else:
        src = jnp.pad(src, ((0, 0), (padding, 0)))[:, :need]
    rows = src.reshape(B, t_out + g, s)
    frames = jnp.concatenate(
        [rows[:, i : t_out + i] for i in range(g)], axis=-1)[:, :, :K]
    out = jnp.einsum("btk,ko->bto", frames, w[:, 0, :],
                     preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def _conv1d_cout1_packed(x, w, b, padding: int):
    """C_out == 1, stride 1, 'same' padding, C_in dividing 128: pack P =
    128 // C_in time steps into the lane dimension and compute the conv as
    a few row-shifted (R, 128) @ (128, P) matmuls.

    XLA pads a 1-channel output to a full lane group and re-reads the
    input per tap; HiFi-GAN's conv_post (648k x 32 -> 648k x 1) measured
    4.5 ms standalone on v5e — packed it is one pass over the input.
    """
    import numpy as np

    B, T, C = x.shape
    K = w.shape[0]
    c = padding  # == (K - 1) // 2, checked by caller
    P = 128 // C
    R = -(-T // P)

    s_min = -((c + P - 1) // P)
    s_max = (P - 1 + c) // P
    J = s_max - s_min + 1
    sel = np.zeros((K, J, P, P), np.float32)
    for tau in range(K):
        for p in range(P):
            si, q = divmod(p + tau - c, P)
            sel[tau, si - s_min, q, p] = 1.0
    sel_j = jnp.asarray(sel, x.dtype)
    # bank[j, q*C + i, p] = w[tau, i, 0] placed at (shift j, slot q)
    bank = jnp.einsum("tjqp,ti->jqip", sel_j, w[:, :, 0].astype(x.dtype))
    bank = bank.reshape(J, P * C, P)

    xp = jnp.pad(x, ((0, 0), (0, R * P - T), (0, 0))).reshape(B, R, P * C)
    xr = jnp.pad(xp, ((0, 0), (-s_min, s_max), (0, 0)))
    out = None
    for j in range(J):
        t = jnp.einsum("brl,lp->brp", xr[:, j : j + R], bank[j],
                       preferred_element_type=jnp.float32)
        out = t if out is None else out + t
    out = out.reshape(B, R * P, 1)[:, :T]
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: Union[int, Tuple[int, int]] = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """1-D convolution. x: (B, T, Cin), w: (K, Cin//groups, Cout) -> (B, T', Cout)."""
    pad = _pair(padding) if isinstance(padding, (tuple, list)) else (padding, padding)
    if groups == 1 and dilation == 1 and pad[0] == pad[1]:
        K, cin, cout = w.shape
        if cin == 1:
            if stride > 1:
                return _conv1d_cin1_framed(x, w, b, stride, pad[0])
            if K == 1 and pad[0] == 0:
                out = x * w[0, 0][None, None, :].astype(x.dtype)
                if b is not None:
                    out = out + b
                return out.astype(x.dtype)
        if (cout == 1 and stride == 1 and cin <= 64 and 128 % cin == 0
                and K <= 31 and pad[0] == (K - 1) // 2
                and x.shape[1] * cin >= (1 << 18)):
            return _conv1d_cout1_packed(x, w, b, pad[0])
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[pad],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def conv_transpose1d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
) -> jax.Array:
    """Transposed 1-D convolution with PyTorch output-size semantics.

    x: (B, T, Cin), w: (K, Cin, Cout) -> (B, (T-1)*stride - 2*padding + K
    + output_padding, Cout).

    For stride > 1 this uses a polyphase decomposition: out[n*u + p] =
    sum_m x[n - m] @ W[m*u + p], computed as ONE dense
    (B*T, Cin) @ (Cin, K'*Cout) MXU matmul followed by contiguous
    reshapes and M = ceil(K/u) shifted adds. The equivalent lhs-dilated
    convolution spends u x the FLOPs multiplying inserted zeros (for the
    NSF-HiFiGAN 48 kHz stack, u = 12/10/2/2 — a 10-12x waste on the two
    big stages). stride == 1 falls back to the plain conv path.
    """
    k, cin, cout = w.shape
    u = stride
    if u == 1:
        out = lax.conv_general_dilated(
            x, jnp.flip(w, axis=0), window_strides=(1,),
            padding=[(k - 1 - padding, k - 1 - padding + output_padding)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )
        if b is not None:
            out = out + b
        return out.astype(x.dtype)

    B, T, _ = x.shape
    out_len = (T - 1) * u - 2 * padding + k + output_padding
    M = -(-k // u)  # ceil(k / u)
    if M * u != k:
        w = jnp.pad(w, ((0, M * u - k), (0, 0), (0, 0)))

    # full[n*u + p] = sum_m x[n - m] @ W[m*u + p]. Concatenate the M
    # frame-rate shifts of x on the channel axis and contract them in ONE
    # (B, T, M*Cin) @ (M*Cin, u*Cout) matmul; the phase axis then
    # interleaves with a contiguous reshape. (The previous formulation
    # overlap-added M full-length audio-rate planes — 3 extra HBM passes
    # over the upsampled tensor on the big NSF stages.)
    if M == 1:
        full = jnp.einsum("bti,uio->btuo", x, w.reshape(u, cin, cout),
                          preferred_element_type=jnp.float32)
        full = full.reshape(B, T * u, cout)
    else:
        # M - 1 extra tail rows so contributions at j >= T*u are kept
        xs = [jnp.pad(x, ((0, 0), (m, M - 1 - m), (0, 0)))
              for m in range(M)]
        xcat = jnp.concatenate(xs, axis=-1)               # (B, T+M-1, M*Cin)
        wb = w.reshape(M, u, cin, cout).transpose(0, 2, 1, 3)
        wb = wb.reshape(M * cin, u * cout)
        full = jnp.einsum("btc,cd->btd", xcat, wb,
                          preferred_element_type=jnp.float32)
        full = full.reshape(B, (T + M - 1) * u, cout)
    pad_back = max(padding + out_len - T * u, 0)
    if pad_back:
        full = jnp.pad(full, ((0, 0), (0, pad_back), (0, 0)))
    out = lax.slice_in_dim(full, padding, padding + out_len, axis=1)
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: IntOrPair = 1,
    padding: Union[IntOrPair, Sequence[Tuple[int, int]]] = 0,
    dilation: IntOrPair = 1,
    groups: int = 1,
) -> jax.Array:
    """2-D convolution. x: (B, H, W, Cin), w: (KH, KW, Cin//groups, Cout)."""
    if isinstance(padding, (tuple, list)) and len(padding) == 2 and isinstance(padding[0], (tuple, list)):
        pad = [tuple(padding[0]), tuple(padding[1])]
    else:
        ph, pw = _pair(padding)
        pad = [(ph, ph), (pw, pw)]
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=_pair(stride),
        padding=pad,
        rhs_dilation=_pair(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def conv_transpose2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    output_padding: IntOrPair = 0,
) -> jax.Array:
    """Transposed 2-D convolution with PyTorch output-size semantics.

    x: (B, H, W, Cin), w: (KH, KW, Cin, Cout).
    """
    kh, kw = w.shape[0], w.shape[1]
    ph, pw = _pair(padding)
    oh, ow = _pair(output_padding)
    out = lax.conv_general_dilated(
        x,
        jnp.flip(w, axis=(0, 1)),
        window_strides=(1, 1),
        padding=[(kh - 1 - ph, kh - 1 - ph + oh), (kw - 1 - pw, kw - 1 - pw + ow)],
        lhs_dilation=_pair(stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def get_same_padding(kernel_size: int, dilation: int = 1) -> int:
    """'same' padding for odd kernels: (k*d - d) // 2."""
    return (kernel_size * dilation - dilation) // 2
