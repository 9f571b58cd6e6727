"""Packed-lane decoder TAIL: keep time folded into lanes ACROSS the
NSF-HiFiGAN stage boundaries.

The decoder's last stages hold (B, T_audio, 32/64) f32 activation
planes. In the canonical channel-minor layout the 32/64-wide minor dim
pads to the TPU's 128-lane tile, so every HBM round-trip over those
planes moves 4x/2x phantom bytes — measured r4/r5 as ~6 ms of the
28.9 ms decoder (stage-2/3 conv-transposes, noise convs, conv_post) and
as the 6.6 GB "layout padding" that OOMs the 64x60s long-form batch at
B=32 (`benchmarks/RESULTS.md`). The in-stage Pallas ResBlock kernel
already packs P = 128/C consecutive timesteps into the lane dim
(`ops/pallas/resblock.py`); this module extends that layout BETWEEN
ops, so from the first C < 128 stage to the final tanh the decoder
never materialises a lane-padded tensor:

- `convt_packed`: the stage upsampler (stride-u conv-transpose) as a
  sum over row shifts s of `x_packed[r+s] @ B_s`, where the (128, 128)
  tap bank B_s scatters conv taps over (in-slot q, out-slot p) pairs —
  consuming pack-P_in input and EMITTING pack-P_out = u*P_in output
  directly (no canonical intermediate).
- `conv_packed`: stride-1 conv on the packed layout (used for
  conv_post, emitting (B, R, P) audio slots reshaped to (B, T)).
- `noise_conv_packed`: the NSF source taps (C_in = 1 strided convs,
  whose (B, T_audio, 1) canonical input would pad 1 -> 128 lanes) as a
  framed (B, R, 2*hop) @ (2*hop, 128) matmul on the raw (B, T) source.

All three are plain XLA (shifted dense matmuls -> MXU) and exactly
match the canonical ops up to f32 summation order; parity is pinned in
`tests/unit/test_packed_tail.py`. The Pallas ResBlock group kernel
accepts/returns the packed layout natively (`resblock_group_packed`),
so stage boundaries compose without relayouts.

Reference behavior covered: NSF-HiFiGAN decoder tail of
`rvc/lib/algorithm/generators/hifigan_nsf.py` /
`rvc_mlx/lib/mlx/generators.py` (same math, TPU-native layout).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128


def packed_tail_enabled() -> bool:
    """Default ON for single-chip TPU (same gate as the fused ResBlock
    kernel it composes with); RVC_TPU_PACKED_TAIL=0/1 overrides."""
    default = ("1" if jax.default_backend() == "tpu"
               and jax.device_count() == 1 else "0")
    return os.environ.get("RVC_TPU_PACKED_TAIL", default) == "1"


@functools.lru_cache(maxsize=None)
def _convt_sel(k: int, stride: int, padding: int, p_in: int, p_out: int):
    """Placement tensor for conv-transpose: sel[tau, j, q, p] = 1 when
    tap tau sends input slot q (at row shift shifts[j]) to output slot
    p. Conv-transpose semantics: out[t_in*stride - padding + tau] +=
    x[t_in] @ w[tau] (torch; `ops/conv.py:conv_transpose1d`)."""
    placements = []
    for p in range(p_out):
        for tau in range(k):
            num = p + padding - tau
            if num % stride:
                continue
            o = num // stride          # input-time offset from r*p_in
            s, q = divmod(o, p_in)     # row shift, input slot
            placements.append((tau, s, q, p))
    shifts = tuple(sorted({s for (_, s, _, _) in placements}))
    j_of = {s: j for j, s in enumerate(shifts)}
    sel = np.zeros((k, len(shifts), p_in, p_out), np.float32)
    for tau, s, q, p in placements:
        sel[tau, j_of[s], q, p] = 1.0
    return shifts, sel


@functools.lru_cache(maxsize=None)
def _conv_sel(k: int, padding: int, dilation: int, p_in: int):
    """Placement for a stride-1 conv on the packed layout (output on the
    same row/time grid): y[m] = sum_tau x[m + tau*dilation - padding]."""
    placements = []
    for p in range(p_in):
        for tau in range(k):
            o = p + tau * dilation - padding
            s, q = divmod(o, p_in)
            placements.append((tau, s, q, p))
    shifts = tuple(sorted({s for (_, s, _, _) in placements}))
    j_of = {s: j for j, s in enumerate(shifts)}
    sel = np.zeros((k, len(shifts), p_in, p_in), np.float32)
    for tau, s, q, p in placements:
        sel[tau, j_of[s], q, p] = 1.0
    return shifts, sel


def _apply_banks(x, shifts, bank, bias_row):
    """y[r] = sum_j x[r + shifts[j]] @ bank[j] (+ bias_row). Rows beyond
    [0, R) read as zero — the sequence-boundary zero padding of the
    canonical ops."""
    B, R, _ = x.shape
    smin = min(0, min(shifts))
    smax = max(0, max(shifts))
    xp = jnp.pad(x, ((0, 0), (-smin, smax), (0, 0)))
    y = None
    for j, s in enumerate(shifts):
        xs = jax.lax.slice_in_dim(xp, s - smin, s - smin + R, axis=1)
        t = jnp.einsum("brw,wv->brv", xs, bank[j],
                       preferred_element_type=jnp.float32)
        y = t if y is None else y + t
    if bias_row is not None:
        y = y + bias_row
    return y.astype(x.dtype)


def convt_packed(x, w, b, *, stride: int, padding: int,
                 p_in: int, p_out: int):
    """Conv-transpose on the packed layout.

    x: (B, R, p_in*C_in) packed rows (row r = times [r*p_in, (r+1)*p_in))
    w: (K, C_in, C_out), with p_out == stride * p_in and
    p_out * C_out == p_in * C_in (the lane width is preserved).
    Output: (B, R, p_out*C_out) packed rows on the same row grid.
    Requires T_out == stride * T_in (the NSF tail's k=2u, pad=(k-u)//2
    case) so rows stay aligned; callers assert this.
    """
    k, cin, cout = w.shape
    assert p_out == stride * p_in, (p_out, stride, p_in)
    shifts, sel = _convt_sel(k, stride, padding, p_in, p_out)
    # bank[j, q*Cin+i, p*Cout+o] = sum_tau sel[tau,j,q,p] * w[tau,i,o]
    bank = jnp.einsum("tjqp,tio->jqipo", jnp.asarray(sel, w.dtype), w)
    bank = bank.reshape(len(shifts), p_in * cin, p_out * cout)
    bias = None if b is None else jnp.tile(b, (p_out,)).astype(w.dtype)
    return _apply_banks(x, shifts, bank.astype(x.dtype),
                        None if bias is None else bias.astype(x.dtype))


def conv_packed(x, w, b, *, padding: int, p_in: int, dilation: int = 1):
    """Stride-1 conv on the packed layout; output stays on the same row
    grid with width p_in * C_out (NOT padded to a lane multiple — the
    caller reshapes or feeds a matmul)."""
    k, cin, cout = w.shape
    shifts, sel = _conv_sel(k, padding, dilation, p_in)
    bank = jnp.einsum("tjqp,tio->jqipo", jnp.asarray(sel, w.dtype), w)
    bank = bank.reshape(len(shifts), p_in * cin, p_in * cout)
    bias = None if b is None else jnp.tile(b, (p_in,))
    return _apply_banks(x, shifts, bank.astype(x.dtype),
                        None if bias is None else bias.astype(x.dtype))


def noise_conv_packed(har, w, b, *, stride: int, padding: int, p_out: int):
    """The NSF source tap (C_in = 1, stride-s conv over the audio-rate
    source) emitting packed rows directly from the UNPADDED (B, T)
    source — the canonical path's (B, T, 1) input pads 1 -> 128 lanes.

    har: (B, T_audio); w: (K, 1, C_out); output (B, R, p_out*C_out)
    where R = T_out / p_out and T_out = (T_audio + 2*padding - K)//stride
    + 1 rows are produced for exactly the caller-expected T_out.
    """
    k, _, cout = w.shape
    B, t_audio = har.shape
    t_out = (t_audio + 2 * padding - k) // stride + 1
    assert t_out % p_out == 0, (t_out, p_out)
    R = t_out // p_out
    hop = p_out * stride
    if k == 1 and stride == 1 and padding == 0:
        h = har.reshape(B, R, p_out)
        y = h[..., None] * w[0, 0].astype(har.dtype)
        y = y.reshape(B, R, p_out * cout)
        return y if b is None else (y + jnp.tile(b, (p_out,))
                                    .astype(har.dtype))
    # frame index j = stride*p + tau in [0, 2*hop)
    assert stride * (p_out - 1) + k <= 2 * hop, (stride, p_out, k)
    need = (R + 1) * hop
    hp = jnp.pad(har, ((0, 0), (padding, max(0, need - t_audio - padding))))
    a = hp[:, :need].reshape(B, R + 1, hop)
    frames = jnp.concatenate([a[:, :-1], a[:, 1:]], axis=-1)  # (B,R,2*hop)
    sel = np.zeros((k, 2 * hop, p_out), np.float32)
    for p in range(p_out):
        for tau in range(k):
            sel[tau, stride * p + tau, p] = 1.0
    bank = jnp.einsum("tjp,tc->jpc", jnp.asarray(sel, w.dtype), w[:, 0, :])
    bank = bank.reshape(2 * hop, p_out * cout)
    y = jnp.einsum("brw,wv->brv", frames, bank.astype(har.dtype),
                   preferred_element_type=jnp.float32).astype(har.dtype)
    return y if b is None else (y + jnp.tile(b, (p_out,)).astype(har.dtype))
