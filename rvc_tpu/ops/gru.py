"""GRU / BiGRU with exact PyTorch gate semantics, as a `lax.scan`.

Capability parity with the reference's hand-written PyTorch-formula GRU
(`rvc_mlx/lib/mlx/pytorch_gru.py:47-171`), redesigned for TPU: the input
projection for ALL timesteps is hoisted out of the recurrence into one
large (B*T, In) x (In, 3H) MXU matmul; the scan body only performs the
(B, H) x (H, 3H) recurrent matmul and elementwise gates.

Gate order follows torch.nn.GRU: rows of weight_ih/weight_hh are [r; z; n].
    r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def gru(
    x: jax.Array,
    weight_ih: jax.Array,
    weight_hh: jax.Array,
    bias_ih: jax.Array | None = None,
    bias_hh: jax.Array | None = None,
    h0: jax.Array | None = None,
    *,
    reverse: bool = False,
) -> jax.Array:
    """Single-layer GRU. x: (B, T, In); weight_ih: (3H, In); weight_hh: (3H, H).

    Returns the full hidden sequence (B, T, H).
    """
    B, T, _ = x.shape
    H = weight_hh.shape[1]

    # Hoist input projection out of the recurrence: one big MXU matmul.
    xw = jnp.einsum("bti,gi->btg", x, weight_ih)
    if bias_ih is not None:
        xw = xw + bias_ih

    if h0 is None:
        h0 = jnp.zeros((B, H), dtype=x.dtype)

    w_hh_t = weight_hh.T  # (H, 3H)

    def step(h, xw_t):
        hw = h @ w_hh_t
        if bias_hh is not None:
            hw = hw + bias_hh
        xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hw, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    xs = jnp.swapaxes(xw, 0, 1)  # (T, B, 3H)
    _, ys = lax.scan(step, h0, xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


def bigru(
    x: jax.Array,
    fwd_params: dict,
    bwd_params: dict,
    *,
    unroll: int = 8,
) -> jax.Array:
    """Bidirectional GRU; concatenates forward and backward hidden sequences.

    Each params dict holds weight_ih (3H, In), weight_hh (3H, H) and
    optionally bias_ih / bias_hh (3H,). Output: (B, T, 2H).

    TPU design: both directions run in ONE `lax.scan` — the backward
    direction consumes the time-reversed input and the per-direction
    recurrent matmuls batch into a single (2, B, H) x (2, H, 3H) einsum.
    The scan is the sequential bottleneck (per-step work is tiny at
    B=1), so halving the step count halves the BiGRU's wall time.
    `unroll` amortizes the loop's fixed per-iteration cost (output
    dynamic-update-slice + bookkeeping) over several steps — numerics
    are bit-identical (the steps still run in order, XLA just sees K of
    them per loop body). Numerics are identical to two independent
    scans.
    """
    B, T, _ = x.shape
    H = fwd_params["weight_hh"].shape[1]

    wi = jnp.stack([fwd_params["weight_ih"], bwd_params["weight_ih"]])  # (2,3H,In)
    whh_t = jnp.stack([fwd_params["weight_hh"].T,
                       bwd_params["weight_hh"].T])                      # (2,H,3H)

    xw = jnp.einsum("bti,dgi->dbtg", x, wi)  # (2, B, T, 3H)
    b_ih = [p.get("bias_ih") for p in (fwd_params, bwd_params)]
    if b_ih[0] is not None:
        xw = xw + jnp.stack(b_ih)[:, None, None, :]
    b_hh = [p.get("bias_hh") for p in (fwd_params, bwd_params)]
    bias_hh = jnp.stack(b_hh)[:, None, :] if b_hh[0] is not None else None

    # xs[t, 0] = fwd input at t; xs[t, 1] = bwd input at T-1-t
    xs = jnp.stack([xw[0], xw[1, :, ::-1]], axis=0)        # (2, B, T, 3H)
    xs = jnp.moveaxis(xs, 2, 0)                            # (T, 2, B, 3H)
    h0 = jnp.zeros((2, B, H), dtype=x.dtype)

    def step(h, xw_t):
        hw = jnp.einsum("dbh,dhg->dbg", h, whh_t)
        if bias_hh is not None:
            hw = hw + bias_hh
        xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hw, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, ys = lax.scan(step, h0, xs, unroll=unroll)          # (T, 2, B, H)
    fwd = jnp.moveaxis(ys[:, 0], 0, 1)                     # (B, T, H)
    bwd = jnp.moveaxis(ys[:, 1], 0, 1)[:, ::-1]
    return jnp.concatenate([fwd, bwd], axis=-1)
