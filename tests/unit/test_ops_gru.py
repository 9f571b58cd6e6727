"""GRU/BiGRU scan vs torch.nn.GRU (RMVPE's BiGRU requires exact torch gates)."""

import numpy as np
import torch

import jax.numpy as jnp

from rvc_tpu.ops.gru import gru, bigru


def _torch_gru_params(tg, suffix="_l0"):
    return {
        "weight_ih": jnp.asarray(getattr(tg, f"weight_ih{suffix}").detach().numpy()),
        "weight_hh": jnp.asarray(getattr(tg, f"weight_hh{suffix}").detach().numpy()),
        "bias_ih": jnp.asarray(getattr(tg, f"bias_ih{suffix}").detach().numpy()),
        "bias_hh": jnp.asarray(getattr(tg, f"bias_hh{suffix}").detach().numpy()),
    }


def test_gru_matches_torch(rng):
    B, T, I, H = 2, 23, 12, 8
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    tg = torch.nn.GRU(I, H, batch_first=True)
    with torch.no_grad():
        ref, _ = tg(torch.from_numpy(x))
    p = _torch_gru_params(tg)
    out = np.asarray(gru(jnp.asarray(x), p["weight_ih"], p["weight_hh"], p["bias_ih"], p["bias_hh"]))
    np.testing.assert_allclose(out, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_bigru_matches_torch(rng):
    B, T, I, H = 2, 31, 384, 16
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    tg = torch.nn.GRU(I, H, batch_first=True, bidirectional=True)
    with torch.no_grad():
        ref, _ = tg(torch.from_numpy(x))
    fwd = _torch_gru_params(tg, "_l0")
    bwd = _torch_gru_params(tg, "_l0_reverse")
    out = np.asarray(bigru(jnp.asarray(x), fwd, bwd))
    np.testing.assert_allclose(out, ref.numpy(), rtol=1e-4, atol=1e-5)
