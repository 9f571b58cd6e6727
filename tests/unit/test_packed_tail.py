"""Packed-lane decoder tail (`ops/packed_tail.py`) vs the canonical ops.

The packed tail keeps time folded into lanes across the NSF-HiFiGAN
stage boundaries; these tests pin each packed op to its canonical
counterpart and the whole decoder (packed on vs off) bit-close on CPU
(Pallas in interpret mode)."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rvc_tpu.ops import conv as conv_ops
from rvc_tpu.ops.packed_tail import (
    conv_packed,
    convt_packed,
    noise_conv_packed,
)


def _pack(x, p):
    B, T, C = x.shape
    return x.reshape(B, T // p, p * C)


def _unpack(x, p, c):
    B, R, _ = x.shape
    return x.reshape(B, R * p, c)


@pytest.mark.parametrize("cin,cout,p_in,T", [(128, 64, 1, 96),
                                             (64, 32, 2, 96)])
def test_convt_packed_matches_canonical(rng, cin, cout, p_in, T):
    u, k, pad = 2, 4, 1
    w = jnp.asarray(0.1 * rng.standard_normal((k, cin, cout)), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal((cout,)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, T, cin)), jnp.float32)
    ref = np.asarray(conv_ops.conv_transpose1d(x, w, b, stride=u,
                                               padding=pad))
    got = convt_packed(_pack(x, p_in), w, b, stride=u, padding=pad,
                       p_in=p_in, p_out=u * p_in)
    got = np.asarray(_unpack(got, u * p_in, cout))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_conv_packed_matches_conv_post(rng):
    k, cin, p = 7, 32, 4
    T = 160
    w = jnp.asarray(0.1 * rng.standard_normal((k, cin, 1)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, T, cin)), jnp.float32)
    ref = np.asarray(conv_ops.conv1d(x, w, None, padding=3))
    got = conv_packed(_pack(x, p), w, None, padding=3, p_in=p)
    got = np.asarray(got).reshape(2, T, 1)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("stride,k,pad,cout,p_out",
                         [(2, 4, 1, 64, 2), (1, 1, 0, 32, 4)])
def test_noise_conv_packed_matches_canonical(rng, stride, k, pad, cout,
                                             p_out):
    t_audio = 400
    w = jnp.asarray(0.1 * rng.standard_normal((k, 1, cout)), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal((cout,)), jnp.float32)
    har = jnp.asarray(rng.standard_normal((2, t_audio, 1)), jnp.float32)
    ref = np.asarray(conv_ops.conv1d(har, w, b, stride=stride, padding=pad))
    t_out = (t_audio + 2 * pad - k) // stride + 1
    t_keep = (t_out // p_out) * p_out
    got = noise_conv_packed(har[..., 0], w, b, stride=stride, padding=pad,
                            p_out=p_out)
    got = np.asarray(_unpack(got, p_out, cout))
    np.testing.assert_allclose(got, ref[:, :t_keep], atol=1e-4, rtol=1e-4)


def _count_packed_calls(monkeypatch):
    """Spy on convt_packed so tests can assert the packed branch really
    engaged (a silently-failed gate would compare canonical to
    canonical)."""
    import rvc_tpu.models.generators as gen_mod
    from rvc_tpu.ops import packed_tail

    calls = []
    orig = packed_tail.convt_packed

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(packed_tail, "convt_packed", spy)
    return calls


def _nsf_model_and_input(rng, T=16):
    from rvc_tpu.models.generators import HiFiGANNSFGenerator

    # production channel progression (512 -> 256,128,64,32): the packed
    # tail engages on the last two stages (C=64, C=32)
    net = HiFiGANNSFGenerator(
        initial_channel=64,
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3,
        upsample_rates=(12, 10, 2, 2),
        upsample_initial_channel=512,
        upsample_kernel_sizes=(24, 20, 4, 4),
        gin_channels=16,
        sr=48000,
    )
    x = jnp.asarray(rng.standard_normal((1, T, 64)), jnp.float32)
    f0 = jnp.asarray(120.0 + 40.0 * rng.random((1, T)), jnp.float32)
    g = jnp.asarray(0.1 * rng.standard_normal((1, 1, 16)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, f0, g)
    return net, variables, (x, f0, g)


def test_nsf_decoder_packed_tail_parity(rng, monkeypatch):
    """Whole NSF decoder: packed tail + fused resblocks (interpret) vs
    the canonical path."""
    net, variables, args = _nsf_model_and_input(rng)
    monkeypatch.setenv("RVC_TPU_PACKED_TAIL", "0")
    monkeypatch.setenv("RVC_TPU_PALLAS_RESBLOCK", "0")
    ref = np.asarray(net.apply(variables, *args))
    monkeypatch.setenv("RVC_TPU_PACKED_TAIL", "1")
    monkeypatch.setenv("RVC_TPU_PALLAS_RESBLOCK", "1")
    calls = _count_packed_calls(monkeypatch)
    got = np.asarray(net.apply(variables, *args))
    assert len(calls) == 2, "packed tail did not engage on stages 2+3"
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=1e-2)
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9999, f"corr {corr}"


def test_hifigan_decoder_packed_tail_parity(rng, monkeypatch):
    from rvc_tpu.models.generators import HiFiGANGenerator

    net = HiFiGANGenerator(
        initial_channel=64,
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3,
        upsample_rates=(12, 10, 2, 2),
        upsample_initial_channel=512,
        upsample_kernel_sizes=(24, 20, 4, 4),
    )
    x = jnp.asarray(rng.standard_normal((1, 16, 64)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("RVC_TPU_PACKED_TAIL", "0")
    monkeypatch.setenv("RVC_TPU_PALLAS_RESBLOCK", "0")
    ref = np.asarray(net.apply(variables, x))
    monkeypatch.setenv("RVC_TPU_PACKED_TAIL", "1")
    monkeypatch.setenv("RVC_TPU_PALLAS_RESBLOCK", "1")
    got = np.asarray(net.apply(variables, x))
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=1e-2)


def test_nsf_decoder_packed_tail_grads(rng, monkeypatch):
    """Training path: gradients through the packed tail (XLA backward
    of the packed resblock group + autodiff of the packed matmuls)
    match the canonical decoder's gradients."""
    net, variables, args = _nsf_model_and_input(rng, T=12)

    def loss(v):
        return jnp.mean(net.apply(v, *args) ** 2)

    monkeypatch.setenv("RVC_TPU_PACKED_TAIL", "0")
    monkeypatch.setenv("RVC_TPU_PALLAS_RESBLOCK", "0")
    g_ref = jax.grad(loss)(variables)
    monkeypatch.setenv("RVC_TPU_PACKED_TAIL", "1")
    monkeypatch.setenv("RVC_TPU_PALLAS_RESBLOCK", "1")
    g_got = jax.grad(loss)(variables)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_g = jax.tree_util.tree_leaves(g_got)
    assert len(flat_r) == len(flat_g)
    for a, b in zip(flat_r, flat_g):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-2, rtol=5e-2)
