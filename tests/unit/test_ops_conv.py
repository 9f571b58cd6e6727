"""Conv primitives vs torch ground truth (exact PyTorch semantics required:
the synthesizer/discriminator stacks depend on torch-identical padding,
dilation, grouping, and ConvTranspose output_padding)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rvc_tpu.ops.conv import conv1d, conv_transpose1d, conv2d, conv_transpose2d


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,dil,groups",
    [
        (8, 16, 3, 1, 1, 1, 1),
        (8, 16, 5, 2, 2, 1, 1),
        (8, 16, 3, 1, 2, 2, 1),
        (16, 16, 7, 1, 3, 1, 4),
        (4, 8, 1, 1, 0, 1, 1),
        (6, 6, 3, 3, 0, 1, 6),
    ],
)
def test_conv1d_matches_torch(rng, cin, cout, k, stride, pad, dil, groups):
    B, T = 2, 37
    x = rng.standard_normal((B, T, cin)).astype(np.float32)
    tconv = torch.nn.Conv1d(cin, cout, k, stride=stride, padding=pad, dilation=dil, groups=groups)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()
    # torch weight (Cout, Cin//g, K) -> ours (K, Cin//g, Cout)
    w = tconv.weight.detach().numpy().transpose(2, 1, 0)
    b = tconv.bias.detach().numpy()
    out = _np(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                     stride=stride, padding=pad, dilation=dil, groups=groups))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,outpad",
    [
        (8, 4, 16, 8, 4, 0),
        (8, 4, 24, 12, 6, 0),
        (8, 4, 20, 10, 5, 0),
        (6, 3, 3, 2, 1, 1),
        (6, 3, 5, 3, 2, 2),
    ],
)
def test_conv_transpose1d_matches_torch(rng, cin, cout, k, stride, pad, outpad):
    B, T = 2, 19
    x = rng.standard_normal((B, T, cin)).astype(np.float32)
    tconv = torch.nn.ConvTranspose1d(cin, cout, k, stride=stride, padding=pad, output_padding=outpad)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()
    # torch weight (Cin, Cout, K) -> ours (K, Cin, Cout)
    w = tconv.weight.detach().numpy().transpose(2, 0, 1)
    b = tconv.bias.detach().numpy()
    out = _np(conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                               stride=stride, padding=pad, output_padding=outpad))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad",
    [
        (3, 8, 3, 1, 1),
        (8, 16, 3, (1, 2), 1),
        (8, 16, (3, 3), (2, 2), (1, 1)),
    ],
)
def test_conv2d_matches_torch(rng, cin, cout, k, stride, pad):
    B, H, W = 2, 17, 23
    x = rng.standard_normal((B, H, W, cin)).astype(np.float32)
    tconv = torch.nn.Conv2d(cin, cout, k, stride=stride, padding=pad)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)  # (KH,KW,Cin,Cout)
    b = tconv.bias.detach().numpy()
    out = _np(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride, padding=pad))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "stride,outpad",
    [
        ((2, 2), (1, 1)),
        ((1, 2), (0, 1)),
    ],
)
def test_conv_transpose2d_matches_torch(rng, stride, outpad):
    # Mirrors the RMVPE decoder's ConvTranspose2d(k=3, pad=1, op by stride)
    B, H, W, cin, cout = 2, 9, 11, 8, 4
    x = rng.standard_normal((B, H, W, cin)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(cin, cout, 3, stride=stride, padding=1,
                                     output_padding=outpad, bias=False)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    w = tconv.weight.detach().numpy().transpose(2, 3, 0, 1)  # (KH,KW,Cin,Cout)
    out = _np(conv_transpose2d(jnp.asarray(x), jnp.asarray(w),
                               stride=stride, padding=1, output_padding=outpad))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
