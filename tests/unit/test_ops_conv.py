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


@pytest.mark.parametrize(
    "k,stride,pad,cout,L",
    [
        (80, 40, 20, 16, 1930),   # NSF noise_conv stage0 (stride_f0=40)
        (8, 4, 2, 8, 1930),       # stage1 (stride_f0=4)
        (4, 2, 1, 8, 1931),       # stage2 (stride_f0=2), odd length
        (1, 1, 0, 8, 1930),       # stage3 passthrough tap
        (10, 5, 0, 12, 1933),     # HuBERT feature-extractor first conv
    ],
)
def test_conv1d_cin1_fast_path_matches_torch(rng, k, stride, pad, cout, L):
    """The C_in==1 framed fast path must be torch-exact (it replaces the
    general conv for the NSF noise_convs and HuBERT's first conv)."""
    x = rng.standard_normal((2, L, 1)).astype(np.float32)
    tconv = torch.nn.Conv1d(1, cout, k, stride=stride, padding=pad)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    w = tconv.weight.detach().numpy().transpose(2, 1, 0)
    b = tconv.bias.detach().numpy()
    out = _np(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                     stride=stride, padding=pad))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cin,k,T", [(32, 7, 2 ** 18), (64, 7, 2 ** 13),
                                     (32, 3, 2 ** 18 + 5)])
def test_conv1d_cout1_packed_matches_torch(rng, cin, k, T):
    """The C_out==1 packed-lane fast path (HiFi-GAN conv_post) must be
    torch-exact, including ragged tails (T not a multiple of 128/C)."""
    from rvc_tpu.ops.conv import _conv1d_cout1_packed

    x = rng.standard_normal((1, T, cin)).astype(np.float32)
    tconv = torch.nn.Conv1d(cin, 1, k, padding=(k - 1) // 2, bias=False)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    w = tconv.weight.detach().numpy().transpose(2, 1, 0)
    out = _np(_conv1d_cout1_packed(jnp.asarray(x), jnp.asarray(w), None,
                                   (k - 1) // 2))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize(
    "k,stride,pad,cout,L",
    [(80, 40, 20, 8, 1930), (4, 2, 1, 8, 1931), (10, 5, 0, 6, 1933)],
)
def test_conv1d_cin1_fast_path_gradients(rng, k, stride, pad, cout, L):
    """Training differentiates through the C_in==1 framed path (NSF
    noise_convs, HuBERT conv0): grads must match torch autograd."""
    import jax
    import jax.numpy as jnp

    x = rng.standard_normal((1, L, 1)).astype(np.float32)
    tconv = torch.nn.Conv1d(1, cout, k, stride=stride, padding=pad)
    w = tconv.weight.detach().numpy().transpose(2, 1, 0)
    b = tconv.bias.detach().numpy()

    xt = torch.from_numpy(x).permute(0, 2, 1).requires_grad_(True)
    out_t = tconv(xt)
    loss_t = (out_t ** 2).sum()
    loss_t.backward()
    gx_ref = xt.grad.permute(0, 2, 1).numpy()
    gw_ref = tconv.weight.grad.numpy().transpose(2, 1, 0)

    def loss(xj, wj, bj):
        return (conv1d(xj, wj, bj, stride=stride, padding=pad) ** 2).sum()

    gx, gw = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(gx), gx_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), gw_ref, rtol=1e-3, atol=1e-3)


def test_conv1d_cout1_fast_path_gradients(rng):
    """Same for the C_out==1 packed path (HiFi-GAN conv_post)."""
    import jax
    import jax.numpy as jnp
    from rvc_tpu.ops.conv import _conv1d_cout1_packed

    cin, k, T = 32, 7, 4096
    x = rng.standard_normal((1, T, cin)).astype(np.float32)
    tconv = torch.nn.Conv1d(cin, 1, k, padding=3, bias=False)
    w = tconv.weight.detach().numpy().transpose(2, 1, 0)

    xt = torch.from_numpy(x).permute(0, 2, 1).requires_grad_(True)
    loss_t = (tconv(xt) ** 2).sum()
    loss_t.backward()
    gx_ref = xt.grad.permute(0, 2, 1).numpy()
    gw_ref = tconv.weight.grad.numpy().transpose(2, 1, 0)

    def loss(xj, wj):
        return (_conv1d_cout1_packed(xj, wj, None, 3) ** 2).sum()

    gx, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx), gx_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), gw_ref, rtol=1e-3, atol=1e-3)


def test_conv_transpose1d_gradients(rng):
    """Generator upsample stack trains through conv_transpose1d."""
    import jax
    import jax.numpy as jnp

    cin, cout, k, stride, pad, outpad = 8, 4, 20, 10, 5, 0
    T = 37
    x = rng.standard_normal((1, T, cin)).astype(np.float32)
    tconv = torch.nn.ConvTranspose1d(cin, cout, k, stride=stride,
                                     padding=pad, output_padding=outpad,
                                     bias=False)
    w = tconv.weight.detach().numpy().transpose(2, 0, 1)  # (K, Cin, Cout)

    xt = torch.from_numpy(x).permute(0, 2, 1).requires_grad_(True)
    loss_t = (tconv(xt) ** 2).sum()
    loss_t.backward()
    gx_ref = xt.grad.permute(0, 2, 1).numpy()
    gw_ref = tconv.weight.grad.numpy().transpose(2, 0, 1)

    def loss(xj, wj):
        return (conv_transpose1d(xj, wj, stride=stride, padding=pad,
                                 output_padding=outpad) ** 2).sum()

    gx, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx), gx_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), gw_ref, rtol=1e-3, atol=1e-3)
