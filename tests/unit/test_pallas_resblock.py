"""Fused ResBlock Pallas kernel vs the flax ResBlock (interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rvc_tpu.models.layers import ResBlock
from rvc_tpu.ops.pallas.resblock import fused_resblock


def _stack_params(params, n_stages):
    w1 = jnp.stack([params[f"convs1_{i}"]["weight"] for i in range(n_stages)])
    b1 = jnp.stack([params[f"convs1_{i}"]["bias"] for i in range(n_stages)])
    w2 = jnp.stack([params[f"convs2_{i}"]["weight"] for i in range(n_stages)])
    b2 = jnp.stack([params[f"convs2_{i}"]["bias"] for i in range(n_stages)])
    return w1, b1, w2, b2


@pytest.mark.parametrize("kernel_size,C,T", [(3, 24, 300), (11, 32, 700)])
def test_fused_resblock_matches_flax(rng, kernel_size, C, T):
    dil = (1, 3, 5)
    net = ResBlock(C, kernel_size, dil)
    x = jnp.asarray(rng.standard_normal((1, T, C)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(net.apply(variables, x))

    w1, b1, w2, b2 = _stack_params(variables["params"], len(dil))
    got = np.asarray(fused_resblock(x, w1, b1, w2, b2, kernel_size, dil,
                                    interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=1e-2)
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9999, f"corr {corr}"


def test_resblock_module_dispatch(rng, monkeypatch):
    """ResBlock.apply routes through the fused kernel when enabled and
    produces the same output (interpret mode on CPU)."""
    monkeypatch.setenv("RVC_TPU_PALLAS_RESBLOCK", "1")
    C, T, k = 16, 400, 3
    net = ResBlock(C, k, (1, 3, 5))
    x = jnp.asarray(rng.standard_normal((1, T, C)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("RVC_TPU_PALLAS_RESBLOCK", "0")
    ref = np.asarray(net.apply(variables, x))
    monkeypatch.setenv("RVC_TPU_PALLAS_RESBLOCK", "1")
    got = np.asarray(net.apply(variables, x))
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=1e-2)
    # masked call must NOT take the fused path (mask semantics differ)
    mask = jnp.ones((1, T, 1))
    got_m = np.asarray(net.apply(variables, x, mask))
    np.testing.assert_allclose(got_m, ref, atol=1e-5)


def test_resblock_chain_grads_match_xla(rng, monkeypatch):
    """custom_vjp backward == autodiff of the plain XLA path."""
    monkeypatch.setenv("RVC_TPU_PALLAS_RESBLOCK", "1")
    C, T, k = 8, 200, 3
    net = ResBlock(C, k, (1, 3, 5))
    x = jnp.asarray(rng.standard_normal((1, T, C)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)

    def loss(v, x):
        return jnp.sum(net.apply(v, x) ** 2)

    g_fused = jax.grad(loss, argnums=(0, 1))(variables, x)
    monkeypatch.setenv("RVC_TPU_PALLAS_RESBLOCK", "0")
    g_ref = jax.grad(loss, argnums=(0, 1))(variables, x)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    assert len(flat_f) == len(flat_r)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2, rtol=1e-2)


def test_fused_resblock_multi_tile(rng):
    """T spanning several tiles: interior halos carry real neighbors."""
    C, T, k = 16, 9000, 3
    dil = (1, 3, 5)
    net = ResBlock(C, k, dil)
    x = jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(1), x)
    ref = np.asarray(net.apply(variables, x))
    w1, b1, w2, b2 = _stack_params(variables["params"], len(dil))
    got = np.asarray(fused_resblock(x, w1, b1, w2, b2, k, dil, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=1e-2)


def _group_weights(C, kernel_sizes, dils, key):
    from rvc_tpu.models.layers import ResBlock
    weights, variables_list = [], []
    for bi, (k, d) in enumerate(zip(kernel_sizes, dils)):
        net = ResBlock(C, k, d)
        x0 = jnp.zeros((1, 32, C))
        v = net.init(jax.random.PRNGKey(100 + bi), x0)
        variables_list.append((net, v))
        w1, b1, w2, b2 = _stack_params(v["params"], len(d))
        weights += [w1, b1, w2, b2]
    return tuple(weights), variables_list


@pytest.mark.parametrize("C,T", [(16, 700), (32, 500), (128, 300), (256, 200)])
def test_fused_resblock_group_matches_mean(rng, C, T):
    """Group kernel == mean of the three standalone flax ResBlocks."""
    from rvc_tpu.ops.pallas.resblock import fused_resblock_group

    kernel_sizes = (3, 7, 11)
    dils = ((1, 3, 5),) * 3
    weights, nets = _group_weights(C, kernel_sizes, dils, rng)
    x = jnp.asarray(rng.standard_normal((1, T, C)).astype(np.float32))
    ref = np.mean([np.asarray(net.apply(v, x)) for net, v in nets], axis=0)
    got = np.asarray(fused_resblock_group(x, weights, kernel_sizes, dils,
                                          interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=1e-2)
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9999, f"corr {corr}"


def test_resblock_group_grads_match_xla(rng):
    """custom_vjp backward of the group == autodiff of the XLA mean."""
    from rvc_tpu.ops.pallas.resblock import (_xla_resblock_group,
                                             resblock_group)

    C, T = 8, 200
    kernel_sizes = (3, 7)
    dils = ((1, 3, 5), (1, 3, 5))
    weights, _ = _group_weights(C, kernel_sizes, dils, rng)
    x = jnp.asarray(rng.standard_normal((1, T, C)).astype(np.float32))

    def loss_fused(x, w):
        return jnp.sum(resblock_group(x, w, kernel_sizes, dils) ** 2)

    def loss_ref(x, w):
        return jnp.sum(_xla_resblock_group(
            x, w, kernel_sizes=kernel_sizes, dilations=dils, slope=0.1) ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, weights)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, weights)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=5e-2, rtol=1e-2)
    for a, b in zip(gw_f, gw_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2, rtol=1e-2)


def test_generator_stage_group_dispatch(rng, monkeypatch):
    """The NSF generator produces the same waveform with the fused group
    path enabled (interpret) as with the plain flax path."""
    from rvc_tpu.models.generators import HiFiGANNSFGenerator

    net = HiFiGANNSFGenerator(
        initial_channel=32, resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3,
        upsample_rates=(10, 2), upsample_initial_channel=64,
        upsample_kernel_sizes=(20, 4), gin_channels=16, sr=16000)
    x = jnp.asarray(rng.standard_normal((1, 40, 32)).astype(np.float32))
    f0 = jnp.full((1, 40), 160.0)
    g = jnp.asarray(rng.standard_normal((1, 1, 16)).astype(np.float32))
    monkeypatch.setenv("RVC_TPU_PALLAS_RESBLOCK", "0")
    v = net.init({"params": jax.random.PRNGKey(3), "noise": jax.random.PRNGKey(4)}, x, f0, g)
    ref = np.asarray(net.apply(v, x, f0, g, rngs={"noise": jax.random.PRNGKey(7)}))
    monkeypatch.setenv("RVC_TPU_PALLAS_RESBLOCK", "1")
    got = np.asarray(net.apply(v, x, f0, g, rngs={"noise": jax.random.PRNGKey(7)}))
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=1e-2)
