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
@pytest.mark.parametrize("vocoder", ["HiFi-GAN", "MRF HiFi-GAN", "RefineGAN"])
def test_train_step_per_vocoder(vocoder, tiny_batch):
    """One full G+D step per vocoder family; RefineGAN must get the v3
    discriminator (multi-resolution bank) + multi-scale mel loss
    (`rvc/train/train.py:73-75,466`), and gradients must reach the
    vocoder (dec) params."""
    cfg = get_config(
        32000, model_spk_embed_dim=2, model_n_layers=1,
        model_upsample_initial_channel=64, train_segment_size=320 * 12,
        train_batch_size=2, model_vocoder=vocoder)
    state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(2))
    assert net_d.use_multi_resolution == (vocoder == "RefineGAN")
    if vocoder == "RefineGAN":
        assert any(k.startswith("disc_r_") for k in state.d_params)

    dec_before = jax.device_get(state.g_params["dec"])
    step = make_train_step(cfg, net_g, net_d, adversarial=True)
    state, metrics = step(state, tiny_batch, jax.random.PRNGKey(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{vocoder}: {k} not finite"
    assert float(metrics["loss_mel"]) > 0
    dec_after = jax.device_get(state.g_params["dec"])
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), dec_before, dec_after))
    assert max(moved) > 0, f"{vocoder}: no gradient reached the vocoder"


@pytest.mark.slow
def test_d_gate_skips_optimizer_state(tiny_cfg, tiny_batch):
    """Below-threshold D loss must leave d_params AND the AdamW moments
    bit-identical (the reference SKIPS the update, `trainer.py:453`) —
    not just zero the grads, which would still decay weights and advance
    moments."""
    cfg = get_config(
        32000, model_spk_embed_dim=2, model_n_layers=1,
        model_upsample_initial_channel=64, train_segment_size=320 * 12,
        train_batch_size=2, train_d_loss_threshold=1e9)
    state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(3))
    d_params_0 = jax.device_get(state.d_params)
    d_opt_0 = jax.device_get(state.d_opt)

    step = make_train_step(cfg, net_g, net_d, adversarial=True)
    state, metrics = step(state, tiny_batch, jax.random.PRNGKey(0))
    assert float(metrics["loss_d"]) < 1e9  # gate actually fired

    d_params_1 = jax.device_get(state.d_params)
    d_opt_1 = jax.device_get(state.d_opt)
    jax.tree.map(np.testing.assert_array_equal, d_params_0, d_params_1)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 d_opt_0, d_opt_1)
    # ...and the generator still trained
    assert int(state.step) == 1

    # threshold 0 disables the gate: D state must move
    cfg_on = get_config(
        32000, model_spk_embed_dim=2, model_n_layers=1,
        model_upsample_initial_channel=64, train_segment_size=320 * 12,
        train_batch_size=2, train_d_loss_threshold=0.0)
    state2, net_g2, net_d2 = create_train_state(cfg_on, jax.random.PRNGKey(3))
    d_before = jax.device_get(state2.d_params)
    step2 = make_train_step(cfg_on, net_g2, net_d2, adversarial=True)
    state2, _ = step2(state2, tiny_batch, jax.random.PRNGKey(0))
    moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()),
        d_before, jax.device_get(state2.d_params))))
    assert moved > 0


@pytest.mark.slow
def test_warmup_mode_no_adversarial(tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(1))
    step = make_train_step(cfg, net_g, net_d, adversarial=False)
    state, metrics = step(state, tiny_batch, jax.random.PRNGKey(0))
    assert float(metrics["loss_adv"]) == 0.0
    assert float(metrics["loss_fm"]) == 0.0
    assert np.isfinite(float(metrics["loss_g_total"]))
