"""Synthesizer-stack invariants (mirrors the reference's unit test strategy,
`tests/unit/test_synthesizer.py` + `test_residuals.py` there: shape
contracts, mask respect, flow invertibility, output boundedness)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rvc_tpu.configs import get_config
from rvc_tpu.models.encoders import TextEncoder, PosteriorEncoder
from rvc_tpu.models.flow import ResidualCouplingBlock
from rvc_tpu.models.generators import HiFiGANNSFGenerator, sine_source
from rvc_tpu.models.synthesizer import build_synthesizer

CFG = get_config(48000, model_spk_embed_dim=4)


@pytest.fixture(scope="module")
def keys():
    return jax.random.split(jax.random.PRNGKey(0), 8)


def test_text_encoder_shapes(keys):
    enc = TextEncoder(192, 192, 768, 2, 2, 3)  # 2 layers for speed
    B, T = 2, 24
    phone = jax.random.normal(keys[0], (B, T, 768))
    pitch = jax.random.randint(keys[1], (B, T), 1, 255)
    lengths = jnp.array([T, T // 2])
    params = enc.init(keys[2], phone, pitch, lengths)
    m, logs, mask = enc.apply(params, phone, pitch, lengths)
    assert m.shape == (B, T, 192) and logs.shape == (B, T, 192)
    assert mask.shape == (B, T, 1)
    # masked region must be zero
    np.testing.assert_allclose(np.asarray(m[1, T // 2:]), 0.0, atol=1e-6)


def test_posterior_encoder_shapes(keys):
    enc = PosteriorEncoder(1025, 192, 192, 5, 1, 4, gin_channels=256)
    B, T = 2, 20
    spec = jax.random.normal(keys[0], (B, T, 1025))
    g = jax.random.normal(keys[1], (B, 1, 256))
    lengths = jnp.array([T, T - 5])
    params = enc.init({"params": keys[2], "noise": keys[3]}, spec, lengths, g)
    z, m, logs, mask = enc.apply(params, spec, lengths, g, rngs={"noise": keys[4]})
    assert z.shape == (B, T, 192)
    np.testing.assert_allclose(np.asarray(z[1, T - 5:]), 0.0, atol=1e-6)


def test_flow_forward_reverse_inverse(keys):
    """flow(flow(x)) with reverse=True must recover x (flip-before-layer
    ordering in reverse — the bug that burned the MLX/Swift ports)."""
    flow = ResidualCouplingBlock(192, 192, 5, 1, 2, n_flows=2, gin_channels=256)
    B, T = 2, 16
    x = jax.random.normal(keys[0], (B, T, 192))
    mask = jnp.ones((B, T, 1))
    g = jax.random.normal(keys[1], (B, 1, 256))
    params = flow.init(keys[2], x, mask, g)
    z = flow.apply(params, x, mask, g=g, reverse=False)
    x_rec = flow.apply(params, z, mask, g=g, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-3, atol=1e-4)


def test_sine_source_phase_continuity():
    """Constant f0 -> the generated fundamental must be a continuous sine
    (no discontinuity at frame boundaries)."""
    sr, upp = 48000, 480
    f0 = jnp.full((1, 20), 100.0)
    src, voiced = sine_source(f0, upp, sr, rng=None)
    s = np.asarray(src[0, :, 0])
    assert np.asarray(voiced).min() == 1.0
    # a pure continuous sine: amplitude 0.1, max |second difference| is bounded
    # by amp*(2*pi*f/sr)^2; discontinuities would blow far past it
    d2 = np.abs(np.diff(s, 2))
    bound = 0.1 * (2 * np.pi * 100 / sr) ** 2 * 1.5
    assert d2.max() < bound, f"phase discontinuity: {d2.max():.2e} vs {bound:.2e}"


def test_sine_source_unvoiced_noise():
    f0 = jnp.concatenate([jnp.full((1, 5), 100.0), jnp.zeros((1, 5))], axis=1)
    src, voiced = sine_source(f0, 100, 16000, rng=jax.random.PRNGKey(0))
    v = np.asarray(voiced[0, :, 0])
    assert (v[:500] == 1).all() and (v[500:] == 0).all()
    # unvoiced part is noise at sine_amp/3 = 0.033
    unvoiced_std = np.asarray(src[0, 500:, 0]).std()
    assert 0.02 < unvoiced_std < 0.05


def test_nsf_generator_output(keys):
    m = CFG.model
    gen = HiFiGANNSFGenerator(
        m.inter_channels, m.resblock_kernel_sizes, m.resblock_dilation_sizes,
        m.upsample_rates, m.upsample_initial_channel, m.upsample_kernel_sizes,
        m.gin_channels, 48000)
    B, T = 1, 12
    x = jax.random.normal(keys[0], (B, T, m.inter_channels))
    f0 = jnp.full((B, T), 220.0)
    g = jax.random.normal(keys[1], (B, 1, m.gin_channels))
    params = gen.init(keys[2], x, f0, g)
    out = gen.apply(params, x, f0, g)
    assert out.shape == (B, T * 480, 1)
    assert np.abs(np.asarray(out)).max() <= 1.0


@pytest.fixture(scope="module")
def tiny_synth():
    cfg = get_config(48000, model_spk_embed_dim=4, model_n_layers=2)
    net = build_synthesizer(cfg)
    B, T = 1, 40
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 6)
    phone = jax.random.normal(ks[0], (B, T, 768))
    pitch = jax.random.randint(ks[1], (B, T), 1, 255)
    pitchf = jnp.full((B, T), 200.0)
    lengths = jnp.array([T])
    sid = jnp.array([0])
    spec = jax.random.normal(ks[4], (B, T, cfg.data.spec_channels))
    variables = net.init(
        {"params": ks[2], "noise": ks[3]},
        phone, lengths, pitch, pitchf, spec, lengths, sid,
        rng=ks[5],
    )
    return cfg, net, variables, (phone, pitch, pitchf, lengths, sid)


def test_synthesizer_infer_shape(tiny_synth):
    cfg, net, variables, (phone, pitch, pitchf, lengths, sid) = tiny_synth
    o, mask = net.apply(variables, phone, lengths, pitch, pitchf, sid, method=net.infer)
    T = phone.shape[1]
    assert o.shape == (1, T * 480, 1)
    assert np.abs(np.asarray(o)).max() <= 1.0


def test_synthesizer_train_forward(tiny_synth):
    cfg, net, variables, (phone, pitch, pitchf, lengths, sid) = tiny_synth
    B, T = phone.shape[0], phone.shape[1]
    T_spec = T
    spec = jax.random.normal(jax.random.PRNGKey(2), (B, T_spec, cfg.data.spec_channels))
    seg = min(cfg.segment_frames, T_spec)
    out = net.apply(
        variables, phone, lengths, pitch, pitchf, spec, jnp.array([T_spec]), sid,
        rng=jax.random.PRNGKey(3),
    )
    upp = int(np.prod(cfg.model.upsample_rates))
    assert out.wave.shape == (B, cfg.segment_frames * upp, 1)
    assert out.z.shape == (B, T_spec, cfg.model.inter_channels)
    assert out.z_p.shape == out.z.shape
    assert out.m_q.shape == out.z.shape


def test_synthesizer_infer_jit(tiny_synth):
    cfg, net, variables, (phone, pitch, pitchf, lengths, sid) = tiny_synth
    f = jax.jit(lambda v, *a: net.apply(v, *a, method=net.infer))
    o1, _ = f(variables, phone, lengths, pitch, pitchf, sid)
    o2, _ = f(variables, phone, lengths, pitch, pitchf, sid)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
