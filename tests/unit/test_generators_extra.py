"""MRF HiFi-GAN + RefineGAN vocoders: shapes, boundedness, sine bank."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rvc_tpu.models.generators_extra import (
    HiFiGANMRFGenerator,
    RefineGANGenerator,
    audio_rate_sines,
    kaiser_sinc_decimate,
    linear_resize,
)


def test_audio_rate_sines_phase():
    sr = 16000
    f0 = jnp.full((1, 1600, 1), 200.0)
    s = audio_rate_sines(f0, sr, harmonic_num=2, rng=None)
    assert s.shape == (1, 1600, 3)
    # fundamental: continuous 200 Hz sine scaled by 0.1
    x = np.asarray(s[0, :, 0])
    d2 = np.abs(np.diff(x, 2))
    bound = 0.1 * (2 * np.pi * 200 / sr) ** 2 * 1.5
    assert d2.max() < bound


def test_kaiser_decimate_preserves_lowband():
    sr = 16000
    t = np.arange(sr) / sr
    y = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    x = jnp.asarray(y)[None, :, None]
    out = np.asarray(kaiser_sinc_decimate(x, 4))[0, :, 0]
    assert out.shape[0] == sr // 4
    # 100 Hz survives 4x decimation nearly unchanged in amplitude
    mid = out[200:-200]
    assert 0.9 < np.abs(mid).max() < 1.1


def test_linear_resize():
    x = jnp.asarray(np.arange(8, dtype=np.float32))[None, :, None]
    out = np.asarray(linear_resize(x, 16))[0, :, 0]
    assert out.shape == (16,)
    assert out[0] <= out[-1]


@pytest.mark.slow
def test_mrf_generator(rng):
    gen = HiFiGANMRFGenerator(
        in_channel=64, upsample_initial_channel=64,
        upsample_rates=(10, 8, 2, 2), upsample_kernel_sizes=(20, 16, 4, 4),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilations=((1, 3, 5),) * 3,
        gin_channels=32, sample_rate=32000)
    B, T = 1, 12
    x = jnp.asarray(rng.standard_normal((B, T, 64)).astype(np.float32))
    f0 = jnp.full((B, T), 220.0)
    g = jnp.asarray(rng.standard_normal((B, 1, 32)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), x, f0, g)
    out = gen.apply(params, x, f0, g)
    assert out.shape == (B, T * 320, 1)
    assert np.abs(np.asarray(out)).max() <= 1.0


@pytest.mark.slow
def test_refinegan_generator(rng):
    # upsample_initial_channel must be 2*16*2^len(rates) = 512 for 4 stages
    # (the sine-skip path doubles 16ch per stage and fuses at c//2)
    gen = RefineGANGenerator(sample_rate=32000, upsample_rates=(10, 8, 2, 2),
                             num_mels=64, upsample_initial_channel=512,
                             gin_channels=32)
    B, T = 1, 12
    mel = jnp.asarray(rng.standard_normal((B, T, 64)).astype(np.float32))
    f0 = jnp.full((B, T), 220.0)
    g = jnp.asarray(rng.standard_normal((B, 1, 32)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), mel, f0, g)
    out = gen.apply(params, mel, f0, g)
    assert out.shape == (B, T * 320, 1)
    assert np.abs(np.asarray(out)).max() <= 1.0


@pytest.mark.slow
def test_synthesizer_with_mrf_vocoder():
    from rvc_tpu.configs import get_config
    from rvc_tpu.models.synthesizer import build_synthesizer

    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64,
                     model_vocoder="MRF HiFi-GAN")
    net = build_synthesizer(cfg)
    B, T = 1, 40
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    phone = jax.random.normal(ks[0], (B, T, 768))
    pitch = jax.random.randint(ks[1], (B, T), 1, 255)
    pitchf = jnp.full((B, T), 200.0)
    spec = jax.random.normal(ks[2], (B, T, cfg.data.spec_channels))
    variables = net.init({"params": ks[3], "noise": ks[4]},
                         phone, jnp.array([T]), pitch, pitchf, spec,
                         jnp.array([T]), jnp.array([0]), rng=ks[5])
    o, _ = net.apply(variables, phone, jnp.array([T]), pitch, pitchf,
                     jnp.array([0]), method=net.infer)
    assert o.shape == (B, T * 320, 1)
