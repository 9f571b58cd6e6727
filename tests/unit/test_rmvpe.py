"""RMVPE parity vs the reference torch E2E (imported as an oracle with a
librosa stub backed by our validated mel filterbank), plus functional f0
accuracy on synthetic signals."""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import importlib as _importlib

stft_ops = _importlib.import_module("rvc_tpu.ops.stft")
from rvc_tpu.models.rmvpe import E2E, RMVPE, decode_salience
from rvc_tpu.utils.weights import convert_rmvpe_state_dict


@pytest.fixture(scope="module")
def torch_e2e():
    import importlib.machinery

    lib = types.ModuleType("librosa")
    lib.__spec__ = importlib.machinery.ModuleSpec("librosa", None)
    filt = types.ModuleType("librosa.filters")
    filt.__spec__ = importlib.machinery.ModuleSpec("librosa.filters", None)
    filt.mel = lambda *, sr, n_fft, n_mels, fmin=0.0, fmax=None, htk=False: (
        stft_ops.mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk=htk))
    lib.filters = filt
    sys.modules.setdefault("librosa", lib)
    sys.modules.setdefault("librosa.filters", filt)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from rvc.lib.predictors.RMVPE import E2E as TorchE2E

    torch.manual_seed(0)
    return TorchE2E(4, 1, (2, 2)).eval()


@pytest.mark.parity
def test_e2e_parity(torch_e2e, rng):
    params, stats = convert_rmvpe_state_dict(
        {k: v.numpy() for k, v in torch_e2e.state_dict().items()})
    model = E2E()
    mel = rng.standard_normal((1, 64, 128)).astype(np.float32)
    with torch.no_grad():
        # torch E2E takes (B, n_mels, T); ours takes (B, T, n_mels)
        ref = torch_e2e(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()  # (B, T, 360)
    out = np.asarray(model.apply({"params": params, "batch_stats": stats},
                                 jnp.asarray(mel)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_decode_salience_peak():
    # salience: single hot bin per frame -> f0 = 10*2^(cents/1200)
    hidden = np.zeros((1, 4, 360), dtype=np.float32)
    hidden[0, :, 100] = 1.0
    f0 = np.asarray(decode_salience(jnp.asarray(hidden)))
    cents = 20.0 * 100 + 1997.3794084376191
    expected = 10 * 2 ** (cents / 1200)
    np.testing.assert_allclose(f0[0], expected, rtol=1e-4)


def test_decode_salience_threshold():
    hidden = np.full((1, 3, 360), 0.01, dtype=np.float32)  # below thred=0.03
    f0 = np.asarray(decode_salience(jnp.asarray(hidden)))
    assert (f0 == 0).all()


@pytest.mark.slow
def test_rmvpe_random_init_runs(sine_wave):
    """Random-weight predictor end to end: shapes + finite output."""
    y, sr = sine_wave
    pred = RMVPE(seed=0)
    f0 = pred.infer_from_audio(y[: sr // 2])
    assert f0.shape == (1 + (sr // 2) // 160,)
    assert np.isfinite(f0).all()


def test_packed_unet_matches_canonical(monkeypatch):
    """RVC_TPU_PACKED_UNET frequency space-to-depth evaluation
    (ops/packed_freq.py) is an EXACT transform — same sums, different
    grouping — so salience must match the canonical path to float
    accumulation-order noise."""
    import jax.numpy as jnp

    from rvc_tpu.models.rmvpe import RMVPE

    rmvpe = RMVPE(seed=0)
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.standard_normal((1, 64, 128)).astype(np.float32))
    monkeypatch.setenv("RVC_TPU_PACKED_UNET", "0")
    h_can = np.asarray(rmvpe.model.apply(rmvpe.variables, mel))
    monkeypatch.setenv("RVC_TPU_PACKED_UNET", "1")
    h_pack = np.asarray(rmvpe.model.apply(rmvpe.variables, mel))
    assert np.abs(h_can - h_pack).max() < 1e-4


def test_prepacked_serving_variables_match(monkeypatch):
    """Host-prepacked weights (prepack_unet_variables) drive the same
    packed graph to the same salience as canonical weights with
    in-graph packing — and as the canonical graph."""
    import jax.numpy as jnp

    from rvc_tpu.models.rmvpe import RMVPE

    rmvpe = RMVPE(seed=0)
    rng = np.random.default_rng(11)
    mel = jnp.asarray(rng.standard_normal((1, 64, 128)).astype(np.float32))
    monkeypatch.setenv("RVC_TPU_PACKED_UNET", "0")
    h_can = np.asarray(rmvpe.model.apply(rmvpe.serving_variables(), mel))
    monkeypatch.setenv("RVC_TPU_PACKED_UNET", "1")
    sv = rmvpe.serving_variables()
    # prepack actually replaced the stage-1 conv weights
    w = sv["params"]["unet"]["encoder_layers_0"]["blocks_0"]["conv_0"][
        "weight"]
    assert w.shape == (3, 3, 8 * 1, 8 * 16)
    h_pre = np.asarray(rmvpe.model.apply(sv, mel))
    assert np.abs(h_can - h_pre).max() < 1e-4
    # tc sub-knob prepack keeps equivalence too
    monkeypatch.setenv("RVC_TPU_PACKED_TC", "1")
    h_tc = np.asarray(rmvpe.model.apply(rmvpe.serving_variables(), mel))
    assert np.abs(h_can - h_tc).max() < 1e-4


def test_packed_freq_conv_ops():
    """Packed conv/pointwise/bn primitives against their canonical
    lax counterparts on random shapes, including the edge groups."""
    import jax.numpy as jnp
    from jax import lax

    from rvc_tpu.ops.packed_freq import (
        pack,
        packed_conv3,
        packed_pointwise,
        pick_pack,
        unpack,
    )

    rng = np.random.default_rng(3)
    for (t, f, cin, cout) in [(16, 128, 16, 16), (16, 64, 16, 32),
                              (12, 128, 32, 16), (8, 128, 16, 3)]:
        p = pick_pack(f, cout)
        assert p * cout <= 128 and f % p == 0
        x = jnp.asarray(rng.standard_normal((1, t, f, cin)),
                        jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        y_ref = lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        y = unpack(packed_conv3(pack(x, p), w, p, b), p)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-5, rtol=1e-5)
        w1 = jnp.asarray(rng.standard_normal((1, 1, cin, cout)) * 0.1,
                         jnp.float32)
        y1_ref = lax.conv_general_dilated(
            x, w1, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y1 = unpack(packed_pointwise(pack(x, p), w1, p), p)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y1_ref),
                                   atol=2e-5, rtol=1e-5)


def test_e2e_bf16_trunk_close_to_f32():
    """bf16 mel input runs the U-Net trunk in bf16 (head pinned f32);
    salience must stay within the reference's 0.01 activation bar."""
    import jax
    import jax.numpy as jnp

    from rvc_tpu.models.rmvpe import RMVPE

    rmvpe = RMVPE(seed=0)
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal((1, 64, 128)).astype(np.float32))
    h32 = np.asarray(rmvpe.model.apply(rmvpe.variables, mel))
    h16 = np.asarray(rmvpe.model.apply(rmvpe.variables,
                                       mel.astype(jnp.bfloat16)))
    assert h16.dtype == np.float32  # head cast back
    assert np.abs(h32 - h16).max() < 0.01
