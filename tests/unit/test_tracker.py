"""Observability: tracker backends, rolling means, spectrogram images.

Reference behavior: `rvc/train/train.py:790-830` (rolling-50 scalar
means to tensorboard), `:838-900` (mel images + eval audio),
`rvc_mlx/monitoring/aim_tracker.py:317` (backend selection)."""

import json
import os

import numpy as np
import pytest

from rvc_tpu.monitoring.tracker import (
    RollingMean,
    SimpleTracker,
    TensorBoardTracker,
    create_tracker,
    spectrogram_image,
)


def test_spectrogram_image_shape_and_range():
    mel = np.random.default_rng(0).standard_normal((120, 80)).astype(np.float32)
    img = spectrogram_image(mel)
    assert img.shape == (3, 80, 120)  # (C, n_mels, T)
    assert img.dtype == np.uint8
    # constant input doesn't divide by zero
    flat = spectrogram_image(np.zeros((10, 5)))
    assert flat.shape == (3, 5, 10)


def test_rolling_mean_window():
    rm = RollingMean(window=3)
    out = None
    for v in [1.0, 2.0, 3.0, 4.0]:
        out = rm.update({"x": v})
    assert out["x"] == pytest.approx((2 + 3 + 4) / 3)
    # non-finite values are dropped, last mean kept
    out = rm.update({"x": float("nan")})
    assert np.isfinite(out["x"])


def test_simple_tracker_roundtrip(tmp_path):
    t = SimpleTracker(str(tmp_path), "run")
    t.log_params({"lr": 1e-4})
    t.log_metrics({"loss": 1.5}, step=1)
    t.log_metrics({"loss": 1.2}, step=2)
    t.log_audio("eval", np.zeros(1600, dtype=np.float32), 16000, step=2)
    t.log_spectrogram("mel", np.random.default_rng(0).random((40, 30)), step=2)
    t.close()

    rows = [json.loads(l) for l in open(t.path)]
    assert [r["loss"] for r in rows] == [1.5, 1.2]
    assert json.load(open(t.hparams_path))["lr"] == 1e-4
    assert os.path.exists(tmp_path / "audio" / "eval_step2.wav")
    png = tmp_path / "images" / "mel_step2.png"
    assert png.exists()
    assert open(png, "rb").read(8) == b"\x89PNG\r\n\x1a\n"


def test_tensorboard_tracker_writes_events(tmp_path):
    pytest.importorskip("torch.utils.tensorboard")
    t = TensorBoardTracker(str(tmp_path), "run")
    t.log_params({"bs": 8})
    t.log_metrics({"loss": 0.5}, step=1)
    t.log_audio("eval", 0.1 * np.ones(800, dtype=np.float32), 16000, step=1)
    t.log_spectrogram("mel", np.random.default_rng(1).random((20, 16)), step=1)
    t.close()
    tb_dir = tmp_path / "tb" / "run"
    events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
    assert events, "no tensorboard event file written"
    assert os.path.getsize(tb_dir / events[0]) > 100
    # JSONL mirror still present
    assert os.path.exists(t.path)


def test_create_tracker_use_aim_raises_without_aim(tmp_path):
    try:
        import aim  # noqa: F401

        pytest.skip("aim installed; the raise path doesn't apply")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="aim"):
        create_tracker(str(tmp_path), use_aim=True)


def test_create_tracker_auto_picks_richest(tmp_path):
    t = create_tracker(str(tmp_path))
    try:
        import torch.utils.tensorboard  # noqa: F401

        assert isinstance(t, TensorBoardTracker)
    except Exception:
        assert isinstance(t, SimpleTracker)
    t.close()
