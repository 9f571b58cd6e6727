"""Trainer loop: epoch training on a synthetic dataset, checkpoint
save/resume round trip with optimizer state, export."""

import json
import os

import numpy as np
import pytest
import jax

from rvc_tpu.configs import get_config
from rvc_tpu.train.data import DataLoader, RVCDataset
from rvc_tpu.train.trainer import RVCTrainer


class FakeDataset(RVCDataset):
    """In-memory dataset: overrides file loading."""

    def __init__(self, n, T, cfg, seed=0):
        self.rows = [{"n_frames": T, "sid": 0} for _ in range(n)]
        self.hop_length = cfg.data.hop_length
        self._cfg = cfg
        self._T = T
        self._rng = np.random.default_rng(seed)
        self._cache = {}

    def __getitem__(self, i):
        if i not in self._cache:
            T, cfg = self._T, self._cfg
            r = self._rng
            self._cache[i] = dict(
                phone=r.standard_normal((T, 768)).astype(np.float32),
                pitch=r.integers(1, 255, T).astype(np.int32),
                pitchf=np.full(T, 180.0, np.float32),
                spec=r.standard_normal((T, cfg.data.spec_channels)).astype(np.float32),
                wave=(0.1 * r.standard_normal(T * cfg.data.hop_length)).astype(np.float32),
                sid=0, length=T)
        return self._cache[i]


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64,
                     train_segment_size=320 * 12, train_batch_size=2)
    ds = FakeDataset(4, 50, cfg)
    loader = DataLoader(ds, batch_size=2, drop_last=True)
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    return cfg, loader, ckpt


@pytest.mark.slow
def test_trainer_epochs_and_checkpoint(tiny_setup):
    cfg, loader, ckpt = tiny_setup
    tr = RVCTrainer(cfg, loader, checkpoint_dir=ckpt, seed=0)
    result = tr.train(epochs=2, save_every=1, warmup_epochs=1)
    assert result["epochs_run"] == 2
    # warmup epoch non-adversarial, second adversarial
    assert result["history"][0]["adversarial"] is False
    assert result["history"][1]["adversarial"] is True
    assert os.path.exists(os.path.join(ckpt, "last_G.safetensors"))
    assert os.path.exists(os.path.join(ckpt, "train_log.jsonl"))

    # resume restores epoch + params + optimizer state
    tr2 = RVCTrainer(cfg, loader, checkpoint_dir=ckpt, seed=1)
    tr2.resume("last")
    assert tr2.epoch == tr.epoch
    g1 = jax.device_get(tr.state.g_params)
    g2 = jax.device_get(tr2.state.g_params)
    leaf1 = g1["emb_g"]["weight"]
    leaf2 = g2["emb_g"]["weight"]
    np.testing.assert_allclose(leaf1, leaf2, atol=1e-6)

    # inference export drops enc_q
    out = tr.export_inference_model(os.path.join(ckpt, "final.safetensors"))
    from rvc_tpu.utils.weights import load_params

    params = load_params(out)
    assert "enc_q" not in params
    assert "enc_p" in params and "dec" in params
    with open(os.path.join(ckpt, "final.json")) as f:
        side = json.load(f)
    assert side["data"]["sample_rate"] == 32000


@pytest.mark.slow
def test_trainer_observability_artifacts(tmp_path):
    """Training with an eval batch must emit tracker artifacts: scalar
    series, eval audio, and a mel-spectrogram image (the torch trainer's
    tensorboard outputs, `rvc/train/train.py:838-900`)."""
    import jax.numpy as jnp

    from rvc_tpu.train.train_step import Batch

    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64,
                     train_segment_size=320 * 12, train_batch_size=2)
    ds = FakeDataset(4, 50, cfg)
    loader = DataLoader(ds, batch_size=2, drop_last=True)
    ckpt = str(tmp_path / "ckpt")
    tr = RVCTrainer(cfg, loader, checkpoint_dir=ckpt, seed=0,
                    model_name="tiny", log_every_steps=1)
    T = 24
    r = np.random.default_rng(1)
    tr.eval_batch = Batch(
        phone=jnp.asarray(r.standard_normal((1, T, 768)).astype(np.float32)),
        phone_lengths=jnp.array([T]),
        pitch=jnp.asarray(r.integers(1, 255, (1, T)).astype(np.int32)),
        pitchf=jnp.full((1, T), 180.0),
        spec=jnp.zeros((1, T, cfg.data.spec_channels)),
        spec_lengths=jnp.array([T]),
        wave=jnp.zeros((1, T * cfg.data.hop_length)),
        sid=jnp.array([0]))
    tr.train(epochs=1, save_every=1, warmup_epochs=1)

    rows = [json.loads(l) for l in open(tr.tracker.path)]
    assert any("loss_mel" in r for r in rows), "no scalar series logged"
    audio_dir = os.path.join(ckpt, "audio")
    img_dir = os.path.join(ckpt, "images")
    assert any(f.startswith("eval") for f in os.listdir(audio_dir))
    assert any(f.startswith("eval") for f in os.listdir(img_dir))
    tb_dir = os.path.join(ckpt, "tb", "tiny")
    if os.path.isdir(tb_dir):  # tensorboard backend active in this image
        assert any("tfevents" in f for f in os.listdir(tb_dir))


@pytest.mark.slow
def test_trainer_reference_flags(tmp_path):
    """save_only_latest / save_every_weights / cache_data_on_device /
    d_step_per_g_step (reference rvc/train/train.py flag parity)."""
    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64,
                     train_segment_size=320 * 12, train_batch_size=2,
                     train_d_step_per_g_step=2)
    ds = FakeDataset(4, 50, cfg)
    loader = DataLoader(ds, batch_size=2, drop_last=True)
    ckpt = str(tmp_path / "ckpt")
    tr = RVCTrainer(cfg, loader, checkpoint_dir=ckpt, seed=0,
                    save_only_latest=True, save_every_weights=True,
                    cache_data_on_device=True, model_name="tiny")
    result = tr.train(epochs=2, save_every=1, warmup_epochs=0)
    assert result["epochs_run"] == 2
    files = set(os.listdir(ckpt))
    # fixed-name checkpoint instead of per-epoch names
    assert "latest_G.safetensors" in files
    assert not any(f.startswith("epoch_") and f.endswith("_G.safetensors")
                   for f in files)
    # per-save inference export
    assert "tiny_1e.safetensors" in files and "tiny_2e.safetensors" in files
    # device cache populated and reused
    assert tr._device_batches is not None and len(tr._device_batches) == 2


@pytest.mark.slow
def test_preemption_graceful_stop(tmp_path):
    """SIGTERM mid-training (the pod scheduler's eviction signal) stops
    at the epoch boundary with a resumable checkpoint — beyond-reference
    elastic behavior (SURVEY §5: reference has none)."""
    import glob
    import signal
    import threading

    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64,
                     train_segment_size=320 * 12, train_batch_size=2)
    ds = FakeDataset(4, 50, cfg)
    loader = DataLoader(ds, batch_size=2, drop_last=True)
    trainer = RVCTrainer(cfg, loader, checkpoint_dir=str(tmp_path))

    # deliver a real SIGTERM once the first epoch is underway
    threading.Timer(0.5, os.kill, (os.getpid(), signal.SIGTERM)).start()
    result = trainer.train(epochs=50, save_every=100)

    assert result["preempted"] is True
    assert result["epochs_run"] < 50
    ckpts = glob.glob(os.path.join(str(tmp_path), "preempt_epoch_*_G.safetensors"))
    assert ckpts, os.listdir(str(tmp_path))
    # and the checkpoint resumes
    name = os.path.basename(ckpts[0])[: -len("_G.safetensors")]
    trainer2 = RVCTrainer(cfg, loader, checkpoint_dir=str(tmp_path))
    trainer2.resume(name)
