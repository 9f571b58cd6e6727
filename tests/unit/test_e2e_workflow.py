"""The full product loop on synthetic data: preprocess -> feature extract
-> dataset build (+ mutes) -> index build -> train a few epochs ->
export -> load exported model -> convert audio with retrieval.

This is the workflow the reference spreads across its CLI subcommands
(preprocess/extract/train/index/infer); here it runs end to end in one
test with a tiny config.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _speech(sr, dur, f0=180.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur)) / sr
    sig = np.zeros_like(t)
    for h, a in [(1, 0.5), (2, 0.2), (3, 0.1)]:
        sig += a * np.sin(2 * np.pi * h * f0 * t)
    sig *= 0.7 + 0.3 * np.sin(2 * np.pi * 1.1 * t)
    sig += 0.01 * rng.standard_normal(len(t))
    return (0.6 * sig / np.abs(sig).max()).astype(np.float32)


def test_full_workflow(tmp_path):
    from rvc_tpu.configs import get_config
    from rvc_tpu.preprocess import AudioPreprocessor, DatasetBuilder, FeatureExtractor
    from rvc_tpu.retrieval import build_index, read_faiss_index, write_faiss_index
    from rvc_tpu.train.data import DataLoader, RVCDataset
    from rvc_tpu.train.trainer import RVCTrainer
    from rvc_tpu.utils.audio import save_wav

    sr = 32000
    cfg = get_config(sr, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64,
                     train_segment_size=320 * 12, train_batch_size=2)

    # 1. dataset: two "speakers" of synthetic speech
    data_dir = tmp_path / "dataset"
    for sid, f0 in [(0, 160.0), (1, 240.0)]:
        d = data_dir / str(sid)
        d.mkdir(parents=True)
        save_wav(str(d / "a.wav"), _speech(sr, 4.0, f0, seed=sid), sr)

    # 2. preprocess (slice + dual rate)
    exp = str(tmp_path / "exp")
    pre = AudioPreprocessor(exp, sr)
    n_seg = pre.process_directory(str(data_dir), "Simple", chunk_len=1.2,
                                  overlap_len=0.3)
    assert n_seg >= 4

    # 3. features (DSP pitch for speed; random-init HuBERT)
    fe = FeatureExtractor(exp, cfg, f0_method="pm")
    n_feat = fe.process_all()
    assert n_feat == n_seg

    # 4. dataset build + mutes
    builder = DatasetBuilder(exp, min_frames=10, max_frames=900)
    train_rows, val_rows = builder.build(val_fraction=0.1)
    assert train_rows
    mutes = builder.add_mutes(cfg, include_mutes=1, feature_extractor=fe)
    assert len(mutes) == 2  # one per speaker
    builder.write_filelist(os.path.join(exp, "filelist.txt"), train_rows)
    back = builder.read_filelist(os.path.join(exp, "filelist.txt"))
    assert len(back) == len(train_rows)

    # 5. retrieval index from the extracted features
    feats = np.concatenate([np.load(r["features"]) for r in train_rows])
    idx = build_index(feats.astype(np.float32), nlist=4)
    idx_path = os.path.join(exp, "speaker.index")
    write_faiss_index(idx, idx_path)

    # 6. train two epochs (1 warmup + 1 adversarial)
    for r in train_rows:
        r.setdefault("n_frames", int(np.load(r["spec"], mmap_mode="r").shape[0]))
    ds = RVCDataset(train_rows + mutes, cfg.data.hop_length)
    loader = DataLoader(ds, batch_size=2, drop_last=False)
    tr = RVCTrainer(cfg, loader, checkpoint_dir=os.path.join(exp, "ckpt"))
    result = tr.train(epochs=2, save_every=1, warmup_epochs=1)
    assert result["epochs_run"] == 2
    model_path = tr.export_inference_model(os.path.join(exp, "model.safetensors"))

    # 7. load the exported model + index and convert
    from rvc_tpu.api import RVC

    rvc = RVC(model_path, index_path=idx_path)
    assert rvc.cfg.data.sample_rate == sr
    assert rvc.index is not None and rvc.index.ntotal == len(feats)
    audio = _speech(16000, 1.0, 200.0, seed=7)
    out = rvc.infer(audio, sid=1, f0_method="pm", index_rate=0.75)
    assert np.isfinite(out).all()
    assert len(out) > 0
