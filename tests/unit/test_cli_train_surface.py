"""Train-CLI conveniences added for reference parity: stock-pretrain
resolution (`--pretrained/--pretrain titan`), KMeans index compression
(`--index_algorithm`), auto batch size."""

import argparse
import os

import numpy as np


def _args(**kw):
    ns = argparse.Namespace(vocoder="HiFi-GAN", pretrain="base",
                            sample_rate=48000)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


class TestDefaultPretrains:
    def test_missing_warns_and_trains_from_scratch(self, tmp_path, monkeypatch, capsys):
        from rvc_tpu.cli import _default_pretrains

        monkeypatch.setenv("RVC_TPU_MODELS_DIR", str(tmp_path))
        g, d = _default_pretrains(_args())
        assert g is None and d is None
        assert "not found" in capsys.readouterr().err

    def test_resolves_family_and_rate(self, tmp_path, monkeypatch):
        from rvc_tpu.cli import _default_pretrains

        monkeypatch.setenv("RVC_TPU_MODELS_DIR", str(tmp_path))
        root = tmp_path / "pretraineds" / "titan"
        root.mkdir(parents=True)
        (root / "f0G40k.pth").write_bytes(b"g")
        (root / "f0D40k.pth").write_bytes(b"d")
        g, d = _default_pretrains(_args(pretrain="titan", sample_rate=40000))
        assert g.endswith("titan/f0G40k.pth") and d.endswith("titan/f0D40k.pth")

    def test_refinegan_family(self, tmp_path, monkeypatch):
        from rvc_tpu.cli import _default_pretrains

        monkeypatch.setenv("RVC_TPU_MODELS_DIR", str(tmp_path))
        root = tmp_path / "pretraineds" / "refinegan"
        root.mkdir(parents=True)
        (root / "f0G32k.pth").write_bytes(b"g")
        (root / "f0D32k.pth").write_bytes(b"d")
        g, _ = _default_pretrains(_args(vocoder="RefineGAN", sample_rate=32000))
        assert "refinegan" in g


def test_cmd_index_kmeans_compresses(tmp_path):
    """KMeans algorithm clusters features before indexing (reference
    `extract_index.py` MiniBatchKMeans branch)."""
    from rvc_tpu.cli import cmd_index
    from rvc_tpu.retrieval import read_faiss_index

    exp = tmp_path / "logs" / "m"
    (exp / "features").mkdir(parents=True)
    rng = np.random.default_rng(0)
    np.save(exp / "features" / "a.npy",
            rng.standard_normal((600, 768)).astype(np.float32))
    args = argparse.Namespace(model_name="m", logs_dir=str(tmp_path / "logs"),
                              index_algorithm="KMeans")
    cmd_index(args)
    idx = read_faiss_index(str(exp / "m.index"))
    assert idx.ntotal == 150  # 600 // 4 centroids, not the raw vectors


def test_cmd_index_faiss_keeps_all(tmp_path):
    from rvc_tpu.cli import cmd_index
    from rvc_tpu.retrieval import read_faiss_index

    exp = tmp_path / "logs" / "m"
    (exp / "features").mkdir(parents=True)
    rng = np.random.default_rng(0)
    np.save(exp / "features" / "a.npy",
            rng.standard_normal((300, 768)).astype(np.float32))
    args = argparse.Namespace(model_name="m", logs_dir=str(tmp_path / "logs"),
                              index_algorithm="Faiss")
    cmd_index(args)
    idx = read_faiss_index(str(exp / "m.index"))
    assert idx.ntotal == 300


def test_tts_builtin_catalog_full():
    """The built-in voice catalog carries the reference's full 322-voice
    Azure list (`rvc/lib/tools/tts_voices.json`), not the 18-voice
    fallback."""
    from rvc_tpu.tools.tts import builtin_catalog

    v = builtin_catalog()
    assert len(v) == 322
    assert "en-US-AriaNeural" in v and "zu-ZA-ThandoNeural" in v
    assert all(x.endswith("Neural") for x in v)


def test_serve_subcommand_parses():
    from rvc_tpu import cli
    import sys

    # parser builds and wires cmd_serve without starting a server
    argv = ["serve", "--model_path", "m.safetensors", "--protocol", "tcp",
            "--port", "7000"]
    import argparse
    # reuse main's parser by intercepting the dispatched fn
    called = {}
    orig = cli.cmd_serve
    cli.cmd_serve = lambda a: called.update(vars(a))
    try:
        cli.main(argv)
    finally:
        cli.cmd_serve = orig
    assert called["protocol"] == "tcp" and called["port"] == 7000


def test_multihost_loader_step_consistency():
    """Multi-host batch plan: every host gets the SAME number of steps
    and, at each step, a batch from the SAME length bucket (the sharded
    train step's make_array_from_process_local_data requires identical
    per-host shapes; unequal step counts hang the other hosts in the
    epoch's last collectives)."""
    from rvc_tpu.train.data import BUCKET_BOUNDARIES, DataLoader, RVCDataset, _bucket_of

    rng = np.random.default_rng(0)
    rows = [{"n_frames": int(rng.integers(40, 900))} for _ in range(137)]
    ds = RVCDataset(rows, 480)

    def plan(host_id):
        dl = DataLoader(ds, batch_size=4, num_hosts=2, host_id=host_id,
                        seed=7)
        dl.set_epoch(3)
        return dl._batches_indices()

    p0, p1 = plan(0), plan(1)
    assert len(p0) == len(p1) and len(p0) > 0
    for g0, g1 in zip(p0, p1):
        assert len(g0) == len(g1) == 4  # only full batches
        b0 = _bucket_of(max(rows[i]["n_frames"] for i in g0))
        b1 = _bucket_of(max(rows[i]["n_frames"] for i in g1))
        assert b0 == b1  # same padded shape on both hosts
    # no row is used twice in one epoch across hosts
    used = [i for g in p0 + p1 for i in g]
    assert len(used) == len(set(used))
