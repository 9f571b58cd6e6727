"""New reference-CLI surfaces: named embedder selection
(`rvc_cli.py:765-775`) and the crepe `--hop_length` analysis hop."""

import os

import numpy as np
import pytest

from rvc_tpu.utils.embedders import resolve_embedder


class TestResolveEmbedder:
    def test_contentvec_absent_returns_none(self, tmp_path, monkeypatch):
        monkeypatch.setenv("RVC_TPU_MODELS_DIR", str(tmp_path))
        assert resolve_embedder("contentvec") is None

    def test_named_absent_raises(self, tmp_path, monkeypatch):
        monkeypatch.setenv("RVC_TPU_MODELS_DIR", str(tmp_path))
        with pytest.raises(FileNotFoundError, match="chinese-hubert-base"):
            resolve_embedder("chinese-hubert-base")

    def test_named_found(self, tmp_path, monkeypatch):
        monkeypatch.setenv("RVC_TPU_MODELS_DIR", str(tmp_path))
        d = tmp_path / "embedders" / "japanese-hubert-base"
        d.mkdir(parents=True)
        p = d / "pytorch_model.bin"
        p.write_bytes(b"x")
        assert resolve_embedder("japanese-hubert-base") == str(p)

    def test_custom_requires_path(self):
        with pytest.raises(ValueError, match="custom"):
            resolve_embedder("custom")

    def test_custom_path(self, tmp_path):
        p = tmp_path / "mine.safetensors"
        p.write_bytes(b"x")
        assert resolve_embedder("custom", str(p)) == str(p)

    def test_unknown_name(self):
        with pytest.raises(ValueError, match="unknown"):
            resolve_embedder("wavlm")


class TestCrepeHop:
    def test_hop_resamples_to_standard_grid(self):
        from rvc_tpu.models.crepe import CREPE

        rng = np.random.default_rng(0)
        t = np.arange(16000 * 2) / 16000
        audio = (0.5 * np.sin(2 * np.pi * 220 * t)
                 + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        m = CREPE("tiny")
        f0_160 = m.get_f0(audio, hop=160)
        f0_128 = m.get_f0(audio, hop=128)
        # both land on the pipeline's 10 ms frame grid
        assert len(f0_128) == len(f0_160)
        # random weights give arbitrary pitch values, but the resampled
        # track must be finite and in-range or zero
        assert np.isfinite(f0_128).all()

    def test_extractor_threads_hop(self):
        from rvc_tpu.pitch import PitchExtractor

        ex = PitchExtractor("crepe-tiny", crepe_hop=128)
        assert ex.crepe_hop == 128
        audio = np.sin(2 * np.pi * 220 * np.arange(8000) / 16000).astype(np.float32)
        f0 = ex.extract(audio)
        assert len(f0) == 8000 // 160 + 1


def test_cli_parses_new_flags():
    """The reference flag set parses; no handler invoked."""
    import argparse

    from rvc_tpu.cli import main  # noqa: F401  (import = parser builds)
    from rvc_tpu import cli

    parser = argparse.ArgumentParser()
    cli._add_infer_args(parser)
    a = parser.parse_args([
        "--input_path", "a.wav", "--output_path", "b.wav",
        "--model_path", "m.pth", "--embedder_model", "korean-hubert-base",
        "--hop_length", "128"])
    assert a.embedder_model == "korean-hubert-base"
    assert a.hop_length == 128
