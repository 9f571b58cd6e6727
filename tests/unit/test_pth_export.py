""".pth export interop: our trained params -> reference-format
checkpoint -> loadable by BOTH our own loader and the reference torch
Synthesizer with strict=True (VERDICT round-1 item 8; format spec
`rvc/train/process/extract_model.py:27-100`)."""

import os
import sys
import types

import numpy as np
import pytest
import jax

from rvc_tpu.configs import get_config


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    from rvc_tpu.api import RVC
    from rvc_tpu.utils.weights import export_pth

    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=2,
                     model_upsample_initial_channel=64)
    rvc = RVC(config=cfg, seed=11)
    params = jax.device_get(rvc.pipeline.synth_variables["params"])
    params = {k: v for k, v in params.items() if k != "enc_q"}
    path = str(tmp_path_factory.mktemp("pth") / "model.pth")
    export_pth(params, cfg, path, name="tiny", epoch=3, step=42)
    return cfg, params, path


def test_pth_roundtrip_through_own_loader(exported):
    """export -> load_torch_checkpoint -> convert == original tree
    (fp16 storage tolerance)."""
    from rvc_tpu.utils.weights import (
        convert_synthesizer_state_dict, load_torch_checkpoint)

    cfg, params, path = exported
    sd = load_torch_checkpoint(path)
    meta = sd.pop("__meta__")
    assert meta["epoch"] == 3 and meta["step"] == 42
    assert meta["config"][-1] == 32000 and len(meta["config"]) == 18
    assert meta["vocoder"] == "HiFi-GAN" and meta["model_hash"]

    tree = convert_synthesizer_state_dict(sd)
    flat_orig = _flat(params)
    flat_back = _flat(tree)
    assert set(flat_back) == set(flat_orig)
    for k, v in flat_orig.items():
        np.testing.assert_allclose(
            flat_back[k], np.asarray(v, dtype=np.float32),
            atol=2e-3, rtol=2e-3, err_msg=k)


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flat(v, p))
        else:
            out[p] = np.asarray(v)
    return out


@pytest.mark.slow
@pytest.mark.parity
def test_pth_strict_loads_into_reference_synthesizer(exported):
    """The exported state dict must match the reference torch module's
    key set EXACTLY (strict=True) and produce the same waveform through
    torch as our synthesizer does — full ecosystem interop."""
    import importlib.machinery as mach

    import torch

    ta = types.ModuleType("torchaudio")
    ta.__spec__ = mach.ModuleSpec("torchaudio", None)
    sys.modules.setdefault("torchaudio", ta)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from rvc.lib.algorithm.synthesizers import Synthesizer as TorchSynth

    cfg, params, path = exported
    cpt = torch.load(path, map_location="cpu", weights_only=True)
    config = list(cpt["config"])
    t = TorchSynth(*config, use_f0=True, vocoder=cpt["vocoder"],
                   text_enc_hidden_dim=768).eval()
    # enc_q is stripped at export (the reference does the same); drop it
    # from the module before the strict comparison
    t.enc_q = None
    missing, unexpected = t.load_state_dict(
        {k: v.float() for k, v in cpt["weight"].items()}, strict=True)
    assert not missing and not unexpected

    # waveform parity through the torch stack
    from rvc_tpu.api import RVC

    rvc = RVC(config=cfg, seed=11)
    T = 40
    rng = np.random.default_rng(5)
    phone = rng.standard_normal((1, T, 768)).astype(np.float32)
    pitch = rng.integers(1, 255, (1, T)).astype(np.int64)
    pitchf = np.full((1, T), 180.0, np.float32)

    import jax.numpy as jnp

    ours, _ = rvc.synthesizer.apply(
        rvc.pipeline.synth_variables, jnp.asarray(phone), jnp.array([T]),
        jnp.asarray(pitch.astype(np.int32)), jnp.asarray(pitchf),
        jnp.array([0]), method=rvc.synthesizer.infer)
    orig_randn = torch.randn_like
    torch.randn_like = lambda x, **kw: torch.zeros_like(x)
    try:
        with torch.no_grad():
            theirs, _, _ = t.infer(
                torch.from_numpy(phone), torch.tensor([T]),
                torch.from_numpy(pitch), torch.from_numpy(pitchf),
                torch.tensor([0]))
    finally:
        torch.randn_like = orig_randn
    a = np.asarray(ours)[0, :, 0]
    b = theirs[0, 0].numpy()
    n = min(len(a), len(b))
    corr = np.corrcoef(a[:n], b[:n])[0, 1]
    assert corr > 0.99, f"waveform corr {corr}"
    np.testing.assert_allclose(a[:n], b[:n], atol=0.05)
