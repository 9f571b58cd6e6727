"""Full RMVPE audio->f0 path parity vs the reference torch predictor
(`rvc/lib/predictors/RMVPE.py:420`): same random E2E weights loaded into
both stacks, compare the final f0 curve — covers the mel frontend
(center pad, htk mel, log clamp), the %32 reflect frame padding, the
net forward, and the local-average-cents decode together."""

import sys
import types

import numpy as np
import pytest
import torch

pytestmark = [pytest.mark.parity, pytest.mark.slow]


@pytest.fixture(scope="module")
def predictors(tmp_path_factory):
    import importlib.machinery as mach

    import importlib

    stft_ops = importlib.import_module("rvc_tpu.ops.stft")

    lib = types.ModuleType("librosa")
    lib.__spec__ = mach.ModuleSpec("librosa", None)
    filt = types.ModuleType("librosa.filters")
    filt.__spec__ = mach.ModuleSpec("librosa.filters", None)
    filt.mel = lambda *, sr, n_fft, n_mels, fmin=0.0, fmax=None, htk=False: (
        stft_ops.mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk=htk))
    lib.filters = filt
    sys.modules.setdefault("librosa", lib)
    sys.modules.setdefault("librosa.filters", filt)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from rvc.lib.predictors.RMVPE import E2E as TorchE2E, RMVPE0Predictor

    from rvc_tpu.models.rmvpe import RMVPE
    from rvc_tpu.utils.weights import convert_rmvpe_state_dict

    torch.manual_seed(3)
    te2e = TorchE2E(4, 1, (2, 2)).eval()
    ckpt = str(tmp_path_factory.mktemp("w") / "rmvpe_rand.pt")
    torch.save(te2e.state_dict(), ckpt)
    tpred = RMVPE0Predictor(ckpt, device="cpu")

    params, stats = convert_rmvpe_state_dict(
        {k: v.numpy() for k, v in te2e.state_dict().items()})
    ours = RMVPE(params=params, batch_stats=stats)
    return tpred, ours


def test_rmvpe_audio_to_f0_parity(predictors, voiced_unvoiced_wave):
    tpred, ours = predictors
    y, sr = voiced_unvoiced_wave

    ref = np.asarray(tpred.infer_from_audio(y, thred=0.03))
    out = np.asarray(ours.infer_from_audio(y, thred=0.03))
    n = min(len(ref), len(out))
    assert abs(len(ref) - len(out)) <= 1

    # voiced/unvoiced decisions must agree nearly everywhere, and voiced
    # f0 values must match to sub-cent precision
    vr, vo = ref[:n] > 0, out[:n] > 0
    agree = (vr == vo).mean()
    assert agree > 0.98, f"voiced agreement {agree:.3f}"
    both = vr & vo
    if both.sum():
        rel = np.abs(out[:n][both] - ref[:n][both]) / ref[:n][both]
        assert np.median(rel) < 1e-3
        assert rel.max() < 0.05
