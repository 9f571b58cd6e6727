"""Training feature extraction.

Capability parity with `rvc_mlx/preprocess/feature_extractor.py` /
`rvc/train/extract/extract.py`: per sliced 16 kHz segment — f0 (RMVPE by
default, any facade method), coarse 1..255 quantization, HuBERT 768-d
hidden states, and the precomputed linear spectrogram from the
target-rate audio. Runs batched/jitted on the chip; file-level
parallelism comes free from batching instead of thread pools.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.configs import RVCConfig
from rvc_tpu.ops.stft import spectrogram
from rvc_tpu.pipelines.offline import coarse_f0
from rvc_tpu.pitch import PitchExtractor
from rvc_tpu.utils import audio as audio_utils


class FeatureExtractor:
    def __init__(
        self,
        exp_dir: str,
        cfg: RVCConfig,
        hubert=None,
        hubert_variables=None,
        f0_method: str = "rmvpe",
        f0_hop_length: int = 160,
        hubert_path: Optional[str] = None,
    ):
        self.exp_dir = exp_dir
        self.cfg = cfg
        self.dirs = {
            "f0": os.path.join(exp_dir, "f0"),
            "f0_voiced": os.path.join(exp_dir, "f0_voiced"),
            "features": os.path.join(exp_dir, "features"),
            "spec": os.path.join(exp_dir, "spec"),
        }
        for d in self.dirs.values():
            os.makedirs(d, exist_ok=True)
        self.pitch = PitchExtractor(f0_method, crepe_hop=f0_hop_length)
        if hubert is None:
            from rvc_tpu.models.hubert import HubertConfig, HubertModel

            hubert = HubertModel(HubertConfig())
            if hubert_path and os.path.exists(hubert_path):
                from rvc_tpu.utils import weights as W
                from rvc_tpu.utils.init_utils import to_default_device

                if hubert_path.endswith(".safetensors"):
                    hp = W.load_params(hubert_path)
                else:
                    sd = W.load_torch_checkpoint(hubert_path)
                    sd.pop("__meta__", None)
                    hp = W.convert_hubert_state_dict(sd)
                # commit to device once — numpy leaves re-upload the
                # whole tree on every jitted call (CLAUDE.md)
                hubert_variables = to_default_device({"params": hp})
            else:
                hubert_variables = hubert.init(jax.random.PRNGKey(0),
                                               jnp.zeros((1, 1600)))
        self.hubert = hubert
        self.hubert_variables = hubert_variables
        self._hubert_jit = jax.jit(
            lambda v, a: self.hubert.apply(v, a, output_hidden_states=True))
        self._spec_jit = jax.jit(
            lambda a: spectrogram(a, cfg.data.filter_length,
                                  cfg.data.hop_length, cfg.data.win_length))

    def process_pair(self, name: str, wav16k_path: str, gt_wav_path: str) -> dict:
        """Extract all features for one sliced segment; returns paths."""
        a16 = audio_utils.load_audio(wav16k_path, 16000)
        f0 = self.pitch.extract(a16)
        f0c = coarse_f0(f0)
        feats = np.asarray(
            self._hubert_jit(self.hubert_variables, jnp.asarray(a16)[None])[0])

        gt, sr = audio_utils.load_wav(gt_wav_path)
        gt = audio_utils.to_mono(gt)
        spec = np.asarray(self._spec_jit(jnp.asarray(gt)[None])[0])  # (T, F)

        out = {
            "f0": os.path.join(self.dirs["f0"], name + ".npy"),
            "f0_voiced": os.path.join(self.dirs["f0_voiced"], name + ".npy"),
            "features": os.path.join(self.dirs["features"], name + ".npy"),
            "spec": os.path.join(self.dirs["spec"], name + ".npy"),
        }
        np.save(out["f0"], f0c)
        np.save(out["f0_voiced"], f0.astype(np.float32))
        np.save(out["features"], feats.astype(np.float32))
        np.save(out["spec"], spec.astype(np.float32))
        return out

    def _save(self, name: str, f0: np.ndarray, feats: np.ndarray,
              spec: np.ndarray) -> None:
        np.save(os.path.join(self.dirs["f0"], name + ".npy"), coarse_f0(f0))
        np.save(os.path.join(self.dirs["f0_voiced"], name + ".npy"),
                f0.astype(np.float32))
        np.save(os.path.join(self.dirs["features"], name + ".npy"),
                feats.astype(np.float32))
        np.save(os.path.join(self.dirs["spec"], name + ".npy"),
                spec.astype(np.float32))

    def process_batch(self, names, a16s, gts) -> None:
        """Extract one SAME-LENGTH group in a single device dispatch each
        for HuBERT / RMVPE / spectrogram. The TPU-native equivalent of
        the reference's multi-GPU thread fan-out
        (`rvc/train/extract/extract.py:101-160`): identical-shape
        segments (the slicer cuts uniform ~3.7 s chunks) batch into one
        jitted call with bit-identical per-file results."""
        a = jnp.asarray(np.stack(a16s))
        feats = np.asarray(self._hubert_jit(self.hubert_variables, a))
        if self.pitch.method == "rmvpe":
            f0 = np.asarray(self.pitch._model.infer_from_audio(a, thred=0.03))
            f0 = np.where((f0 >= 50.0) & (f0 <= 1100.0), f0, 0.0)
        else:
            f0 = np.stack([self.pitch.extract(x) for x in a16s])
        spec = np.asarray(self._spec_jit(jnp.asarray(np.stack(gts))))
        for i, name in enumerate(names):
            self._save(name, f0[i], feats[i], spec[i])

    def process_all(self, batch_size: int = 8,
                    cpu_cores: Optional[int] = None) -> int:
        w16 = os.path.join(self.exp_dir, "sliced_audios_16k")
        gt = os.path.join(self.exp_dir, "sliced_audios")
        files = [f for f in sorted(os.listdir(w16)) if f.endswith(".wav")]

        # group by exact 16k length: same-shape segments batch losslessly
        # (no padding, no attention-mask approximation). cpu_cores
        # parallelizes the host-side decode/resample (the reference fans
        # the whole extraction out per core, `extract.py:101-160`; here
        # the models batch on-device so only audio IO is CPU-bound).
        def _load(f):
            return audio_utils.load_audio(os.path.join(w16, f), 16000)

        if cpu_cores and cpu_cores > 1 and len(files) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=cpu_cores) as ex:
                audios = list(ex.map(_load, files))
        else:
            audios = [_load(f) for f in files]
        groups: dict = {}
        for f, a16 in zip(files, audios):
            groups.setdefault(len(a16), []).append((os.path.splitext(f)[0], a16, f))

        n = 0
        for _, items in sorted(groups.items()):
            for j in range(0, len(items), max(batch_size, 1)):
                chunk = items[j : j + max(batch_size, 1)]
                gts = []
                for name, _, f in chunk:
                    g, _sr = audio_utils.load_wav(os.path.join(gt, f))
                    gts.append(audio_utils.to_mono(g))
                if len(chunk) > 1 and len({len(g) for g in gts}) == 1:
                    self.process_batch([c[0] for c in chunk],
                                       [c[1] for c in chunk], gts)
                    n += len(chunk)
                else:
                    for name, _, f in chunk:
                        self.process_pair(name, os.path.join(w16, f),
                                          os.path.join(gt, f))
                        n += 1
        return n
