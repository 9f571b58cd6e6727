"""Top-level inference API.

Capability parity with `RVC_MLX` (`rvc_mlx/infer/infer_mlx.py:106`) and
`VoiceConverter` (`rvc/infer/infer.py:41`): load a voice model (native
safetensors or upstream torch .pth, converted on the fly), wire up
HuBERT + pitch extraction + retrieval, and convert audio files or arrays.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.configs import RVCConfig, get_config, config_from_dict
from rvc_tpu.models.hubert import HubertConfig, HubertModel
from rvc_tpu.models.synthesizer import build_synthesizer
from rvc_tpu.pipelines.offline import Pipeline
from rvc_tpu.pitch import PitchExtractor
from rvc_tpu.retrieval import read_faiss_index
from rvc_tpu.utils import audio as audio_utils
from rvc_tpu.utils import weights as W


# Upstream .pth inference checkpoints carry an 18-element config list
# (`rvc/train/process/extract_model.py`): [spec_channels, segment_size,
# inter, hidden, filter, heads, layers, kernel, p_dropout, resblock,
# resblock_kernel_sizes, resblock_dilation_sizes, upsample_rates,
# upsample_initial_channel, upsample_kernel_sizes, spk_embed_dim,
# gin_channels, sr]
def config_from_pth_list(lst, use_f0: bool = True) -> RVCConfig:
    sr = lst[17]
    if isinstance(sr, str):  # some checkpoints store "48k"
        sr = {"32k": 32000, "40k": 40000, "48k": 48000}[sr]
    cfg = get_config(sr)
    return config_from_dict({
        "data": {"sample_rate": sr,
                 "filter_length": (lst[0] - 1) * 2,
                 "hop_length": cfg.data.hop_length,
                 "win_length": cfg.data.win_length,
                 "n_mel_channels": cfg.data.n_mel_channels},
        "model": {"inter_channels": lst[2], "hidden_channels": lst[3],
                  "filter_channels": lst[4], "n_heads": lst[5],
                  "n_layers": lst[6], "kernel_size": lst[7],
                  "p_dropout": lst[8],
                  "resblock": str(lst[9]),
                  "resblock_kernel_sizes": lst[10],
                  "resblock_dilation_sizes": lst[11],
                  "upsample_rates": lst[12],
                  "upsample_initial_channel": lst[13],
                  "upsample_kernel_sizes": lst[14],
                  "spk_embed_dim": lst[15], "gin_channels": lst[16],
                  "use_f0": use_f0},
        "train": {"segment_size": lst[1] if lst[1] > 100 else lst[1] * cfg.data.hop_length},
    })


class RVC:
    """``RVC(model_path).infer_file(in_wav, out_wav, ...)``.

    model_path may be a native .safetensors (with .json sidecar) or an
    upstream torch .pth inference checkpoint. With model_path=None a
    random-initialized model is built from `config` (benchmarks, tests).
    """

    def __init__(
        self,
        model_path: Optional[str] = None,
        config: Optional[RVCConfig] = None,
        hubert_path: Optional[str] = None,
        index_path: Optional[str] = None,
        seed: int = 0,
        embedder_model: str = "contentvec",
        embedder_model_custom: Optional[str] = None,
    ):
        self.cfg, synth_params = self._load_model(model_path, config, seed)
        if hubert_path is None:
            # named embedder selection (reference `rvc_cli.py:765-775`)
            from rvc_tpu.utils.embedders import resolve_embedder

            hubert_path = resolve_embedder(embedder_model,
                                           embedder_model_custom)
        self.synthesizer = build_synthesizer(self.cfg)

        self.hubert = HubertModel(HubertConfig())
        if hubert_path and os.path.exists(hubert_path):
            if hubert_path.endswith(".safetensors"):
                hp = W.load_params(hubert_path)
            else:
                sd = W.load_torch_checkpoint(hubert_path)
                sd.pop("__meta__", None)
                hp = W.convert_hubert_state_dict(sd)
            hubert_vars = {"params": hp}
        else:
            from rvc_tpu.utils.init_utils import init_on_cpu

            hubert_vars = init_on_cpu(
                self.hubert.init, jax.random.PRNGKey(seed + 1),
                jnp.zeros((1, 1600)))

        self.index = None
        if index_path and os.path.exists(index_path):
            self.index = read_faiss_index(index_path)

        self.pipeline = Pipeline(
            tgt_sr=self.cfg.data.sample_rate,
            synthesizer=self.synthesizer,
            synth_variables={"params": synth_params},
            hubert=self.hubert,
            hubert_variables=hubert_vars,
        )

    # ------------------------------------------------------------------
    def _load_model(self, model_path, config, seed):
        if model_path and not os.path.exists(model_path):
            # never fall through to random init on a typo'd path — that
            # silently "converts" with untrained weights
            raise FileNotFoundError(f"model checkpoint not found: {model_path}")
        if model_path and model_path.endswith(".safetensors") and os.path.exists(model_path):
            params = W.load_params(model_path)
            sidecar = os.path.splitext(model_path)[0] + ".json"
            if config is None and os.path.exists(sidecar):
                with open(sidecar) as f:
                    config = config_from_dict(json.load(f))
            return config or get_config(48000), params
        if model_path and model_path.endswith(".pth") and os.path.exists(model_path):
            sd = W.load_torch_checkpoint(model_path)
            meta = sd.pop("__meta__", {})
            if config is None and "config" in meta:
                config = config_from_pth_list(
                    list(meta["config"]), use_f0=bool(meta.get("f0", 1)))
            config = config or get_config(48000)
            params = W.convert_synthesizer_state_dict(sd)
            return config, params
        if model_path:
            raise ValueError(
                f"unsupported model format {os.path.splitext(model_path)[1]!r} "
                "(expected .safetensors or .pth)")
        # random init (on the CPU backend: init is a one-off, not worth a
        # device compile)
        from rvc_tpu.utils.init_utils import cpu_backend

        config = config or get_config(48000)
        net = build_synthesizer(config)
        T = max(config.segment_frames + 4, 40)
        ks = jax.random.split(jax.random.PRNGKey(seed), 4)
        with cpu_backend():
            variables = net.init(
                {"params": ks[0], "noise": ks[1]},
                jnp.zeros((1, T, config.model.text_enc_hidden_dim)),
                jnp.array([T]),
                jnp.zeros((1, T), dtype=jnp.int32),
                jnp.full((1, T), 200.0),
                jnp.zeros((1, T, config.data.spec_channels)),
                jnp.array([T]),
                jnp.array([0]),
                rng=ks[2],
            )
        from rvc_tpu.utils.init_utils import to_default_device

        return config, to_default_device(variables["params"])

    # ------------------------------------------------------------------
    def infer(
        self,
        audio_16k: np.ndarray,
        sid: int = 0,
        pitch: float = 0.0,
        f0_method: str = "rmvpe",
        index_rate: float = 0.75,
        volume_envelope: float = 1.0,
        protect: float = 0.5,
        f0_autotune: bool = False,
        f0_autotune_strength: float = 1.0,
        pitch_guidance: bool = True,
        input_f0: Optional[np.ndarray] = None,
        proposed_pitch: bool = False,
        proposed_pitch_threshold: float = 155.0,
        split_audio: bool = False,
        clean_audio: bool = False,
        clean_strength: float = 0.5,
        formant_shifting: bool = False,
        formant_qfrency: float = 1.0,
        formant_timbre: float = 1.0,
        post_process: bool = False,
        f0_hop_length: int = 160,
        **fx_kwargs,
    ) -> np.ndarray:
        """16 kHz mono float array -> converted audio at the model's sr.

        Full VoiceConverter surface (`rvc/infer/infer.py:193-218`):
        silence-splitting, formant shift, noise reduction, post-FX.
        """
        audio_16k = np.asarray(audio_16k, dtype=np.float32)
        if formant_shifting and formant_timbre != 1.0:
            from rvc_tpu.utils.formant import formant_shift

            audio_16k = formant_shift(audio_16k, 16000,
                                      formant_qfrency, formant_timbre)

        def convert(a):
            return self.pipeline.pipeline(
                a, sid=sid, pitch_shift=pitch, f0_method=f0_method,
                index=self.index, index_rate=index_rate if self.index else 0.0,
                pitch_guidance=pitch_guidance and self.cfg.model.use_f0,
                volume_envelope=volume_envelope, protect=protect,
                f0_autotune=f0_autotune,
                f0_autotune_strength=f0_autotune_strength,
                input_f0=input_f0,
                proposed_pitch=proposed_pitch,
                proposed_pitch_threshold=proposed_pitch_threshold,
                f0_hop_length=f0_hop_length,
            )

        if split_audio:
            from rvc_tpu.utils.split_audio import merge_audio, split_silence_nonsilent

            intervals, segs = split_silence_nonsilent(audio_16k, 16000)
            converted = [convert(s) for s in segs]
            out = merge_audio(intervals, converted, len(audio_16k),
                              16000, self.cfg.data.sample_rate)
        else:
            out = convert(audio_16k)

        if clean_audio:
            from rvc_tpu.utils.noise import reduce_noise

            out = reduce_noise(out, self.cfg.data.sample_rate, clean_strength)
        if post_process:
            from rvc_tpu.realtime.fx import build_fx_chain

            out = build_fx_chain(**fx_kwargs)(out, self.cfg.data.sample_rate)
        return out

    def infer_file(self, audio_input: str, audio_output: str,
                   export_format: str = "WAV", **kwargs) -> str:
        audio = audio_utils.load_audio(audio_input, 16000)
        out = self.infer(audio, **kwargs)
        if export_format.upper() != "WAV":
            # encode via soundfile or the ffmpeg binary (the reference
            # converts with ffmpeg, `rvc/infer/infer.py:320-338`); when
            # neither exists, FAIL rather than silently writing a
            # different format than the user asked for
            return audio_utils.encode_audio(
                out, self.cfg.data.sample_rate,
                os.path.splitext(audio_output)[0], export_format)
        audio_utils.save_wav(audio_output, out, self.cfg.data.sample_rate)
        return audio_output
