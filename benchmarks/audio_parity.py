#!/usr/bin/env python3
"""End-to-end audio-parity benchmark: torch oracle vs rvc_tpu.

The TPU-native analog of the reference's acceptance harness
(`/root/reference/benchmarks/benchmark_audio_parity.py:1-441`): run the
COMPLETE conversion pipeline twice — once through the reference's torch
models (HF HuBERT + torch RMVPE + torch Synthesizer, composed with the
reference pipeline math) and once through `rvc_tpu.api.RVC` — on the
same clip with the same weights, then score waveform correlation,
log-mel spectrogram correlation (the perceptual metric, pass bar
spec_corr > 0.95 per `benchmark_audio_parity.py:438-441`), RMS ratio,
and wall-clock.

Two modes:

* **random-oracle** (default, no weights needed): build random-init
  torch models, convert them with `rvc_tpu.utils.weights`, and compare
  the two stacks end to end.  This validates every piece of pipeline
  plumbing — filters, padding, f0 decode, upsample/protect, trim,
  normalize — on full-size model shapes.
* **real-checkpoint** (one flag away): point `--model_path` at a real
  .pth (plus `--hubert_path`/`--rmvpe_path` for the frontends) and the
  same comparison runs against the real weights, reproducing the
  reference's published 0.986 spec-corr experiment.

Examples:
    python benchmarks/audio_parity.py --device cpu --small --runs 1
    python benchmarks/audio_parity.py --model_path model.pth \
        --hubert_path hubert_base.pt --rmvpe_path rmvpe.pt
"""

from __future__ import annotations

import argparse
import importlib
import importlib.machinery as _mach
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
REFERENCE = "/root/reference"
FIXTURE_AUDIO = os.path.join(REFERENCE, "ios_test_data", "input_audio.npy")

SR16 = 16000
WINDOW = 160


# ---------------------------------------------------------------------------
def _stub_librosa():
    """The reference torch RMVPE imports `librosa.filters.mel`; serve it
    from our own filterbank so the oracle runs without librosa."""
    if "librosa" in sys.modules:
        return
    stft_ops = importlib.import_module("rvc_tpu.ops.stft")
    lib = types.ModuleType("librosa")
    lib.__spec__ = _mach.ModuleSpec("librosa", None)
    filt = types.ModuleType("librosa.filters")
    filt.__spec__ = _mach.ModuleSpec("librosa.filters", None)
    filt.mel = lambda *, sr, n_fft, n_mels, fmin, fmax, htk=False: np.asarray(
        stft_ops.mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk=htk))
    lib.filters = filt
    sys.modules["librosa"] = lib
    sys.modules["librosa.filters"] = filt


def load_audio_16k(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    from rvc_tpu.utils.audio import load_audio

    return load_audio(path, SR16)


# ---------------------------------------------------------------------------
# torch oracle: the reference pipeline math end to end
# (`rvc_mlx/infer/pipeline_mlx.py:263-371` / `rvc/infer/pipeline.py:390-545`)
class TorchOracle:
    def __init__(self, synth, hubert, rmvpe_predictor, tgt_sr: int,
                 x_pad: int = 1):
        self.synth = synth
        self.hubert = hubert
        self.rmvpe = rmvpe_predictor
        self.tgt_sr = tgt_sr
        self.t_pad = SR16 * x_pad
        self.t_pad_tgt = tgt_sr * x_pad

    def convert(self, audio_16k: np.ndarray, pitch_shift: float = 0.0,
                protect: float = 0.5, sid: int = 0) -> np.ndarray:
        import torch

        from rvc_tpu.pipelines.offline import F0_MAX, F0_MIN, coarse_f0
        from rvc_tpu.utils.audio import highpass_filter, peak_normalize

        audio = highpass_filter(audio_16k, SR16, 48.0, 5)
        audio_pad = np.pad(audio, (self.t_pad, self.t_pad), mode="reflect")
        p_len = len(audio_pad) // WINDOW

        f0 = np.asarray(self.rmvpe.infer_from_audio(audio_pad, thred=0.03),
                        dtype=np.float32)
        f0 = np.where((f0 >= F0_MIN) & (f0 <= F0_MAX), f0, 0.0)
        f0 = f0 * 2.0 ** (pitch_shift / 12.0)
        f0 = np.pad(f0, (0, max(0, p_len - len(f0))))[:p_len]
        pitch = coarse_f0(f0)

        with torch.no_grad():
            feats = self.hubert(
                torch.from_numpy(audio_pad)[None]).last_hidden_state
            B, L, C = feats.shape
            feats_raw = feats
            # 2x nearest-neighbor upsample (`pipeline_mlx.py:210-213`)
            up = feats[:, :, None, :].expand(B, L, 2, C).reshape(B, L * 2, C)
            n = min(p_len, up.shape[1])
            up = up[:, :n]
            if protect < 0.5:
                raw_up = feats_raw[:, :, None, :].expand(B, L, 2, C)
                raw_up = raw_up.reshape(B, L * 2, C)[:, :n]
                pff = torch.from_numpy(
                    np.where(f0[:n] > 0, 1.0, protect).astype(np.float32))
                up = up * pff[None, :, None] + raw_up * (1 - pff[None, :, None])
            pt = torch.from_numpy(pitch[:n].astype(np.int64))[None]
            pf = torch.from_numpy(f0[:n].astype(np.float32))[None]
            o, _, _ = self.synth.infer(up, torch.tensor([n]), pt, pf,
                                       torch.tensor([sid]))
        out = o[0, 0].numpy()
        out = out[self.t_pad_tgt : len(out) - self.t_pad_tgt]
        return peak_normalize(out, 0.99)


# ---------------------------------------------------------------------------
def build_random_oracle(args):
    """Random-init torch models + the converted rvc_tpu twin."""
    import torch

    _stub_librosa()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    ta = types.ModuleType("torchaudio")
    ta.__spec__ = _mach.ModuleSpec("torchaudio", None)
    sys.modules.setdefault("torchaudio", ta)
    from transformers import HubertConfig as HFConfig, HubertModel as HFHubert

    from rvc.lib.algorithm.synthesizers import Synthesizer as TorchSynth
    from rvc.lib.predictors.RMVPE import E2E as TorchE2E, RMVPE0Predictor

    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config
    from rvc_tpu.models.hubert import HubertConfig, HubertModel
    from rvc_tpu.models.rmvpe import RMVPE
    from rvc_tpu.pitch import PitchExtractor
    from rvc_tpu.utils.weights import (
        convert_hubert_state_dict,
        convert_rmvpe_state_dict,
        convert_synthesizer_state_dict,
    )

    torch.manual_seed(args.seed)
    sr = args.sample_rate
    base = get_config(sr)
    if args.small:
        hf_cfg = HFConfig(hidden_size=96, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=192,
                          conv_dim=[48] * 7,
                          conv_kernel=[10, 3, 3, 3, 3, 2, 2],
                          conv_stride=[5, 2, 2, 2, 2, 2, 2],
                          num_conv_pos_embeddings=128,
                          num_conv_pos_embedding_groups=16,
                          do_stable_layer_norm=False,
                          feat_extract_norm="group")
        cfg = get_config(sr, model_spk_embed_dim=4, model_n_layers=2,
                         model_upsample_initial_channel=128,
                         model_text_enc_hidden_dim=96)
        ours_hubert = HubertModel(HubertConfig(
            hidden_size=96, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=192, conv_dim=48))
    else:
        hf_cfg = HFConfig()  # hubert-base: 768d, 12 layers
        cfg = get_config(sr, model_spk_embed_dim=109)
        ours_hubert = HubertModel(HubertConfig())

    t_hubert = HFHubert(hf_cfg).eval()
    m = cfg.model
    t_synth = TorchSynth(
        cfg.data.spec_channels, cfg.train.segment_size // cfg.data.hop_length,
        m.inter_channels, m.hidden_channels, m.filter_channels, m.n_heads,
        m.n_layers, m.kernel_size, 0, m.resblock,
        list(m.resblock_kernel_sizes), [list(d) for d in m.resblock_dilation_sizes],
        list(m.upsample_rates), m.upsample_initial_channel,
        list(m.upsample_kernel_sizes), m.spk_embed_dim, m.gin_channels, sr,
        True, vocoder=m.vocoder, text_enc_hidden_dim=m.text_enc_hidden_dim,
    ).eval()
    t_e2e = TorchE2E(4, 1, (2, 2)).eval()
    import tempfile

    ck = os.path.join(tempfile.mkdtemp(prefix="rvc_parity_"), "rmvpe_rand.pt")
    torch.save(t_e2e.state_dict(), ck)
    t_rmvpe = RMVPE0Predictor(ck, device="cpu")

    rvc = RVC(config=cfg, seed=args.seed)
    rvc.hubert = ours_hubert
    rvc.pipeline.hubert = ours_hubert
    rvc.pipeline.hubert_variables = {"params": convert_hubert_state_dict(
        {k: v.numpy() for k, v in t_hubert.state_dict().items()})}
    rvc.pipeline.synth_variables = {"params": convert_synthesizer_state_dict(
        {k: v.numpy() for k, v in t_synth.state_dict().items()})}
    import jax

    rvc.pipeline._hubert_jit = jax.jit(
        lambda v, a: rvc.hubert.apply(v, a, output_hidden_states=True))
    params, stats = convert_rmvpe_state_dict(
        {k: v.numpy() for k, v in t_e2e.state_dict().items()})
    rvc.pipeline.pitch_extractor = PitchExtractor(
        "rmvpe", model=RMVPE(params=params, batch_stats=stats))

    oracle = TorchOracle(t_synth, t_hubert, t_rmvpe, cfg.data.sample_rate)
    return oracle, rvc


def build_real_oracle(args):
    """Real checkpoints on both sides (the reference's own experiment)."""
    import torch

    _stub_librosa()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    ta = types.ModuleType("torchaudio")
    ta.__spec__ = _mach.ModuleSpec("torchaudio", None)
    sys.modules.setdefault("torchaudio", ta)
    from transformers import HubertModel as HFHubert

    from rvc.lib.algorithm.synthesizers import Synthesizer as TorchSynth
    from rvc.lib.predictors.RMVPE import RMVPE0Predictor

    from rvc_tpu.api import RVC

    cpt = torch.load(args.model_path, map_location="cpu", weights_only=True)
    config = list(cpt["config"])
    t_synth = TorchSynth(*config, use_f0=bool(cpt.get("f0", 1)),
                         vocoder=cpt.get("vocoder", "HiFi-GAN")).eval()
    t_synth.load_state_dict(cpt["weight"], strict=False)
    t_hubert = HFHubert.from_pretrained(args.hubert_path).eval() \
        if os.path.isdir(args.hubert_path) else None
    if t_hubert is None:
        raise SystemExit("--hubert_path must be a HF HubertModel directory "
                         "for the torch oracle")
    t_rmvpe = RMVPE0Predictor(args.rmvpe_path, device="cpu")

    rvc = RVC(model_path=args.model_path, hubert_path=args.hubert_path,
              index_path=args.index_path)
    if args.rmvpe_path:
        from rvc_tpu.models.rmvpe import RMVPE
        from rvc_tpu.pitch import PitchExtractor
        from rvc_tpu.utils.weights import (
            convert_rmvpe_state_dict, load_torch_checkpoint)

        sd = load_torch_checkpoint(args.rmvpe_path)
        sd.pop("__meta__", None)
        params, stats = convert_rmvpe_state_dict(sd)
        rvc.pipeline.pitch_extractor = PitchExtractor(
            "rmvpe", model=RMVPE(params=params, batch_stats=stats))
    oracle = TorchOracle(t_synth, t_hubert, t_rmvpe, config[-1])
    return oracle, rvc


# ---------------------------------------------------------------------------
def log_mel_db(wave: np.ndarray, sr: int, n_fft: int = 1024,
               hop: int = 256, n_mels: int = 80) -> np.ndarray:
    """librosa-equivalent power-mel in dB ref=max
    (`benchmark_audio_parity.py:400-420`) built on our own STFT ops."""
    import jax.numpy as jnp

    from rvc_tpu.ops.stft import mel_filterbank, stft

    z = stft(jnp.asarray(wave, dtype=jnp.float32)[None], n_fft, hop, n_fft,
             center=True)
    power = np.asarray(jnp.real(z) ** 2 + jnp.imag(z) ** 2)[0]  # (T, F)
    fb = np.asarray(mel_filterbank(sr, n_fft, n_mels, 0.0, sr / 2, htk=False))
    mel = power @ fb.T
    db = 10.0 * np.log10(np.maximum(mel, 1e-10))
    return np.maximum(db - db.max(), -80.0)


def compare(ours: np.ndarray, ref: np.ndarray, sr: int) -> dict:
    n = min(len(ours), len(ref))
    a, b = ours[:n].astype(np.float64), ref[:n].astype(np.float64)
    wave_corr = float(np.corrcoef(a, b)[0, 1])
    sa, sb = log_mel_db(a, sr), log_mel_db(b, sr)
    spec_corr = float(np.corrcoef(sa.ravel(), sb.ravel())[0, 1])
    rms_a = float(np.sqrt(np.mean(a**2)))
    rms_b = float(np.sqrt(np.mean(b**2)))
    return dict(
        wave_corr=wave_corr, spec_corr=spec_corr,
        rms_ratio=rms_a / max(rms_b, 1e-12),
        max_diff=float(np.abs(a - b).max()),
        rmse=float(np.sqrt(np.mean((a - b) ** 2))),
        length_delta=int(abs(len(ours) - len(ref))),
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--audio", default=FIXTURE_AUDIO,
                    help="input clip (.npy @16k or any wav)")
    ap.add_argument("--model_path", default=None,
                    help=".pth checkpoint; omit for random-oracle mode")
    ap.add_argument("--hubert_path", default=None)
    ap.add_argument("--rmvpe_path", default=None)
    ap.add_argument("--index_path", default=None)
    ap.add_argument("--pitch", type=float, default=0.0)
    ap.add_argument("--protect", type=float, default=0.5)
    ap.add_argument("--sid", type=int, default=0)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--seconds", type=float, default=None,
                    help="trim the clip to this many seconds")
    ap.add_argument("--sample_rate", type=int, default=48000,
                    choices=[32000, 40000, 48000])
    ap.add_argument("--small", action="store_true",
                    help="reduced model dims (fast CI run)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--device", choices=["cpu", "tpu"], default=None)
    ap.add_argument("--save_output", default=None,
                    help="prefix: writes <prefix>_{torch,tpu}.wav")
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args(argv)

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    audio = load_audio_16k(args.audio)
    if args.seconds:
        audio = audio[: int(args.seconds * SR16)]
    dur = len(audio) / SR16
    print(f"clip: {dur:.2f}s @16k  ({args.audio})")

    if args.model_path:
        oracle, rvc = build_real_oracle(args)
        mode = "real-checkpoint"
    else:
        oracle, rvc = build_random_oracle(args)
        mode = "random-oracle"
    tgt_sr = rvc.cfg.data.sample_rate
    print(f"mode: {mode}  target sr: {tgt_sr}")

    kw = dict(pitch_shift=args.pitch, protect=args.protect, sid=args.sid)

    t_times, ref_out = [], None
    for i in range(args.runs):
        t0 = time.perf_counter()
        ref_out = oracle.convert(audio, **kw)
        t_times.append(time.perf_counter() - t0)
        print(f"  torch run {i + 1}: {t_times[-1]:.3f}s")

    o_times, our_out = [], None
    for i in range(args.runs + 1):  # +1 warmup/compile run
        t0 = time.perf_counter()
        our_out = rvc.infer(audio, sid=args.sid, pitch=args.pitch,
                            protect=args.protect, index_rate=0.0,
                            f0_method="rmvpe")
        dt = time.perf_counter() - t0
        if i == 0:
            print(f"  rvc_tpu compile+run: {dt:.3f}s")
        else:
            o_times.append(dt)
            print(f"  rvc_tpu run {i}: {dt:.3f}s")

    if args.save_output:
        from rvc_tpu.utils.audio import save_wav

        save_wav(args.save_output + "_torch.wav", ref_out, tgt_sr)
        save_wav(args.save_output + "_tpu.wav", our_out, tgt_sr)

    m = compare(our_out, ref_out, tgt_sr)
    t_med, o_med = float(np.median(t_times)), float(np.median(o_times))
    result = dict(
        mode=mode, clip_seconds=round(dur, 3), target_sr=tgt_sr,
        torch_median_s=round(t_med, 4), rvc_tpu_median_s=round(o_med, 4),
        speedup=round(t_med / o_med, 2),
        realtime_factor=round(dur / o_med, 1), **{
            k: round(v, 6) if isinstance(v, float) else v for k, v in m.items()},
        verdict=("PERCEPTUALLY_IDENTICAL" if m["spec_corr"] > 0.95
                 else "EXACT_MATCH" if m["wave_corr"] > 0.95 else "FAIL"),
    )
    print("\n== audio parity ==")
    for k, v in result.items():
        print(f"  {k}: {v}")
    print(json.dumps(result))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=2)
    if result["verdict"] == "FAIL":
        sys.exit(1)


if __name__ == "__main__":
    main()
