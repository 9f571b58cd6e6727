"""Offline voice-conversion pipeline.

Capability parity with `rvc_mlx/infer/pipeline_mlx.py:80-373` and the
torch pipeline's long-audio chunking (`rvc/infer/pipeline.py:441-545`):

    16 kHz mono -> butterworth high-pass 48 Hz -> reflect pad ->
    f0 extraction (+ autotune, semitone shift, 1..255 mel coarse quant) ->
    HuBERT features -> IVFFlat retrieval blend (k=8, 1/d^2, index_rate) ->
    2x nearest-neighbor time upsample -> "protect" blend on unvoiced ->
    Synthesizer.infer -> trim pad -> RMS volume envelope -> peak normalize.

TPU design: audio lengths are bucketed (frame multiples) so jit caches
stay warm; HuBERT, retrieval search/blend, the protect blend and the
synthesizer run as device-resident jitted stages with no host round trips
between them; long audio splits at minimum-energy points exactly like the
torch pipeline and the chunk batch can be converted as one batched call.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.configs import PipelineConfig
from rvc_tpu.pitch import PitchExtractor, autotune_f0
from rvc_tpu.retrieval.ivf import IVFFlatIndex, index_blend
from rvc_tpu.utils import audio as audio_utils
from rvc_tpu.utils.profiling import trace_span

SAMPLE_RATE = 16000
WINDOW = 160
F0_MIN, F0_MAX = 50.0, 1100.0
F0_MEL_MIN = 1127.0 * math.log(1.0 + F0_MIN / 700.0)
F0_MEL_MAX = 1127.0 * math.log(1.0 + F0_MAX / 700.0)


def coarse_f0(f0: np.ndarray) -> np.ndarray:
    """Continuous f0 -> 1..255 coarse mel-quantized bins
    (`pipeline_mlx.py:150-157`)."""
    f0_mel = 1127.0 * np.log(1.0 + f0 / 700.0)
    scaled = np.where(
        f0_mel > 0,
        (f0_mel - F0_MEL_MIN) * 254.0 / (F0_MEL_MAX - F0_MEL_MIN) + 1.0,
        f0_mel,
    )
    scaled = np.clip(scaled, 1.0, 255.0)
    return np.rint(scaled).astype(np.int32)


def coarse_f0_jnp(f0: jax.Array) -> jax.Array:
    """Device version of coarse_f0 for the fused conversion path."""
    f0_mel = 1127.0 * jnp.log(1.0 + f0 / 700.0)
    scaled = jnp.where(
        f0_mel > 0,
        (f0_mel - F0_MEL_MIN) * 254.0 / (F0_MEL_MAX - F0_MEL_MIN) + 1.0,
        f0_mel,
    )
    return jnp.rint(jnp.clip(scaled, 1.0, 255.0)).astype(jnp.int32)


def autotune_f0_jnp(f0: jax.Array, strength: jax.Array) -> jax.Array:
    """Device autotune: snap toward nearest table note by `strength`
    (strength 0 = identity, so it can stay in the fused graph)."""
    from rvc_tpu.pitch.autotune import NOTE_TABLE

    table = jnp.asarray(NOTE_TABLE)
    idx = jnp.argmin(jnp.abs(f0[..., None] - table[None, :]), axis=-1)
    closest = table[idx]
    tuned = f0 + (closest - f0) * strength
    return jnp.where(f0 > 0, tuned, f0)


@partial(jax.jit, static_argnames=("upsample",))
def _upsample_protect(
    feats: jax.Array,       # (B, T, C) post-retrieval features
    feats_raw: jax.Array,   # (B, T, C) pre-retrieval features
    pitchf: jax.Array,      # (B, 2T) frame f0 (0 = unvoiced), already at target length
    protect: float,
    upsample: int = 2,
):
    """2x nearest-neighbor time upsample + unvoiced 'protect' blend
    (`pipeline_mlx.py:210-244`)."""
    B, T, C = feats.shape

    def up(x):
        return jnp.broadcast_to(x[:, :, None, :], (B, T, upsample, C)).reshape(B, T * upsample, C)

    f = up(feats)
    fr = up(feats_raw)
    # blend weights follow the feature compute dtype (f0 itself stays f32)
    pitchff = jnp.where(pitchf > 0, 1.0, protect)[:, :, None].astype(feats.dtype)
    blended = f * pitchff + fr * (1.0 - pitchff)
    return jnp.where(protect < 0.5, blended, f)


def _cast_float_tree(tree, dtype):
    """Cast every floating leaf of a pytree to `dtype` (free inside jit)."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        tree,
    )


def _compute_dtype():
    """Inference compute-dtype policy: RVC_TPU_BF16=1 runs HuBERT +
    retrieval + synthesizer in bfloat16 (f32 accumulation everywhere,
    f32 f0/sine-phase path). The RMVPE f0 program always stays f32.

    Default ON for TPU serving (r4): the pipeline is HBM-bandwidth
    bound and the policy is parity-validated (spec-corr 0.9995 vs f32;
    the bench self-check re-verifies the benched configuration against
    the staged f32 path every run). OFF elsewhere — CPU tests compare
    against torch f32 oracles."""
    import os as _os

    default = "1" if jax.default_backend() == "tpu" else "0"
    return (jnp.bfloat16 if _os.environ.get("RVC_TPU_BF16", default) == "1"
            else jnp.float32)


def _f16_out() -> bool:
    """RVC_TPU_F16_OUT=1 (default) transfers the waveform as f16."""
    import os as _os

    return _os.environ.get("RVC_TPU_F16_OUT", "1") == "1"


def _f16_in() -> bool:
    """RVC_TPU_F16_IN=1 (default) uploads the input audio as f16 (halves
    the host->device bytes; audio is peak-normalized in [-1, 1] where f16
    quantization is ~1e-4 absolute — measured end-to-end corr vs f32
    input > 0.9999). Programs cast back to their compute dtype on entry."""
    import os as _os

    return _os.environ.get("RVC_TPU_F16_IN", "1") == "1"


def _graph_knobs() -> tuple:
    """Env knobs that change what a built program TRACES (Pallas kernel
    selection, f0 U-Net dtype). They are read at trace time inside the
    model code, so they must be part of every compiled-program cache key
    — otherwise flipping one mid-process silently reuses a program built
    under the old setting (advisor r3 finding)."""
    import os as _os

    return tuple(_os.environ.get(k, "") for k in (
        "RVC_TPU_PALLAS_MEL", "RVC_TPU_PALLAS_RESBLOCK",
        "RVC_TPU_PALLAS_ATTN", "RVC_TPU_BF16_F0",
        "RVC_TPU_SOURCE_NOISE", "RVC_TPU_PACKED_UNET",
        "RVC_TPU_PACKED_TC", "RVC_TPU_PACKED_POOL",
        "RVC_TPU_PACKED_TAIL"))


def _one_dispatch() -> bool:
    """RVC_TPU_ONE_DISPATCH=1 merges the f0 and conversion programs into
    a single executable (one remote execute per chunk instead of two).
    Default ON for TPU (interleaved A/B on the tunneled chip: 137.6 ms
    merged vs 155.8 ms two-program, scripts/profile_onedispatch_ab.py);
    OFF elsewhere to keep CPU test compiles small."""
    import os as _os

    default = "1" if jax.default_backend() == "tpu" else "0"
    return _os.environ.get("RVC_TPU_ONE_DISPATCH", default) == "1"


class Pipeline:
    """Offline conversion pipeline over injected jitted models.

    hubert: callable (audio (B,T)) -> feats (B,T',768) [jitted]
    synthesizer: the flax Synthesizer module; variables: its params
    """

    def __init__(
        self,
        tgt_sr: int,
        synthesizer,
        synth_variables,
        hubert,
        hubert_variables,
        pitch_extractor: Optional[PitchExtractor] = None,
        config: Optional[PipelineConfig] = None,
    ):
        self.tgt_sr = tgt_sr
        self.config = config or PipelineConfig()
        self.synthesizer = synthesizer
        self.synth_variables = synth_variables
        self.cfg_use_f0 = getattr(getattr(synthesizer, "model", None), "use_f0", True)
        self.hubert = hubert
        self.hubert_variables = hubert_variables
        self.pitch_extractor = pitch_extractor
        self.window = WINDOW
        self.t_pad = SAMPLE_RATE * self.config.x_pad
        self.t_pad_tgt = tgt_sr * self.config.x_pad
        self.t_query = SAMPLE_RATE * self.config.x_query
        self.t_center = SAMPLE_RATE * self.config.x_center
        self.t_max = SAMPLE_RATE * self.config.x_max

        self._hubert_jit = jax.jit(
            lambda v, a: self.hubert.apply(v, a, output_hidden_states=True))
        from rvc_tpu.models.synthesizer import source_noise_rng

        self._infer_jit = jax.jit(
            lambda v, ph, l, pi, pf, sid: self.synthesizer.apply(
                v, ph, l, pi, pf, sid, rng=source_noise_rng(),
                method=self.synthesizer.infer))
        self._fused = {}
        self._scalar_cache = {}

    def _dev_scalar(self, kind: str, value, dtype, vec: bool = True):
        """Device-resident cache of small per-call arrays (sid, p_len,
        protect, ...). On a remote-dispatch link every fresh host scalar
        is a separate tiny upload; conversion calls repeat the same
        handful of values, so committed buffers are reused. vec=True
        yields shape (1,), vec=False a 0-d scalar."""
        key = (kind, value, vec)
        buf = self._scalar_cache.get(key)
        if buf is None:
            if len(self._scalar_cache) > 256:
                self._scalar_cache.clear()
            host = (np.asarray([value], dtype=dtype) if vec
                    else np.asarray(value, dtype=dtype))
            buf = jnp.asarray(host)
            self._scalar_cache[key] = buf
        return buf

    # ------------------------------------------------------------------
    # Fused conversion (the TPU fast path): TWO jitted programs with a
    # device-resident handoff — program A computes RMVPE f0 (mel -> U-Net
    # -> decode -> gates), program B does HuBERT + retrieval + protect +
    # synthesizer. Audio uploads once, the waveform downloads once, and
    # each program stays small enough to compile (and persist-cache) fast.
    def _build_f0_program(self):
        import os as _os

        from rvc_tpu.models.rmvpe import decode_salience
        from rvc_tpu.ops.stft import log_mel_spectrogram

        rmvpe_model = self._rmvpe_model
        # default ON for TPU (measured: 33 ms vs 50 ms for 14 s of audio,
        # max log-mel deviation 0.006 = 10x inside the reference's own
        # RMSE<0.01 activation tolerance); OFF elsewhere (pallas interpret
        # mode on CPU is slow) — RVC_TPU_PALLAS_MEL=0/1 overrides
        default_pallas = "1" if jax.default_backend() == "tpu" else "0"
        use_pallas = _os.environ.get("RVC_TPU_PALLAS_MEL", default_pallas) == "1"
        # opt-in: U-Net conv trunk in bf16 (the BiGRU/fc/decode head stays
        # f32 inside E2E). Salience deviation measured at 2e-3 — inside
        # the reference's RMSE<0.01 activation bar — but f0 argmax
        # fragility on ambiguous frames can't be validated without real
        # weights, so the default stays f32 even under RVC_TPU_BF16=1.
        bf16_unet = _os.environ.get("RVC_TPU_BF16_F0", "0") == "1"

        def fn_f0(rmvpe_vars, audio, pitch_shift, autotune_strength):
            audio = audio.astype(jnp.float32)  # f16 upload -> f32 compute
            T = audio.shape[1]
            p_len0 = T // WINDOW
            if use_pallas:
                # fused matmul-DFT mel kernel (~1.7x the XLA FFT path on
                # v5e; bf16 MXU rounding costs ~1e-2 log-mel accuracy)
                from rvc_tpu.ops.pallas.melspec import pallas_log_mel

                mel = pallas_log_mel(audio, 1024, WINDOW, 128, SAMPLE_RATE,
                                     30.0, 8000.0, htk=True)
            else:
                mel = log_mel_spectrogram(audio, 1024, 128, SAMPLE_RATE, WINDOW,
                                          1024, fmin=30, fmax=8000, htk=True)
            n_frames = mel.shape[1]
            pad = 32 * ((n_frames - 1) // 32 + 1) - n_frames
            melp = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)), mode="reflect") if pad else mel
            if bf16_unet:
                melp = melp.astype(jnp.bfloat16)
            hidden = rmvpe_model.apply(rmvpe_vars, melp)[:, :n_frames]
            f0 = decode_salience(hidden, 0.03)[:, :p_len0]
            # facade range gate (PitchExtractor.extract): outside
            # [f0_min, f0_max] counts as unvoiced
            f0 = jnp.where((f0 >= F0_MIN) & (f0 <= F0_MAX), f0, 0.0)
            f0 = autotune_f0_jnp(f0, autotune_strength)
            return f0 * 2.0 ** (pitch_shift / 12.0)

        return jax.jit(fn_f0)

    def _build_fused(self, use_index: bool, compute_dtype=jnp.float32,
                     f16_out: bool = True, trim_frames: int = 0):
        from rvc_tpu.retrieval.ivf import _ivf_search, index_blend

        synth = self.synthesizer
        hubert = self.hubert
        spf_tgt = self.tgt_sr // 100

        def fn(synth_vars, hubert_vars, audio, f0, sid, p_len,
               protect, index_rate, index_arrays=None, nprobe: int = 1):
            T = audio.shape[1]
            p_len0 = T // WINDOW

            audio = audio.astype(compute_dtype)  # f16 upload -> compute dtype
            if compute_dtype != jnp.float32:
                # bf16 policy: params + activations in bf16, convs/matmuls
                # accumulate f32 (ops/conv.py), norms/softmax/sine-phase f32
                synth_vars = _cast_float_tree(synth_vars, compute_dtype)
                hubert_vars = _cast_float_tree(hubert_vars, compute_dtype)

            feats = hubert.apply(hubert_vars, audio, output_hidden_states=True)
            feats_raw = feats
            if use_index:
                vectors, vec_sq, list_ids, centroids = index_arrays
                # flatten (B, T', C) -> (B*T', C): the masked-matmul IVF
                # search is per-query, so batched chunks share one search
                # (exact reshape no-op at B=1)
                Bq, Tq, Cq = feats.shape
                q = feats.reshape(Bq * Tq, Cq)
                d, i = _ivf_search(q, vectors, vec_sq, list_ids,
                                   centroids, 8, nprobe)
                # the index stays f32; re-enter the compute dtype after blend
                feats = index_blend(q, vectors[i], d, index_rate).reshape(
                    Bq, Tq, Cq).astype(compute_dtype)

            # the x2-upsampled HuBERT grid falls up to 2 frames short of
            # the 10 ms frame count (conv valid-window shortfall at the
            # padded tail); edge-replicate features so every frame is
            # covered — the extras land inside the trimmed pad context,
            # but without them the final chunk's output silently loses
            # its last real frames
            hub_pad = (p_len0 + 1) // 2 - feats.shape[1]
            if hub_pad > 0:
                feats = jnp.pad(feats, ((0, 0), (0, hub_pad), (0, 0)),
                                mode="edge")
                feats_raw = jnp.pad(feats_raw, ((0, 0), (0, hub_pad), (0, 0)),
                                    mode="edge")
            t_feat = feats.shape[1] * 2
            if p_len0 >= t_feat:
                f0 = f0[:, :t_feat]
            else:
                f0 = jnp.pad(f0, ((0, 0), (0, t_feat - p_len0)))
            # zero f0 beyond the true (unpadded) frame count so bucket
            # padding behaves identically to the staged path
            frame_valid = (jnp.arange(t_feat)[None, :] < p_len[:, None])
            f0 = jnp.where(frame_valid, f0, 0.0)
            pitch = coarse_f0_jnp(f0)
            feats_up = _upsample_protect(feats, feats_raw, f0, protect)

            from rvc_tpu.models.synthesizer import source_noise_rng

            wave, _ = synth.apply(
                synth_vars, feats_up, p_len, pitch, f0,
                sid, rng=source_noise_rng(), method=synth.infer)
            wave = wave[:, :, 0]
            if trim_frames:
                # drop the reflect-pad context on DEVICE: the host only
                # ever keeps [t_pad_tgt : -t_pad_tgt], and on a
                # remote-dispatch link the fetch costs ~19 ms/MB — the
                # 2 s of pad is ~40% of the padded waveform's bytes
                wave = wave[:, trim_frames * spf_tgt :
                            wave.shape[1] - trim_frames * spf_tgt]
            if f16_out:
                # halve the device->host transfer: final audio is tanh
                # bounded in [-1, 1] where f16 carries ~1e-3 absolute
                # error — inaudible and far inside the spec-corr bar
                wave = wave.astype(jnp.float16)
            else:
                wave = wave.astype(jnp.float32)
            return wave

        return jax.jit(fn, static_argnames=("nprobe",))

    def _get_rmvpe(self):
        if self.pitch_extractor is None or self.pitch_extractor.method != "rmvpe":
            self.pitch_extractor = PitchExtractor("rmvpe")
        return self.pitch_extractor._model

    def _get_packed(self, use_index: bool, rmvpe, trim_frames: int = 0):
        """Packed-dispatch programs: each model's whole variable tree
        travels as ONE flat f32 buffer (static-sliced back inside the
        program). Cuts per-call handle marshalling from ~600 buffers to 3
        — the dominant per-dispatch cost on a remote-dispatch link."""
        dtype = _compute_dtype()
        f16_out = _f16_out()
        from rvc_tpu.utils.packing import pack_tree, unpack_tree

        # key includes the graph knobs: the RMVPE buffer's CONTENT
        # depends on the packed-U-Net knobs (host-prepacked weights)
        pk = (jnp.dtype(dtype).name, _graph_knobs())
        if getattr(self, "_packed_dtype", None) != pk:
            # synth/hubert buffers ship in the compute dtype (bf16 =
            # half the dispatch bytes + HBM reads); RMVPE stays f32
            sb, ss = pack_tree(self.synth_variables, dtype)
            hb, hs = pack_tree(self.hubert_variables, dtype)
            rvars = (rmvpe.serving_variables()
                     if hasattr(rmvpe, "serving_variables")
                     else rmvpe.variables)
            rb, rs = pack_tree(rvars)
            self._packed = dict(bufs=(sb, hb, rb), specs=(ss, hs, rs))
            self._packed_dtype = pk
        one_dispatch = _one_dispatch()
        key = ("packed", use_index, jnp.dtype(dtype).name, f16_out,
               trim_frames, one_dispatch, _graph_knobs())
        if key not in self._fused:
            ss, hs, rs = self._packed["specs"]
            fn_f0 = self._build_f0_program()
            fn_conv = self._build_fused(use_index, dtype, f16_out,
                                        trim_frames)

            if one_dispatch:
                # f0 + conversion as ONE executable: on a remote-dispatch
                # link each execute carries fixed per-call overhead, and
                # the merged program also lets XLA overlap the (f32) f0
                # U-Net with HuBERT instead of serializing two programs
                if use_index:
                    allp = jax.jit(
                        lambda sb, hb, rb, audio, ps, ats, sid, pl, prot,
                        ir, idx, nprobe:
                        fn_conv(unpack_tree(sb, ss), unpack_tree(hb, hs),
                                audio,
                                fn_f0(unpack_tree(rb, rs), audio, ps, ats),
                                sid, pl, prot, ir, idx, nprobe=nprobe),
                        static_argnames=("nprobe",))
                else:
                    allp = jax.jit(
                        lambda sb, hb, rb, audio, ps, ats, sid, pl, prot:
                        fn_conv(unpack_tree(sb, ss), unpack_tree(hb, hs),
                                audio,
                                fn_f0(unpack_tree(rb, rs), audio, ps, ats),
                                sid, pl, prot, 0.0))
                self._fused[key] = (allp,)
                return self._fused[key]

            f0p = jax.jit(lambda rb, audio, ps, ats: fn_f0(
                unpack_tree(rb, rs), audio, ps, ats))
            if use_index:
                convp = jax.jit(
                    lambda sb, hb, audio, f0, sid, pl, prot, ir, idx, nprobe:
                    fn_conv(unpack_tree(sb, ss), unpack_tree(hb, hs), audio,
                            f0, sid, pl, prot, ir, idx, nprobe=nprobe),
                    static_argnames=("nprobe",))
            else:
                convp = jax.jit(
                    lambda sb, hb, audio, f0, sid, pl, prot:
                    fn_conv(unpack_tree(sb, ss), unpack_tree(hb, hs), audio,
                            f0, sid, pl, prot, 0.0))
            self._fused[key] = (f0p, convp)
        return self._fused[key]

    def _get_frozen(self, use_index: bool, rmvpe, trim_frames: int = 0):
        """Serving-mode programs: weights baked into the executables as
        constants, so each dispatch ships only the audio + scalars. On a
        remote-dispatch link (tunneled TPU) per-call marshalling of ~600
        weight handles dominates latency; freezing removes it."""
        dtype = _compute_dtype()
        f16_out = _f16_out()
        key = ("frozen", use_index, jnp.dtype(dtype).name, f16_out,
               trim_frames, _graph_knobs())
        if key not in self._fused:
            fn_f0 = self._build_f0_program()
            fn_conv = self._build_fused(use_index, dtype, f16_out,
                                        trim_frames)
            rv = (rmvpe.serving_variables()
                  if hasattr(rmvpe, "serving_variables")
                  else rmvpe.variables)
            sv, hv = self.synth_variables, self.hubert_variables
            if use_index:
                f0_frozen = jax.jit(
                    lambda audio, ps, ats: fn_f0(rv, audio, ps, ats))
                conv_frozen = jax.jit(
                    lambda audio, f0, sid, p_len, prot, ir, idx_arrays, nprobe:
                    fn_conv(sv, hv, audio, f0, sid, p_len, prot, ir,
                            idx_arrays, nprobe=nprobe),
                    static_argnames=("nprobe",))
            else:
                f0_frozen = jax.jit(
                    lambda audio, ps, ats: fn_f0(rv, audio, ps, ats))
                conv_frozen = jax.jit(
                    lambda audio, f0, sid, p_len, prot:
                    fn_conv(sv, hv, audio, f0, sid, p_len, prot, 0.0))
            self._fused[key] = (f0_frozen, conv_frozen)
        return self._fused[key]

    def fused_convert(
        self,
        audio0: np.ndarray,
        sid: int,
        pitch_shift: float,
        autotune_strength: float,
        protect: float,
        index: Optional[IVFFlatIndex],
        index_rate: float,
        defer: bool = False,
        trim_frames: int = 0,
    ):
        """Single-call conversion of a padded 16 kHz chunk with RMVPE f0.

        trim_frames drops that many 10 ms frames of context from EACH end
        of the output waveform on device before the D2H transfer (the
        pipeline passes its t_pad so the reflect-pad context — ~40% of
        the padded clip's bytes — never crosses the link).

        defer=True returns the (device_waveform, p_len) handle pair
        without blocking — callers with several chunks dispatch them all
        first and materialize in order, so each chunk's D2H transfer
        overlaps the next chunk's compute (measured to overlap on the
        tunneled link, scripts/profile_overlap.py)."""
        rmvpe = self._get_rmvpe()
        self._rmvpe_model = rmvpe.model
        n = len(audio0)
        n_pad = self._bucket_samples(n)
        in_dtype = np.float16 if _f16_in() else np.float32
        with trace_span("host/pad+upload"):
            audio = jnp.asarray(np.pad(
                audio0.astype(np.float32), (0, n_pad - n),
                mode="reflect" if n_pad - n < n else "constant").astype(in_dtype))[None]

        use_index = index is not None and index_rate > 0
        # true frame count of the unpadded chunk (the program edge-pads
        # the feature grid to cover it, so no cap is needed)
        p_len = n // self.window
        p_len_j = self._dev_scalar("p_len", p_len, np.int32)
        sid_j = self._dev_scalar("sid", sid, np.int32)
        # scalars ship as committed 0-d device arrays (cached) instead of
        # fresh per-call host floats
        ps_j = self._dev_scalar("pitch_shift", float(pitch_shift), np.float32, vec=False)
        ats_j = self._dev_scalar("autotune_strength", float(autotune_strength), np.float32,
                                 vec=False)
        prot_j = self._dev_scalar("protect", float(protect), np.float32, vec=False)
        ir_j = self._dev_scalar("index_rate", float(index_rate), np.float32, vec=False)

        import os as _os

        if _os.environ.get("RVC_TPU_FREEZE", "0") == "1":
            # serving mode: weights baked as constants (lowest dispatch
            # latency, but much longer first compile — opt-in)
            fn_f0, fn_conv = self._get_frozen(use_index, rmvpe, trim_frames)
            f0 = fn_f0(audio, ps_j, ats_j)
            if use_index:
                out = fn_conv(audio, f0, sid_j, p_len_j,
                              prot_j, ir_j, index._dev(),
                              nprobe=index.nprobe)
            else:
                out = fn_conv(audio, f0, sid_j, p_len_j, prot_j)
        elif _os.environ.get("RVC_TPU_PACK", "1") == "1":
            fns = self._get_packed(use_index, rmvpe, trim_frames)
            sb, hb, rb = self._packed["bufs"]
            if len(fns) == 1:  # merged one-dispatch program
                with trace_span("dispatch/all_program"):
                    if use_index:
                        out = fns[0](sb, hb, rb, audio, ps_j, ats_j, sid_j,
                                     p_len_j, prot_j, ir_j, index._dev(),
                                     nprobe=index.nprobe)
                    else:
                        out = fns[0](sb, hb, rb, audio, ps_j, ats_j, sid_j,
                                     p_len_j, prot_j)
            else:
                f0p, convp = fns
                with trace_span("dispatch/f0_program"):
                    f0 = f0p(rb, audio, ps_j, ats_j)
                with trace_span("dispatch/conv_program"):
                    if use_index:
                        out = convp(sb, hb, audio, f0, sid_j, p_len_j,
                                    prot_j, ir_j, index._dev(),
                                    nprobe=index.nprobe)
                    else:
                        out = convp(sb, hb, audio, f0, sid_j, p_len_j,
                                    prot_j)
        else:
            dtype = _compute_dtype()
            key = ("plain", use_index, jnp.dtype(dtype).name, _f16_out(),
                   trim_frames, _graph_knobs())
            f0_key = ("f0", _graph_knobs())
            if f0_key not in self._fused:
                self._fused[f0_key] = self._build_f0_program()
            if key not in self._fused:
                self._fused[key] = self._build_fused(use_index, dtype,
                                                     _f16_out(), trim_frames)
            f0 = self._fused[f0_key](
                rmvpe.serving_variables()
                if hasattr(rmvpe, "serving_variables")
                else rmvpe.variables, audio, ps_j, ats_j)
            if use_index:
                out = self._fused[key](
                    self.synth_variables, self.hubert_variables, audio, f0,
                    sid_j, p_len_j, prot_j, ir_j,
                    index._dev(), nprobe=index.nprobe)
            else:
                out = self._fused[key](
                    self.synth_variables, self.hubert_variables, audio, f0,
                    sid_j, p_len_j, prot_j,
                    self._dev_scalar("index_rate", 0.0, np.float32, vec=False))
        if _os.environ.get("RVC_TPU_ASYNC_FETCH", "1") == "1":
            # start the D2H stream as soon as the producing program
            # finishes (dispatch is async; a dependent early fetch
            # measured 22 ms visible vs 52 ms for an idle-queue fetch,
            # scripts/profile_overlap.py)
            try:
                out.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
        if defer:
            return out, p_len, trim_frames
        return self._materialize(out, p_len, trim_frames)

    def fused_convert_batch(
        self,
        chunks: list,
        sid: int,
        pitch_shift: float,
        autotune_strength: float,
        protect: float,
        index: Optional[IVFFlatIndex],
        index_rate: float,
        trim_frames: int = 0,
    ):
        """Convert several SAME-BUCKET padded chunks as ONE batched
        dispatch (RVC_TPU_CHUNK_BATCH serving mode): on a remote-
        dispatch link every execute/fetch carries fixed RPC overhead,
        so B chunks per call divide that overhead by B where the
        deferred-dispatch path can only overlap it. Retrieval, f0, the
        protect blend and the synthesizer all run batched inside the
        same packed program (the B=1 graph is the exact same code).

        Returns (device_out (B, T), p_lens list, trim_frames); feed each
        row to _materialize."""
        rmvpe = self._get_rmvpe()
        self._rmvpe_model = rmvpe.model
        n_pad = max(self._bucket_samples(len(c)) for c in chunks)
        in_dtype = np.float16 if _f16_in() else np.float32
        with trace_span("host/pad+upload_batch"):
            rows = [np.pad(c.astype(np.float32), (0, n_pad - len(c)),
                           mode="reflect" if n_pad - len(c) < len(c)
                           else "constant") for c in chunks]
            audio = jnp.asarray(np.stack(rows).astype(in_dtype))
        p_lens = [len(c) // self.window for c in chunks]
        use_index = index is not None and index_rate > 0
        p_len_j = jnp.asarray(p_lens, np.int32)
        sid_j = jnp.asarray([sid] * len(chunks), np.int32)
        ps_j = self._dev_scalar("pitch_shift", float(pitch_shift),
                                np.float32, vec=False)
        ats_j = self._dev_scalar("autotune_strength",
                                 float(autotune_strength), np.float32,
                                 vec=False)
        prot_j = self._dev_scalar("protect", float(protect), np.float32,
                                  vec=False)
        ir_j = self._dev_scalar("index_rate", float(index_rate), np.float32,
                                vec=False)

        fns = self._get_packed(use_index, rmvpe, trim_frames)
        sb, hb, rb = self._packed["bufs"]
        if len(fns) == 1:
            with trace_span("dispatch/all_program_batch"):
                if use_index:
                    out = fns[0](sb, hb, rb, audio, ps_j, ats_j, sid_j,
                                 p_len_j, prot_j, ir_j, index._dev(),
                                 nprobe=index.nprobe)
                else:
                    out = fns[0](sb, hb, rb, audio, ps_j, ats_j, sid_j,
                                 p_len_j, prot_j)
        else:
            f0p, convp = fns
            f0 = f0p(rb, audio, ps_j, ats_j)
            if use_index:
                out = convp(sb, hb, audio, f0, sid_j, p_len_j, prot_j,
                            ir_j, index._dev(), nprobe=index.nprobe)
            else:
                out = convp(sb, hb, audio, f0, sid_j, p_len_j, prot_j)
        import os as _os

        if _os.environ.get("RVC_TPU_ASYNC_FETCH", "1") == "1":
            try:
                out.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
        return out, p_lens, trim_frames

    def _materialize(self, out, p_len: int, trim_frames: int = 0) -> np.ndarray:
        out = np.asarray(out)[0].astype(np.float32)
        return out[: max(p_len - 2 * trim_frames, 0) * (self.tgt_sr // 100)]

    def _materialize_batch(self, out, p_lens: list,
                           trim_frames: int = 0) -> list:
        host = np.asarray(out).astype(np.float32)
        spf = self.tgt_sr // 100
        return [host[b][: max(p - 2 * trim_frames, 0) * spf]
                for b, p in enumerate(p_lens)]

    def refresh(self) -> None:
        """Drop cached compiled programs (call after swapping weights)."""
        self._fused.clear()
        self._packed_dtype = None
        if hasattr(self, "_packed"):
            del self._packed

    # ------------------------------------------------------------------
    def get_f0(
        self,
        x: np.ndarray,
        p_len: int,
        f0_method: str = "rmvpe",
        pitch_shift: float = 0.0,
        f0_autotune: bool = False,
        f0_autotune_strength: float = 1.0,
        input_f0: Optional[np.ndarray] = None,
        proposed_pitch: bool = False,
        proposed_pitch_threshold: float = 155.0,
        f0_hop_length: int = 160,
    ):
        """x (T,) 16 kHz -> (coarse (p_len,), continuous (p_len,))."""
        if input_f0 is not None:
            f0 = np.asarray(input_f0, dtype=np.float32)
        else:
            if (self.pitch_extractor is None
                    or self.pitch_extractor.method != f0_method
                    or self.pitch_extractor.crepe_hop != f0_hop_length):
                self.pitch_extractor = PitchExtractor(
                    f0_method, crepe_hop=f0_hop_length)
            f0 = self.pitch_extractor.extract(x, F0_MIN, F0_MAX)
        if f0_autotune:
            f0 = autotune_f0(f0, f0_autotune_strength)
        elif proposed_pitch:
            # auto-shift so the median voiced f0 lands near the target
            # (`rvc/infer/pipeline.py:251-277`), clamped to +-12 semitones
            valid = np.where(f0 > 0)[0]
            up_key = 0
            if len(valid) >= 2:
                median_f0 = float(np.median(
                    np.interp(np.arange(len(f0)), valid, f0[valid])))
                if median_f0 > 0 and not np.isnan(median_f0):
                    up_key = int(np.clip(
                        np.round(12 * np.log2(proposed_pitch_threshold / median_f0)),
                        -12, 12))
            pitch_shift = pitch_shift + up_key
        f0 = f0 * (2.0 ** (pitch_shift / 12.0))
        if len(f0) < p_len:
            f0 = np.pad(f0, (0, p_len - len(f0)))
        f0 = f0[:p_len]
        return coarse_f0(f0), f0.astype(np.float32)

    # ------------------------------------------------------------------
    def _bucket_samples(self, n: int) -> int:
        b = self.config.frame_bucket * self.window
        return ((n + b - 1) // b) * b

    def voice_conversion(
        self,
        audio0: np.ndarray,            # (T,) padded 16 kHz chunk
        pitch: Optional[np.ndarray],    # (T//160,) coarse
        pitchf: Optional[np.ndarray],   # (T//160,) continuous
        sid: int,
        index: Optional[IVFFlatIndex],
        index_rate: float,
        protect: float,
    ) -> np.ndarray:
        n = len(audio0)
        n_pad = self._bucket_samples(n)
        audio_padded = np.pad(audio0.astype(np.float32), (0, n_pad - n),
                              mode="reflect" if n_pad - n < n else "constant")

        feats = self._hubert_jit(self.hubert_variables, jnp.asarray(audio_padded)[None])
        feats_raw = feats

        if index is not None and index_rate > 0:
            q = feats[0]
            d, i = index.search_device(q, k=8)
            neighbors = jnp.asarray(index.vectors)[i]
            blended = index_blend(q, neighbors, d, index_rate)
            feats = blended[None]

        p_len = n // self.window
        # edge-replicate features so the x2 grid covers every 10 ms
        # frame (same fix as the fused program: the conv valid-window
        # shortfall otherwise drops the chunk's last 1-2 real frames)
        hub_pad = (p_len + 1) // 2 - feats.shape[1]
        if hub_pad > 0:
            feats = jnp.pad(feats, ((0, 0), (0, hub_pad), (0, 0)), mode="edge")
            feats_raw = jnp.pad(feats_raw, ((0, 0), (0, hub_pad), (0, 0)),
                                mode="edge")
        t_feat = feats.shape[1] * 2  # static padded length

        use_f0 = pitch is not None and pitchf is not None
        if use_f0:
            pitch_arr = np.zeros(t_feat, dtype=np.int32)
            pitchf_arr = np.zeros(t_feat, dtype=np.float32)
            pitch_arr[: min(p_len, len(pitch))] = pitch[: p_len]
            pitchf_arr[: min(p_len, len(pitchf))] = pitchf[: p_len]
            pitch_j = jnp.asarray(pitch_arr)[None]
            pitchf_j = jnp.asarray(pitchf_arr)[None]
            feats_up = _upsample_protect(feats, feats_raw, pitchf_j, protect)
        else:
            pitch_j = pitchf_j = None
            feats_up = _upsample_protect(feats, feats_raw,
                                         jnp.ones((1, t_feat)), 1.0)

        wave, _ = self._infer_jit(
            self.synth_variables, feats_up, jnp.array([p_len]),
            pitch_j, pitchf_j, jnp.array([sid]))
        # wave: (1, t_feat * (tgt_sr//100), 1); p_len frames are real audio
        out = np.asarray(wave[0, :, 0])
        return out[: p_len * (self.tgt_sr // 100)]

    # ------------------------------------------------------------------
    def _find_split_points(self, audio: np.ndarray) -> list:
        """Minimum-|moving-average| split points every ~x_center seconds
        (`rvc/infer/pipeline.py:441-454`).

        RVC_TPU_CHUNK_S=<seconds> shrinks the chunk target below the
        reference's 38 s so the deferred-fetch pipeline overlaps each
        chunk's D2H transfer with the next chunk's compute (each chunk
        still carries x_pad seconds of real context per side, so outputs
        concatenate seamlessly — same mechanism the reference uses for
        long audio, applied at a finer grain for link-latency hiding)."""
        import os as _os

        t_center, t_max, t_query = self.t_center, self.t_max, self.t_query
        end = len(audio)
        chunk_s = float(_os.environ.get("RVC_TPU_CHUNK_S", "0") or 0)
        if chunk_s > 0:
            t_center = int(chunk_s * SAMPLE_RATE)
            t_max = t_center + t_center // 2
            end = len(audio) - t_center // 2  # no sliver final chunk
            # tight query window: chunk sizes stay near the target so
            # they bucket to at most a couple of compiled shapes
            t_query = min(t_query, t_center // 4)
        if len(audio) <= t_max:
            return []
        kernel = np.ones(self.window) / self.window
        smooth = np.convolve(np.abs(audio), kernel, mode="same")
        pts = []
        for center in range(t_center, end, t_center):
            lo = max(center - t_query, 0)
            hi = min(center + t_query, len(audio))
            seg = smooth[lo:hi]
            pts.append(lo + int(np.argmin(seg)))
        return pts

    def chunk_bounds(self, audio: np.ndarray) -> list:
        """(start, end) sample bounds of the long-audio chunks the
        pipeline will convert (window-aligned min-energy splits; one
        chunk when the clip fits). Exposed so benches can dispatch the
        exact production chunk shapes."""
        opt_ts = self._find_split_points(audio)
        if not opt_ts:
            return [(0, len(audio))]
        bounds = []
        prev = 0
        for t in opt_ts:
            t = (t // self.window) * self.window
            bounds.append((prev, t))
            prev = t
        bounds.append((prev, len(audio)))
        return bounds

    def pipeline(
        self,
        audio: np.ndarray,
        sid: int = 0,
        pitch_shift: float = 0.0,
        f0_method: str = "rmvpe",
        index: Optional[IVFFlatIndex] = None,
        index_rate: float = 0.75,
        pitch_guidance: bool = True,
        volume_envelope: float = 1.0,
        protect: float = 0.5,
        f0_autotune: bool = False,
        f0_autotune_strength: float = 1.0,
        input_f0: Optional[np.ndarray] = None,
        proposed_pitch: bool = False,
        proposed_pitch_threshold: float = 155.0,
        f0_hop_length: int = 160,
    ) -> np.ndarray:
        """Full conversion: 16 kHz mono float -> target-sr waveform."""
        audio = np.asarray(audio, dtype=np.float32)
        with trace_span("host/highpass"):
            audio = audio_utils.highpass_filter(audio, SAMPLE_RATE, 48.0, 5)

        bounds = self.chunk_bounds(audio)
        t_pad = self.t_pad

        audio_pad_full = np.pad(audio, (t_pad, t_pad), mode="reflect")
        # user f0 curve: index 0 aligns with ORIGINAL frame 0; pad it to
        # the padded-audio frame grid once so each chunk slices its own
        # window (covers the t_pad context shift and multi-chunk offsets)
        input_f0_pad = None
        if input_f0 is not None:
            pw = t_pad // self.window
            input_f0_pad = np.pad(
                np.asarray(input_f0, dtype=np.float32), (pw, pw),
                mode="edge")
        # fused single-program fast path: RMVPE pitch guidance without a
        # user-supplied f0 curve (everything else uses the staged path)
        fused_ok = (pitch_guidance and f0_method == "rmvpe"
                    and input_f0 is None and not proposed_pitch
                    and self.cfg_use_f0)
        import os as _os

        if (fused_ok and len(bounds) > 1
                and _os.environ.get("RVC_TPU_CHUNK_BATCH", "0") == "1"):
            # serving mode: same-bucket chunks convert as ONE batched
            # dispatch (one execute + one fetch RPC for the whole group
            # instead of per-chunk pairs — the remote link's per-call
            # overhead is the measured majority of wall time). Groups
            # stay consecutive so reassembly order is trivial.
            chunks = [audio_pad_full[s : e + 2 * t_pad] for s, e in bounds]
            groups = []
            for c in chunks:
                b = self._bucket_samples(len(c))
                if groups and groups[-1][0] == b:
                    groups[-1][1].append(c)
                else:
                    groups.append((b, [c]))
            # dispatch every group first, materialize after — same
            # pending/materialize split as the default path, so group
            # i's D2H overlaps group i+1's compute (advisor r4: blocking
            # per-group materialization lost cross-group overlap on
            # clips whose chunks straddle buckets)
            handles = []
            for _, group in groups:
                handles.append(self.fused_convert_batch(
                    group, sid, pitch_shift,
                    f0_autotune_strength if f0_autotune else 0.0,
                    protect, index, index_rate,
                    trim_frames=t_pad // self.window))
            out_chunks = []
            for handle in handles:
                out_chunks.extend(self._materialize_batch(*handle))
            audio_out = np.concatenate(out_chunks)
            with trace_span("host/post"):
                if volume_envelope != 1:
                    audio_out = audio_utils.change_rms(
                        audio, SAMPLE_RATE, audio_out, self.tgt_sr,
                        volume_envelope)
                return audio_utils.peak_normalize(audio_out, 0.99)

        # dispatch every chunk first (device handles), materialize after:
        # chunk i's D2H transfer overlaps chunk i+1's compute
        pending = []
        for (s, e) in bounds:
            # chunk with t_pad context on both sides (positions shift by +t_pad)
            chunk = audio_pad_full[s : e + 2 * t_pad]
            if fused_ok:
                with trace_span("dispatch/fused_convert"):
                    pending.append(self.fused_convert(
                        chunk, sid, pitch_shift,
                        f0_autotune_strength if f0_autotune else 0.0,
                        protect, index, index_rate, defer=True,
                        trim_frames=t_pad // self.window))
            else:
                p_len = len(chunk) // self.window
                chunk_f0 = None
                if input_f0_pad is not None:
                    chunk_f0 = input_f0_pad[
                        s // self.window : (e + 2 * t_pad) // self.window]
                if pitch_guidance:
                    with trace_span("host/get_f0"):
                        pitch, pitchf = self.get_f0(
                            chunk, p_len, f0_method, pitch_shift,
                            f0_autotune, f0_autotune_strength, chunk_f0,
                            proposed_pitch, proposed_pitch_threshold,
                            f0_hop_length)
                else:
                    pitch = pitchf = None
                pending.append(self.voice_conversion(
                    chunk, pitch, pitchf, sid, index, index_rate, protect))

        out_chunks = []
        pad_tgt = int(t_pad * (self.tgt_sr / SAMPLE_RATE))
        for item in pending:
            if isinstance(item, tuple):
                # fused chunks arrive with the pad context already
                # trimmed on device
                with trace_span("fetch/materialize"):
                    out_chunks.append(self._materialize(*item))
            else:
                conv = item
                out_chunks.append(conv[pad_tgt:-pad_tgt] if pad_tgt else conv)

        audio_out = np.concatenate(out_chunks) if len(out_chunks) > 1 else out_chunks[0]

        with trace_span("host/post"):
            if volume_envelope != 1:
                audio_out = audio_utils.change_rms(
                    audio, SAMPLE_RATE, audio_out, self.tgt_sr, volume_envelope)
            return audio_utils.peak_normalize(audio_out, 0.99)
