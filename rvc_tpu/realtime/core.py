"""Realtime engine: block conversion + SOLA overlap-add.

Capability parity with `rvc_mlx/realtime/core.py` (Realtime:34,
VoiceChanger:300): circular convert/pitch buffers sized
block+sola+extra+crossfade rounded to the 10 ms window, VAD and volume
gates, silence_front f0 skip, skip_head trim, SOLA alignment via
normalized cross-correlation, sin^2 crossfade, post-FX.

TPU design: the convert buffer never changes size, so HuBERT + synth for
a block is exactly one cached compiled program; pitch buffers are rolled
per block and only the fresh frames are recomputed.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
from scipy import signal as sp_signal

from rvc_tpu.pipelines.offline import coarse_f0, F0_MIN, F0_MAX
from rvc_tpu.realtime.buffer import circular_write
from rvc_tpu.realtime.vad import VADProcessor
from rvc_tpu.utils import audio as audio_utils

SAMPLE_RATE = 16000  # internal conversion rate
AUDIO_SAMPLE_RATE = 48000  # client/device rate


def build_block_program(pipe, *, sf, bf, F, skip, ret, spf, win, L,
                        use_index=False):
    """Fused realtime block program, batch-agnostic: audio (B, Lp) f16 +
    pitch state (B, F) -> (block (B, ret*spf) f16, new pitch state).
    Shared by the single-stream `Realtime` and the multi-stream pool."""
    import os

    import jax
    import jax.numpy as jnp
    from rvc_tpu.models.rmvpe import decode_salience
    from rvc_tpu.models.synthesizer import source_noise_rng
    from rvc_tpu.ops.stft import log_mel_spectrogram
    from rvc_tpu.pipelines.offline import (
        F0_MAX, F0_MIN, _upsample_protect, autotune_f0_jnp, coarse_f0_jnp)
    from rvc_tpu.retrieval.ivf import _ivf_search, index_blend
    from rvc_tpu.utils.packing import unpack_tree

    from rvc_tpu.pipelines.offline import _compute_dtype

    rmvpe = pipe._get_rmvpe()
    pipe._rmvpe_model = rmvpe.model
    pipe._get_packed(False, rmvpe)  # ensure packed buffers exist
    ss, hs, rs = pipe._packed["specs"]
    synth = pipe.synthesizer
    hubert = pipe.hubert
    rmvpe_model = rmvpe.model
    # same serving compute-dtype policy as the offline fused path: the
    # packed buffers already ship in this dtype; running HuBERT/enc_p/
    # flow activations in it too (decoder activations and the whole f0
    # path stay f32 inside Synthesizer.infer / the RMVPE head)
    compute_dtype = _compute_dtype()
    use_pallas = (os.environ.get(
        "RVC_TPU_PALLAS_MEL",
        "1" if jax.default_backend() == "tpu" else "0") == "1")

    def fn(rb, sb, hb, audio, pitchf_prev, sid, protect, ps, ats,
           ir=None, index_arrays=None, nprobe=1):
        rmvpe_vars = unpack_tree(rb, rs)
        synth_vars = unpack_tree(sb, ss)
        hubert_vars = unpack_tree(hb, hs)
        audio = audio.astype(jnp.float32)
        B = audio.shape[0]

        tail = audio[:, sf * win : L]
        n_tail = tail.shape[1] // win
        if use_pallas:
            from rvc_tpu.ops.pallas.melspec import pallas_log_mel

            mel = pallas_log_mel(tail, 1024, win, 128, SAMPLE_RATE,
                                 30.0, 8000.0, htk=True)
        else:
            mel = log_mel_spectrogram(tail, 1024, 128, SAMPLE_RATE, win,
                                      1024, fmin=30, fmax=8000, htk=True)
        nf = mel.shape[1]
        pad = 32 * ((nf - 1) // 32 + 1) - nf
        melp = (jnp.pad(mel, ((0, 0), (0, pad), (0, 0)), mode="reflect")
                if pad else mel)
        hidden = rmvpe_model.apply(rmvpe_vars, melp)[:, :nf]
        f0 = decode_salience(hidden, 0.03)[:, :n_tail]
        f0 = jnp.where((f0 >= F0_MIN) & (f0 <= F0_MAX), f0, 0.0)
        f0 = autotune_f0_jnp(f0, ats) * 2.0 ** (ps / 12.0)
        # roll the pitch state left by one block, overwrite the tail
        new_pitchf = jnp.concatenate(
            [pitchf_prev[:, bf : bf + (F - n_tail)], f0], axis=1)

        feats = hubert.apply(hubert_vars, audio.astype(compute_dtype),
                             output_hidden_states=True)
        feats_raw = feats
        if use_index:
            vectors, vec_sq, list_ids, centroids = index_arrays
            q = feats.reshape(-1, feats.shape[-1])
            d, i = _ivf_search(q, vectors, vec_sq, list_ids,
                               centroids, 8, nprobe)
            feats = index_blend(q, vectors[i], d, ir).reshape(
                feats.shape).astype(compute_dtype)
        t_feat = feats.shape[1] * 2
        pf = new_pitchf[:, :t_feat]
        if t_feat > F:
            pf = jnp.pad(pf, ((0, 0), (0, t_feat - F)))
        pitch_c = coarse_f0_jnp(pf)
        feats_up = _upsample_protect(feats, feats_raw, pf, protect)
        lengths = jnp.full((B,), min(F, t_feat), dtype=jnp.int32)
        wave, _ = synth.apply(synth_vars, feats_up, lengths, pitch_c,
                              pf, sid, rng=source_noise_rng(),
                              method=synth.infer)
        block = wave[:, skip * spf : (skip + ret) * spf, 0]
        return block.astype(jnp.float16), new_pitchf

    import jax as _jax

    return _jax.jit(fn, static_argnames=("nprobe",))


class Realtime:
    """Block converter over a fixed circular 16 kHz buffer."""

    def __init__(
        self,
        rvc,  # rvc_tpu.api.RVC
        f0_method: str = "rmvpe",
        silent_threshold: int = 0,
        vad_enabled: bool = False,
        vad_sensitivity: int = 3,
        vad_frame_ms: int = 30,
        sid: int = 0,
        post_process: bool = False,
        **fx_kwargs,
    ):
        self.rvc = rvc
        self.sample_rate = SAMPLE_RATE
        self.window_size = SAMPLE_RATE // 100  # 160
        self.f0_method = f0_method
        self.sid = sid
        self.input_sensitivity = 10 ** (silent_threshold / 20)
        self.vad = (VADProcessor(vad_sensitivity, SAMPLE_RATE, vad_frame_ms)
                    if vad_enabled else None)
        self.board = None
        if post_process:
            from rvc_tpu.realtime.fx import build_fx_chain

            self.board = build_fx_chain(**fx_kwargs)
        self.convert_buffer = None
        self.audio_buffer = None
        self.pitch_buffer = None
        self.pitchf_buffer = None

    def realloc(self, block_frame: int, extra_frame: int, crossfade_frame: int,
                sola_search_frame: int) -> None:
        """Frame args are at AUDIO_SAMPLE_RATE (reference `realloc:146`)."""
        to16 = lambda n: int(n / AUDIO_SAMPLE_RATE * self.sample_rate)
        block_16k = to16(block_frame)
        cross_16k = to16(crossfade_frame)
        sola_16k = to16(sola_search_frame)
        extra_16k = to16(extra_frame)

        convert_size = block_16k + sola_16k + extra_16k + cross_16k
        if (m := convert_size % self.window_size) != 0:
            convert_size += self.window_size - m
        self.convert_feature_size = convert_size // self.window_size
        self.skip_head = extra_16k // self.window_size
        self.return_length = self.convert_feature_size - self.skip_head
        self.silence_front_frames = max(self.skip_head - 5, 0)

        self.audio_buffer = np.zeros(block_16k + cross_16k, dtype=np.float32)
        self.convert_buffer = np.zeros(convert_size, dtype=np.float32)
        self.pitch_buffer = np.zeros(self.convert_feature_size, dtype=np.int32)
        self.pitchf_buffer = np.zeros(self.convert_feature_size, dtype=np.float32)
        self.block_16k = block_16k
        self._block_fns = None      # fused block programs are shape-bound
        self._pitchf_dev = None
        # silent blocks roll the device pitch state lazily: count frames
        # owed and apply the shift on the next speech block
        self._pending_zero_frames = 0

    # ------------------------------------------------------------------
    def _update_pitch(self, pitch_shift: float, f0_autotune: bool,
                      f0_autotune_strength: float) -> None:
        """Recompute f0 only on the non-silent tail, rolling the cached
        buffers (reference `pipeline.py:242-289`)."""
        # roll cached frames left by one block, recompute only the tail
        bf = self.block_16k // self.window_size
        self.pitch_buffer[:-bf] = self.pitch_buffer[bf:]
        self.pitchf_buffer[:-bf] = self.pitchf_buffer[bf:]

        sf = self.silence_front_frames
        audio_tail = self.convert_buffer[sf * self.window_size:]
        n_tail = len(audio_tail) // self.window_size
        pitch, pitchf = self.rvc.pipeline.get_f0(
            audio_tail, n_tail, self.f0_method,
            pitch_shift, f0_autotune, f0_autotune_strength)
        self.pitch_buffer[-n_tail:] = pitch
        self.pitchf_buffer[-n_tail:] = pitchf

    # ------------------------------------------------------------------
    # Fused block path: ONE jitted program per block (tail f0 + rolled
    # device-resident pitch state + HuBERT + synthesizer + skip_head
    # slice), ONE host sync fetching just the block-sized output. The
    # staged path pays two blocking syncs per block (host f0 decode, then
    # the full-buffer waveform) — ~2x the per-block link latency on a
    # remote-dispatch TPU.
    def _fused_block_ok(self, index_rate: float, f0_autotune: bool) -> bool:
        import os

        if os.environ.get("RVC_TPU_RT_FUSED", "1") != "1":
            return False
        return self.f0_method == "rmvpe" and self.rvc.pipeline.cfg_use_f0

    def _get_block_program(self, use_index: bool = False):
        cache = getattr(self, "_block_fns", None)
        if cache is None:
            cache = self._block_fns = {}
        if use_index in cache:
            return cache[use_index]
        import jax.numpy as jnp

        pipe = self.rvc.pipeline
        L = len(self.convert_buffer)
        self._block_pad = pipe._bucket_samples(L) - L
        jitted = build_block_program(
            pipe, sf=self.silence_front_frames,
            bf=self.block_16k // self.window_size,
            F=self.convert_feature_size, skip=self.skip_head,
            ret=self.return_length, spf=self.rvc.cfg.data.sample_rate // 100,
            win=self.window_size, L=L, use_index=use_index)
        self._block_fns[use_index] = jitted
        if getattr(self, "_pitchf_dev", None) is None:
            self._pitchf_dev = jnp.zeros((1, self.convert_feature_size),
                                         jnp.float32)
        return jitted

    def inference(
        self,
        audio_input_48k: np.ndarray,
        f0_up_key: float = 0,
        index_rate: float = 0.5,
        protect: float = 0.5,
        volume_envelope: float = 1.0,
        f0_autotune: bool = False,
        f0_autotune_strength: float = 1.0,
    ):
        a16 = audio_utils.resample(audio_input_48k, AUDIO_SAMPLE_RATE, SAMPLE_RATE)
        circular_write(a16, self.audio_buffer)
        circular_write(a16, self.convert_buffer)

        vol = float(np.sqrt(np.mean(self.audio_buffer ** 2)))

        gated = vol < self.input_sensitivity or (
            self.vad is not None and not self.vad.is_speech(a16))

        spf_tgt = self.rvc.cfg.data.sample_rate // 100
        if gated:
            # silence short-circuit (reference `core.py:215-243`): no
            # device dispatch at all. The staged pitch buffers roll with
            # zero f0 now; the fused device pitch state rolls lazily on
            # the next speech block (_pending_zero_frames), so SOLA/pitch
            # continuity is preserved when speech resumes.
            bf = self.block_16k // self.window_size
            F = self.convert_feature_size
            self.pitch_buffer[:-bf] = self.pitch_buffer[bf:]
            self.pitch_buffer[-bf:] = 1  # coarse bin of f0=0
            self.pitchf_buffer[:-bf] = self.pitchf_buffer[bf:]
            self.pitchf_buffer[-bf:] = 0.0
            self._pending_zero_frames = min(self._pending_zero_frames + bf, F)
            n_out = self.return_length * (AUDIO_SAMPLE_RATE // 100)
            return np.zeros(n_out, dtype=np.float32), vol

        if self._fused_block_ok(index_rate, f0_autotune):
            import jax.numpy as jnp

            use_index = index_rate > 0 and self.rvc.index is not None
            fn = self._get_block_program(use_index)
            if self._pending_zero_frames and self._pitchf_dev is not None:
                # apply the zero-roll owed by the silent blocks
                p = self._pending_zero_frames
                if p >= self.convert_feature_size:
                    self._pitchf_dev = jnp.zeros_like(self._pitchf_dev)
                else:
                    st = np.asarray(self._pitchf_dev)
                    st = np.concatenate(
                        [st[:, p:], np.zeros((st.shape[0], p), st.dtype)], axis=1)
                    self._pitchf_dev = jnp.asarray(st)
            self._pending_zero_frames = 0
            pipe = self.rvc.pipeline
            sb, hb, rb = pipe._packed["bufs"]
            buf = self.convert_buffer
            if self._block_pad:
                buf = np.pad(buf, (0, self._block_pad), mode="reflect")
            args = (
                rb, sb, hb,
                jnp.asarray(buf[None].astype(np.float16)),
                self._pitchf_dev,
                pipe._dev_scalar("sid", self.sid, np.int32),
                pipe._dev_scalar("protect", float(protect), np.float32, vec=False),
                pipe._dev_scalar("pitch_shift", float(f0_up_key), np.float32, vec=False),
                pipe._dev_scalar(
                    "autotune_strength",
                    float(f0_autotune_strength if f0_autotune else 0.0),
                    np.float32, vec=False))
            if use_index:
                idx = self.rvc.index
                block, self._pitchf_dev = fn(
                    *args,
                    pipe._dev_scalar("index_rate", float(index_rate), np.float32,
                                     vec=False),
                    idx._dev(), nprobe=idx.nprobe)
            else:
                block, self._pitchf_dev = fn(*args)
            try:
                block.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
            out = np.asarray(block)[0].astype(np.float32)
        else:
            self._update_pitch(f0_up_key, f0_autotune, f0_autotune_strength)

            out = self.rvc.pipeline.voice_conversion(
                self.convert_buffer,
                self.pitch_buffer,
                self.pitchf_buffer,
                self.sid,
                self.rvc.index if index_rate > 0 else None,
                index_rate,
                protect,
            )
            # trim skip_head worth of output, keep return_length frames
            out = out[self.skip_head * spf_tgt:
                      (self.skip_head + self.return_length) * spf_tgt]
        if self.rvc.cfg.data.sample_rate != AUDIO_SAMPLE_RATE:
            out = audio_utils.resample(out, self.rvc.cfg.data.sample_rate,
                                       AUDIO_SAMPLE_RATE)
        if self.board is not None:
            out = self.board(out, AUDIO_SAMPLE_RATE)
        return out.astype(np.float32), vol


class VoiceChanger:
    """SOLA streaming wrapper (reference `core.py:300-487`)."""

    def __init__(
        self,
        rvc,
        read_chunk_size: int = 192,
        cross_fade_overlap_size: float = 0.1,
        extra_convert_size: float = 0.5,
        **kwargs,
    ):
        self.block_frame = read_chunk_size * 128
        self.crossfade_frame = int(cross_fade_overlap_size * AUDIO_SAMPLE_RATE)
        self.extra_frame = int(extra_convert_size * AUDIO_SAMPLE_RATE)
        self.sola_search_frame = AUDIO_SAMPLE_RATE // 100
        self.vc_model = Realtime(rvc, **kwargs)
        self.vc_model.realloc(self.block_frame, self.extra_frame,
                              self.crossfade_frame, self.sola_search_frame)
        fade = np.sin(0.5 * np.pi * np.linspace(0, 1, self.crossfade_frame,
                                                dtype=np.float32)) ** 2
        self.fade_in = fade
        self.fade_out = 1.0 - fade
        self.sola_buffer = np.zeros(self.crossfade_frame, dtype=np.float32)

    def process_audio(self, audio_input: np.ndarray, **kwargs):
        block_size = audio_input.shape[0]
        audio, vol = self.vc_model.inference(audio_input, **kwargs)

        min_len = self.crossfade_frame + self.sola_search_frame
        if audio.shape[0] < min_len:
            audio = np.pad(audio, (0, min_len - audio.shape[0]))

        conv_input = audio[: self.crossfade_frame + self.sola_search_frame]
        try:
            from rvc_tpu import native

            off = native.sola_align(conv_input, self.sola_buffer,
                                    self.sola_search_frame)
        except Exception:
            off = None
        if off is not None:
            sola_offset = off
        else:
            cor_nom = sp_signal.correlate(conv_input, self.sola_buffer, mode="valid")
            cor_den = np.sqrt(
                sp_signal.correlate(conv_input ** 2, np.ones(self.crossfade_frame),
                                    mode="valid") + 1e-8)
            sola_offset = int(np.argmax(cor_nom / cor_den))

        audio = audio[sola_offset:].copy()
        if audio.shape[0] < self.crossfade_frame:
            audio = np.pad(audio, (0, self.crossfade_frame - audio.shape[0]))
        audio[: self.crossfade_frame] = (
            audio[: self.crossfade_frame] * self.fade_in
            + self.sola_buffer * self.fade_out)

        needed = block_size + self.crossfade_frame
        if audio.shape[0] < needed:
            audio = np.pad(audio, (0, needed - audio.shape[0]))
        self.sola_buffer[:] = audio[block_size : needed]
        return audio[:block_size], vol

    def on_request(self, audio_input: np.ndarray, **kwargs):
        t0 = time.perf_counter()
        result, vol = self.process_audio(audio_input, **kwargs)
        return result, vol, [0, (time.perf_counter() - t0) * 1000, 0]
