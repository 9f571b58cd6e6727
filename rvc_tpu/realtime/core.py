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
        spf_tgt = self.rvc.cfg.data.sample_rate // 100
        out = out[self.skip_head * spf_tgt:
                  (self.skip_head + self.return_length) * spf_tgt]
        if self.rvc.cfg.data.sample_rate != AUDIO_SAMPLE_RATE:
            out = audio_utils.resample(out, self.rvc.cfg.data.sample_rate,
                                       AUDIO_SAMPLE_RATE)
        if gated:
            out = np.zeros_like(out)
        elif self.board is not None:
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
