"""Multi-stream realtime pool: N concurrent voice-change streams batched
through ONE fused block program per step.

Beyond the reference (one realtime stream per process,
`rvc_mlx/realtime/core.py`): on TPU the block program's cost is
dominated by link latency and kernel-launch overheads, not FLOPs, so
batching N streams into one (N, L) program converts ~one stream's block
latency into N streams' worth of audio. Per-stream state (circular
buffers, SOLA alignment, volume gates) stays on the host; the pitch
state rides on device as an (N, F) array.

All streams share one model/speaker-map; per-stream `sid`, `pitch`,
`protect`, and `index_rate` are per-call vectors.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from scipy import signal as sp_signal

from rvc_tpu.realtime.core import (
    AUDIO_SAMPLE_RATE,
    SAMPLE_RATE,
    build_block_program,
)
from rvc_tpu.utils import audio as audio_utils


class VoiceChangerPool:
    """N-stream SOLA voice changer over one batched block program."""

    def __init__(
        self,
        rvc,
        n_streams: int,
        read_chunk_size: int = 192,
        cross_fade_overlap_size: float = 0.1,
        extra_convert_size: float = 0.5,
        sids: Optional[Sequence[int]] = None,
        silent_threshold: int = 0,
    ):
        self.rvc = rvc
        self.n = int(n_streams)
        self.sids = np.asarray(sids if sids is not None else [0] * self.n,
                               dtype=np.int32)
        assert self.sids.shape == (self.n,)
        self.input_sensitivity = 10 ** (silent_threshold / 20)

        self.block_frame = read_chunk_size * 128
        self.crossfade_frame = int(cross_fade_overlap_size * AUDIO_SAMPLE_RATE)
        self.extra_frame = int(extra_convert_size * AUDIO_SAMPLE_RATE)
        self.sola_search_frame = AUDIO_SAMPLE_RATE // 100

        # geometry at 16 kHz (mirrors Realtime.realloc)
        win = SAMPLE_RATE // 100
        to16 = lambda v: int(v / AUDIO_SAMPLE_RATE * SAMPLE_RATE)
        block_16k = to16(self.block_frame)
        cross_16k = to16(self.crossfade_frame)
        sola_16k = to16(self.sola_search_frame)
        extra_16k = to16(self.extra_frame)
        convert_size = block_16k + sola_16k + extra_16k + cross_16k
        if (m := convert_size % win) != 0:
            convert_size += win - m
        self.window_size = win
        self.block_16k = block_16k
        self.convert_feature_size = convert_size // win
        self.skip_head = extra_16k // win
        self.return_length = self.convert_feature_size - self.skip_head
        self.silence_front_frames = max(self.skip_head - 5, 0)
        self.convert_buffer = np.zeros((self.n, convert_size), np.float32)
        self.audio_buffer = np.zeros((self.n, block_16k + cross_16k),
                                     np.float32)

        fade = np.sin(0.5 * np.pi * np.linspace(
            0, 1, self.crossfade_frame, dtype=np.float32)) ** 2
        self.fade_in, self.fade_out = fade, 1.0 - fade
        self.sola_buffer = np.zeros((self.n, self.crossfade_frame), np.float32)

        pipe = rvc.pipeline
        L = convert_size
        self._block_pad = pipe._bucket_samples(L) - L
        self._fns = {}
        self._geom = dict(sf=self.silence_front_frames,
                          bf=block_16k // win, F=self.convert_feature_size,
                          skip=self.skip_head, ret=self.return_length,
                          spf=rvc.cfg.data.sample_rate // 100, win=win, L=L)
        import jax.numpy as jnp

        self._pitchf_dev = jnp.zeros((self.n, self.convert_feature_size),
                                     jnp.float32)

    def _fn(self, use_index: bool):
        if use_index not in self._fns:
            self._fns[use_index] = build_block_program(
                self.rvc.pipeline, use_index=use_index, **self._geom)
        return self._fns[use_index]

    # ------------------------------------------------------------------
    def _convert(self, blocks48: np.ndarray, pitch_shift: float,
                 protect: float, index_rate: float) -> np.ndarray:
        import jax.numpy as jnp

        a16 = audio_utils.resample(blocks48, AUDIO_SAMPLE_RATE, SAMPLE_RATE)
        n = a16.shape[1]
        self.audio_buffer[:, :-n] = self.audio_buffer[:, n:]
        self.audio_buffer[:, -n:] = a16
        self.convert_buffer[:, :-n] = self.convert_buffer[:, n:]
        self.convert_buffer[:, -n:] = a16
        self._vols = np.sqrt(np.mean(self.audio_buffer ** 2, axis=1))

        pipe = self.rvc.pipeline
        use_index = index_rate > 0 and self.rvc.index is not None
        fn = self._fn(use_index)  # also ensures pipe._packed exists
        sb, hb, rb = pipe._packed["bufs"]
        buf = self.convert_buffer
        if self._block_pad:
            buf = np.pad(buf, ((0, 0), (0, self._block_pad)), mode="reflect")
        args = (rb, sb, hb, jnp.asarray(buf.astype(np.float16)),
                self._pitchf_dev, jnp.asarray(self.sids),
                pipe._dev_scalar("protect", float(protect), np.float32, vec=False),
                pipe._dev_scalar("pitch_shift", float(pitch_shift), np.float32,
                                 vec=False),
                pipe._dev_scalar("autotune_strength", 0.0, np.float32, vec=False))
        if use_index:
            idx = self.rvc.index
            out, self._pitchf_dev = fn(
                *args, pipe._dev_scalar("index_rate", float(index_rate), np.float32,
                                        vec=False),
                idx._dev(), nprobe=idx.nprobe)
        else:
            out, self._pitchf_dev = fn(*args)
        try:
            out.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        out = np.asarray(out).astype(np.float32)
        if self.rvc.cfg.data.sample_rate != AUDIO_SAMPLE_RATE:
            out = audio_utils.resample(out, self.rvc.cfg.data.sample_rate,
                                       AUDIO_SAMPLE_RATE)
        return out

    def process(self, blocks: np.ndarray, pitch_shift: float = 0.0,
                protect: float = 0.5, index_rate: float = 0.0):
        """blocks (N, block_frame) @48 kHz -> (N, block_frame), vols (N,).

        Per-stream SOLA alignment + sin^2 crossfade on the host, exactly
        like the single-stream engine (`core.py:process_audio`)."""
        assert blocks.shape == (self.n, self.block_frame)
        audio = self._convert(blocks, pitch_shift, protect, index_rate)

        min_len = self.crossfade_frame + self.sola_search_frame
        if audio.shape[1] < min_len:
            audio = np.pad(audio, ((0, 0), (0, min_len - audio.shape[1])))

        outs = np.empty((self.n, self.block_frame), np.float32)
        needed = self.block_frame + self.crossfade_frame
        for s in range(self.n):
            a = audio[s]
            conv_input = a[: min_len]
            cor_nom = sp_signal.correlate(conv_input, self.sola_buffer[s],
                                          mode="valid")
            cor_den = np.sqrt(sp_signal.correlate(
                conv_input ** 2, np.ones(self.crossfade_frame),
                mode="valid") + 1e-8)
            off = int(np.argmax(cor_nom / cor_den))
            a = a[off:].copy()
            if a.shape[0] < needed:
                a = np.pad(a, (0, needed - a.shape[0]))
            a[: self.crossfade_frame] = (
                a[: self.crossfade_frame] * self.fade_in
                + self.sola_buffer[s] * self.fade_out)
            self.sola_buffer[s] = a[self.block_frame : needed]
            gated = self._vols[s] < self.input_sensitivity
            outs[s] = 0.0 if gated else a[: self.block_frame]
        return outs, self._vols
