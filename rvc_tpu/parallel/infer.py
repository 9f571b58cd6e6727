"""Batched data-parallel conversion over a device mesh.

The BASELINE's scaling config: batches of long-form utterances convert
data-parallel across chips/hosts — batch dim sharded over "data", model
weights replicated (or TP-sharded), retrieval sharded with the same
masked-matmul search (each shard scans its slice; top-k merges inside
the program via GSPMD).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rvc_tpu.pipelines.offline import (
    SAMPLE_RATE,
    WINDOW,
    F0_MIN,
    F0_MAX,
    _cast_float_tree,
    _compute_dtype,
    _f16_out,
    _upsample_protect,
    autotune_f0_jnp,
    coarse_f0_jnp,
)


class BatchConverter:
    """Converts equal-length utterance batches in two sharded programs
    (f0 + conversion), batch split over the mesh's "data" axis."""

    def __init__(self, rvc, mesh):
        self.rvc = rvc
        self.mesh = mesh
        self._f0_fn = None
        self._conv_fn = None
        self._rmvpe = None

    def _build(self):
        from rvc_tpu.models.rmvpe import decode_salience
        from rvc_tpu.ops.stft import log_mel_spectrogram
        from rvc_tpu.pitch import PitchExtractor

        if self._rmvpe is None:
            self._rmvpe = PitchExtractor("rmvpe")._model
        rmvpe_model = self._rmvpe.model
        hubert = self.rvc.hubert
        synth = self.rvc.synthesizer
        mesh = self.mesh
        batch_sh = NamedSharding(mesh, P("data"))

        def fn_f0(rmvpe_vars, audio, pitch_shift):
            T = audio.shape[1]
            p_len0 = T // WINDOW
            mel = log_mel_spectrogram(audio, 1024, 128, SAMPLE_RATE, WINDOW,
                                      1024, fmin=30, fmax=8000, htk=True)
            n_frames = mel.shape[1]
            pad = 32 * ((n_frames - 1) // 32 + 1) - n_frames
            melp = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)), mode="reflect") if pad else mel
            hidden = rmvpe_model.apply(rmvpe_vars, melp)[:, :n_frames]
            f0 = decode_salience(hidden, 0.03)[:, :p_len0]
            f0 = jnp.where((f0 >= F0_MIN) & (f0 <= F0_MAX), f0, 0.0)
            return f0 * 2.0 ** (pitch_shift / 12.0)

        compute_dtype = _compute_dtype()
        f16_out = _f16_out()

        def fn_conv(synth_vars, hubert_vars, audio, f0, sid, protect):
            T = audio.shape[1]
            p_len0 = T // WINDOW
            if compute_dtype != jnp.float32:
                # same bf16 policy as the offline fused path (f32 decoder
                # activations are enforced inside Synthesizer.infer)
                audio = audio.astype(compute_dtype)
                synth_vars = _cast_float_tree(synth_vars, compute_dtype)
                hubert_vars = _cast_float_tree(hubert_vars, compute_dtype)
            feats = hubert.apply(hubert_vars, audio, output_hidden_states=True)
            # edge-replicate features so the x2 grid covers every 10 ms
            # frame (same grid-coverage fix as pipelines/offline.py)
            hub_pad = (p_len0 + 1) // 2 - feats.shape[1]
            if hub_pad > 0:
                feats = jnp.pad(feats, ((0, 0), (0, hub_pad), (0, 0)),
                                mode="edge")
            t_feat = feats.shape[1] * 2
            if p_len0 >= t_feat:
                f0 = f0[:, :t_feat]
            else:
                f0 = jnp.pad(f0, ((0, 0), (0, t_feat - p_len0)))
            pitch = coarse_f0_jnp(f0)
            feats_up = _upsample_protect(feats, feats, f0, protect)
            lengths = jnp.full((audio.shape[0],), t_feat, dtype=jnp.int32)
            from rvc_tpu.models.synthesizer import source_noise_rng

            wave, _ = synth.apply(synth_vars, feats_up, lengths, pitch, f0,
                                  sid, rng=source_noise_rng(),
                                  method=synth.infer)
            wave = wave[:, :, 0]
            return wave.astype(jnp.float16) if f16_out else wave.astype(jnp.float32)

        self._f0_fn = jax.jit(
            fn_f0,
            in_shardings=(None, batch_sh, None),
            out_shardings=batch_sh,
        )
        self._conv_fn = jax.jit(
            fn_conv,
            in_shardings=(None, None, batch_sh, batch_sh, batch_sh, None),
            out_shardings=batch_sh,
        )

    def convert_batch(
        self,
        audio_batch: np.ndarray,   # (B, T) 16 kHz, equal lengths, B % n_data == 0
        sids: Optional[np.ndarray] = None,
        pitch_shift: float = 0.0,
        protect: float = 0.5,
        defer: bool = False,
    ) -> np.ndarray:
        """Convert one equal-length batch. With defer=True the device
        handle is returned without materializing, so a caller batching
        multiple groups can overlap group i's D2H with group i+1's
        compute (the blocking np.asarray otherwise serializes them —
        advisor r4 found the same loss in the chunk-batch path)."""
        if self._conv_fn is None:
            self._build()
        B, T = audio_batch.shape
        pad = (-T) % (WINDOW * 2)
        if pad:
            audio_batch = np.pad(audio_batch, ((0, 0), (0, pad)))
        audio = jax.device_put(jnp.asarray(audio_batch.astype(np.float32)),
                               NamedSharding(self.mesh, P("data")))
        sids = jnp.asarray(sids if sids is not None else np.zeros(B, np.int32))

        f0 = self._f0_fn(self._rmvpe.serving_variables()
                         if hasattr(self._rmvpe, "serving_variables")
                         else self._rmvpe.variables, audio, pitch_shift)
        out = self._conv_fn(self.rvc.pipeline.synth_variables,
                            self.rvc.pipeline.hubert_variables,
                            audio, f0, sids, protect)
        return out if defer else np.asarray(out)

    def convert_long_batch(
        self,
        utterances,                 # list of (T_i,) 16 kHz arrays
        sids=None,
        chunk_seconds: float = 10.0,
        pad_seconds: float = 1.0,
        batch_size: Optional[int] = None,
        **kwargs,
    ):
        """Batched long-form conversion (BASELINE config 5): every
        utterance splits into fixed chunks with reflect-pad context, ALL
        chunks across ALL utterances convert as data-parallel batches,
        and each utterance reassembles from its trimmed chunks.

        batch_size: chunks per dispatch (rounded up to a multiple of the
        mesh's data axis; default = one chunk per data shard). On a
        single chip a larger batch amortizes dispatch overhead and fills
        the MXU — the 64x60s bench uses this."""
        sr = SAMPLE_RATE
        chunk = int(chunk_seconds * sr)
        pad = int(pad_seconds * sr)
        tgt_per_in = self.rvc.cfg.data.sample_rate / sr

        jobs = []  # (utt_idx, chunk_idx, padded_chunk)
        for ui, utt in enumerate(utterances):
            utt = np.asarray(utt, dtype=np.float32)
            up = np.pad(utt, (pad, pad), mode="reflect")
            n_chunks = max(1, int(np.ceil(len(utt) / chunk)))
            for ci in range(n_chunks):
                s = ci * chunk
                seg = up[s : s + chunk + 2 * pad]
                if len(seg) < chunk + 2 * pad:
                    seg = np.pad(seg, (0, chunk + 2 * pad - len(seg)))
                jobs.append((ui, ci, seg))

        n_data = max(self.mesh.shape["data"], 1)
        group_n = n_data * max(1, -(-(batch_size or n_data) // n_data))
        sid_arr = np.asarray(sids if sids is not None
                             else np.zeros(len(utterances), np.int32))
        # dispatch EVERY group first (deferred device handles), then
        # materialize in order: group i's D2H overlaps group i+1's
        # compute instead of serializing on a blocking np.asarray
        handles = []
        for bstart in range(0, len(jobs), group_n):
            group = jobs[bstart : bstart + group_n]
            while len(group) % group_n:  # pad the last batch
                group.append(group[-1])
            batch = np.stack([g[2] for g in group])
            bs = np.asarray([sid_arr[g[0]] for g in group], np.int32)
            handles.append((bstart, self.convert_batch(
                batch, bs, defer=True, **kwargs)))
        outs = {}
        for bstart, h in handles:
            conv = np.asarray(h)
            for g, c in zip(jobs[bstart : bstart + group_n], conv):
                outs[(g[0], g[1])] = c

        pad_tgt = int(pad * tgt_per_in)
        chunk_tgt = int(chunk * tgt_per_in)
        results = []
        for ui, utt in enumerate(utterances):
            n_chunks = max(1, int(np.ceil(len(utt) / chunk)))
            pieces = []
            for ci in range(n_chunks):
                c = outs[(ui, ci)]
                pieces.append(c[pad_tgt : pad_tgt + chunk_tgt])
            full = np.concatenate(pieces)[: int(len(utt) * tgt_per_in)]
            results.append(full)
        return results
