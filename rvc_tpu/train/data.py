"""Training data pipeline: dataset, bucketed batching, pad-collate.

Capability parity with `rvc_mlx/train/data_loader.py` (RVCDataset /
RVCCollator / DataLoader) and the torch `DistributedBucketSampler`
(`rvc/train/data_utils.py:246`): rows of (features, f0, f0_coarse, spec,
wave, sid), phone features repeated 2x to the spec frame rate, length
buckets at [50, 100, ..., 900] frames, per-host sharding with a global
shuffle seed.

TPU design: every batch is padded to its bucket's upper boundary so jit
sees a small closed set of shapes (warm compile caches) — the same
discipline the reference applies via bucket boundaries, extended to
exact static shapes.
"""

from __future__ import annotations

import random
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from rvc_tpu.train.train_step import Batch
from rvc_tpu.utils import audio as audio_utils

BUCKET_BOUNDARIES = tuple(range(50, 950, 50))  # 50..900 frames


class RVCDataset:
    """Loads per-row features lazily from .npy files + the gt wave."""

    def __init__(self, rows: Sequence[dict], hop_length: int):
        self.rows = list(rows)
        self.hop_length = hop_length

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, i: int) -> Optional[Dict[str, np.ndarray]]:
        r = self.rows[i]
        try:
            feats = np.load(r["features"])            # (T_h, 768) @ 50 Hz
            f0 = np.load(r["f0"])                      # (T_f,)
            f0c = np.load(r["f0_coarse"])              # (T_f,)
            spec = np.load(r["spec"])                  # (T_s, F)
            wave, _ = audio_utils.load_wav(r["audio"])  # (T_s*hop,)
            wave = audio_utils.to_mono(wave)
        except Exception:
            return None  # corrupt sample: skipped (reference data_loader.py:328)

        phone = np.repeat(feats, 2, axis=0)            # 2x to 100 Hz
        T = min(phone.shape[0], spec.shape[0], len(f0), len(f0c))
        phone, spec = phone[:T], spec[:T]
        f0, f0c = f0[:T], f0c[:T]
        wave = wave[: T * self.hop_length]
        return dict(phone=phone.astype(np.float32), pitch=f0c.astype(np.int32),
                    pitchf=f0.astype(np.float32), spec=spec.astype(np.float32),
                    wave=wave.astype(np.float32), sid=int(r["sid"]), length=T)


def _bucket_of(n_frames: int) -> int:
    for b in BUCKET_BOUNDARIES:
        if n_frames <= b:
            return b
    return BUCKET_BOUNDARIES[-1]


class DataLoader:
    """Bucketed, host-sharded, epoch-shuffled batch iterator.

    Pads every sample in a batch to the bucket boundary (static shapes).
    With num_hosts > 1, each host takes a strided shard of the global
    shuffled order (the DistributedBucketSampler's per-rank sharding).
    """

    def __init__(
        self,
        dataset: RVCDataset,
        batch_size: int,
        seed: int = 1234,
        num_hosts: int = 1,
        host_id: int = 0,
        drop_last: bool = True,
        shuffle: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.drop_last = drop_last
        self.shuffle = shuffle  # False = deterministic batch order
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return max(1, len(self.dataset) // (self.batch_size * self.num_hosts))

    def _batches_indices(self) -> List[List[int]]:
        rng = random.Random(self.seed + self.epoch)
        buckets: Dict[int, List[int]] = {}
        for i, r in enumerate(self.dataset.rows):
            n = r.get("n_frames")
            if n is None:
                n = BUCKET_BOUNDARIES[-1]
            buckets.setdefault(_bucket_of(n), []).append(i)

        if self.num_hosts > 1:
            # multi-host: every global step must see (a) one batch on
            # EVERY host (equal step counts — a leftover batch on one
            # host would hang the others in the step's collectives) and
            # (b) the same padded shape on every host (the per-process
            # shards of jax.make_array_from_process_local_data must
            # agree). Group num_hosts full batches from the SAME bucket
            # into one step; host h takes member h of each step.
            steps: List[List[List[int]]] = []
            for b, idxs in sorted(buckets.items()):
                if self.shuffle:
                    rng.shuffle(idxs)
                full = [idxs[j : j + self.batch_size]
                        for j in range(0, len(idxs) - self.batch_size + 1,
                                       self.batch_size)]
                for j in range(0, len(full) - self.num_hosts + 1,
                               self.num_hosts):
                    steps.append(full[j : j + self.num_hosts])
            if self.shuffle:
                rng.shuffle(steps)
            return [step[self.host_id] for step in steps]

        batches = []
        for b, idxs in sorted(buckets.items()):
            if self.shuffle:
                rng.shuffle(idxs)
            for j in range(0, len(idxs), self.batch_size):
                group = idxs[j : j + self.batch_size]
                if len(group) == self.batch_size or not self.drop_last:
                    batches.append(group)
        if self.shuffle:
            rng.shuffle(batches)
        return batches

    def __iter__(self) -> Iterator[Batch]:
        import jax.numpy as jnp

        for group in self._batches_indices():
            samples = [self.dataset[i] for i in group]
            if self.num_hosts > 1:
                # cross-host shape consistency: B and T must not depend
                # on which samples loaded cleanly on THIS host. Corrupt
                # rows are replaced by a clone of a good one (or a
                # silent sample if the whole batch is corrupt) and T is
                # the group's bucket boundary from row metadata.
                good = [s for s in samples if s is not None]
                if not good:
                    # an entirely-corrupt batch cannot be skipped on one
                    # host only (the others would hang in the step's
                    # collectives) — fail loudly instead
                    raise RuntimeError(
                        f"all {len(group)} samples in a batch failed to "
                        f"load on host {self.host_id}; clean the dataset "
                        f"(rows {group})")
                samples = [s if s is not None else dict(good[0])
                           for s in samples]
                B = len(samples)
                # only a MISSING n_frames falls back to the top bucket —
                # `or` would also send n_frames==0 there while
                # _batches_indices buckets 0 to the 50 boundary, a
                # cross-host padded-shape mismatch
                T = _bucket_of(max(
                    (lambda n: n if n is not None else BUCKET_BOUNDARIES[-1])(
                        self.dataset.rows[i].get("n_frames"))
                    for i in group))
            else:
                samples = [s for s in samples if s is not None]
                if not samples:
                    continue
                B = len(samples)
                T = _bucket_of(max(s["length"] for s in samples))
            F = samples[0]["spec"].shape[1]
            hop = self.dataset.hop_length

            phone = np.zeros((B, T, samples[0]["phone"].shape[1]), np.float32)
            pitch = np.zeros((B, T), np.int32)
            pitchf = np.zeros((B, T), np.float32)
            spec = np.zeros((B, T, F), np.float32)
            wave = np.zeros((B, T * hop), np.float32)
            lengths = np.zeros(B, np.int32)
            sid = np.zeros(B, np.int32)
            for i, s in enumerate(samples):
                L = s["length"]
                phone[i, :L] = s["phone"][:L]
                pitch[i, :L] = s["pitch"][:L]
                pitchf[i, :L] = s["pitchf"][:L]
                spec[i, :L] = s["spec"][:L]
                wave[i, : L * hop] = s["wave"][: L * hop]
                lengths[i] = L
                sid[i] = s["sid"]
            yield Batch(
                phone=jnp.asarray(phone), phone_lengths=jnp.asarray(lengths),
                pitch=jnp.asarray(pitch), pitchf=jnp.asarray(pitchf),
                spec=jnp.asarray(spec), spec_lengths=jnp.asarray(lengths),
                wave=jnp.asarray(wave), sid=jnp.asarray(sid),
            )
