"""High-level trainer loop.

Capability parity with `RVCTrainer` (`rvc_mlx/train/trainer.py:193-732`)
and the torch loop (`rvc/train/train.py:608-1023`): epoch loop over the
bucketed loader, warmup (non-adversarial) epochs, pretrained G/D loading,
checkpoint save/resume (params + optimizer state + epoch/step/best
history), overtraining-detector stop, best-model tracking, JSONL metric
logging, and the final inference-weights export (enc_q stripped, config
sidecar — the `extract_model` equivalent).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import numpy as np

from rvc_tpu.configs import RVCConfig, config_to_dict
from rvc_tpu.train.data import DataLoader
from rvc_tpu.train.overtraining import OvertrainingDetector
from rvc_tpu.train.train_step import TrainState, create_train_state, make_train_step
from rvc_tpu.utils import weights as W


class RVCTrainer:
    def __init__(
        self,
        cfg: RVCConfig,
        train_loader: DataLoader,
        val_loader: Optional[DataLoader] = None,
        checkpoint_dir: str = "checkpoints",
        seed: int = 1234,
        use_overtraining_detector: bool = False,
        overtraining_threshold: int = 50,
        overtraining_patience: int = 10,
        mesh=None,
        freeze_encoder: bool = False,
        save_only_latest: bool = False,
        save_every_weights: bool = False,
        cache_data_on_device: bool = False,
        model_name: str = "model",
        tracker=None,
        use_aim: bool = False,
        log_every_steps: int = 5,
    ):
        self.cfg = cfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)
        self.mesh = mesh
        self._state_sharded = False
        # rank-0-only file writes (the torch trainer's rank==0 guards,
        # `rvc/train/train.py:838`); collectives still run on every host
        self._is_main = jax.process_index() == 0

        steps_per_epoch = max(len(train_loader), 1)
        self.state, self.net_g, self.net_d = create_train_state(
            cfg, jax.random.PRNGKey(seed), steps_per_epoch)
        self._steps_per_epoch = steps_per_epoch
        self._step_fns = {}
        self.freeze_encoder = freeze_encoder
        self.detector = (OvertrainingDetector(threshold=overtraining_threshold,
                                              patience=overtraining_patience)
                         if use_overtraining_detector else None)
        self.eval_batch = None  # set to a Batch to render reference audio
        self.epoch = 0
        self.best_loss = float("inf")
        self._rng = jax.random.PRNGKey(seed + 1)
        self._log_path = os.path.join(checkpoint_dir, "train_log.jsonl")
        # reference flags: fixed-name checkpoints (save_only_latest, the
        # torch trainer's `2333333.pth` mode), per-save inference export
        # (save_every_weights), device-resident batch cache
        # (cache_data_in_gpu, `rvc/train/train.py`)
        self.save_only_latest = save_only_latest
        self.save_every_weights = save_every_weights
        self.cache_data_on_device = cache_data_on_device
        self.model_name = model_name
        self._device_batches = None
        # observability (reference `rvc/train/train.py:790-900`): scalar
        # curves as rolling-window means, mel images + eval audio at save
        # epochs; backend = aim > tensorboard > JSONL (tracker.py)
        from rvc_tpu.monitoring.tracker import (
            NullTracker, RollingMean, create_tracker)

        self.tracker = tracker or (
            create_tracker(checkpoint_dir, model_name, use_aim=use_aim)
            if self._is_main else NullTracker())
        self.tracker.log_params(config_to_dict(cfg))
        self._rolling = RollingMean(50)
        self.log_every_steps = max(log_every_steps, 1)

    # ------------------------------------------------------------------
    def _get_step_fn(self, adversarial: bool):
        if adversarial not in self._step_fns:
            if self.mesh is not None:
                from rvc_tpu.parallel.train import make_sharded_train_step

                # state must be sharded already: its layout pins the
                # step's out_shardings
                self._ensure_sharded()
                self._step_fns[adversarial] = make_sharded_train_step(
                    self.cfg, self.net_g, self.net_d, self.mesh,
                    self._steps_per_epoch, adversarial, state=self.state)
            else:
                self._step_fns[adversarial] = make_train_step(
                    self.cfg, self.net_g, self.net_d,
                    self._steps_per_epoch, adversarial,
                    freeze_encoder=self.freeze_encoder)
        return self._step_fns[adversarial]

    def render_eval_audio(self, name: Optional[str] = None) -> Optional[str]:
        """Render the eval batch through the current generator to a wav
        and log it (audio + mel-spectrogram image) to the tracker — the
        torch trainer's per-save reference inference + tensorboard
        artifacts (`rvc/train/train.py:838-900`)."""
        if self.eval_batch is None:
            return None
        from rvc_tpu.utils.audio import save_wav

        b = self.eval_batch
        # gather params (collective on all hosts), render on host 0 only
        params = self._host_tree(self.state.g_params)
        if not self._is_main:
            return None
        wave, _ = self.net_g.apply(
            {"params": params}, b.phone, b.phone_lengths,
            b.pitch, b.pitchf, b.sid, method=self.net_g.infer)
        audio = np.asarray(wave[0, :, 0])
        sr = self.cfg.data.sample_rate
        path = os.path.join(self.checkpoint_dir,
                            f"{name or f'epoch_{self.epoch:04d}'}_eval.wav")
        save_wav(path, audio, sr)
        step = int(self.state.step)
        self.tracker.log_audio("eval/audio", audio, sr, step)
        from rvc_tpu.ops.stft import mel_spectrogram

        d = self.cfg.data
        mel = np.asarray(mel_spectrogram(
            jax.numpy.asarray(audio, dtype=jax.numpy.float32)[None],
            d.filter_length, d.n_mel_channels, sr, d.hop_length,
            d.win_length, d.mel_fmin, d.mel_fmax))[0]
        self.tracker.log_spectrogram("eval/mel", mel, step)
        return path

    # ------------------------------------------------------------------
    def load_pretrained(self, g_path: Optional[str] = None,
                        d_path: Optional[str] = None) -> None:
        """Load pretrained G/D from torch .pth or native safetensors,
        merging over the initialized trees (missing keys keep init)."""

        stats = {"matched": 0, "total": 0}

        def merge(dst, src):
            for k, v in src.items():
                if isinstance(v, dict) and isinstance(dst.get(k), dict):
                    merge(dst[k], v)
                else:
                    stats["total"] += 1
                    if (k in dst and hasattr(dst[k], "shape")
                            and tuple(dst[k].shape) == tuple(np.shape(v))):
                        dst[k] = jax.numpy.asarray(v)
                        stats["matched"] += 1
            return dst

        def check_coverage(what, path):
            # a silent near-zero merge means the pretrain does not match
            # this architecture (e.g. NSF HiFi-GAN weights into an MRF
            # decoder) — the model would train from random init while
            # the user believes they are finetuning
            if stats["total"] and stats["matched"] < stats["total"] // 2:
                raise ValueError(
                    f"pretrained {what} {path!r} matched only "
                    f"{stats['matched']}/{stats['total']} tensors of this "
                    f"model — wrong architecture/vocoder for these "
                    f"weights (pass matching pretrains or drop the flag)")
            stats["matched"] = stats["total"] = 0

        if g_path and os.path.exists(g_path):
            if g_path.endswith(".safetensors"):
                tree = W.load_params(g_path)
            else:
                sd = W.load_torch_checkpoint(g_path)
                sd.pop("__meta__", None)
                tree = W.convert_synthesizer_state_dict(sd)
            g_params = jax.device_get(
                jax.tree.map(lambda x: x, self.state.g_params))  # copy
            # per-module coverage: a wrong-vocoder pretrain still matches
            # enc_p/flow, so a whole-tree ratio would hide a fully
            # unmatched decoder
            for mod, sub in tree.items():
                if isinstance(sub, dict) and isinstance(g_params.get(mod), dict):
                    merge(g_params[mod], sub)
                else:
                    merge(g_params, {mod: sub})
                check_coverage(f"generator {mod!r}", g_path)
            self.state = self.state._replace(g_params=g_params)
            self._state_sharded = False
        if d_path and os.path.exists(d_path):
            if d_path.endswith(".safetensors"):
                tree = W.load_params(d_path)
            else:
                sd = W.load_torch_checkpoint(d_path)
                sd.pop("__meta__", None)
                tree = W.convert_discriminator_state_dict(sd)
            d_params = merge(jax.device_get(self.state.d_params), tree)
            check_coverage("discriminator", d_path)
            self.state = self.state._replace(d_params=d_params)
            self._state_sharded = False

    # ------------------------------------------------------------------
    def _host_tree(self, tree):
        """Fetch a (possibly cross-host-sharded) tree to host memory.
        Multi-host arrays are resharded to fully-replicated first — a
        collective, so EVERY host must call this even though only host 0
        writes the result."""
        if self.mesh is not None and jax.process_count() > 1:
            from rvc_tpu.parallel.mesh import replicate

            tree = jax.jit(lambda t: t,
                           out_shardings=replicate(self.mesh))(tree)
        return jax.device_get(tree)

    def save_checkpoint(self, name: Optional[str] = None,
                        full_state: bool = True) -> str:
        """Save G/D params as safetensors; with full_state also the
        optimizer moments + step via orbax (the reference's G_/D_ .pth
        pairs with optimizer/scaler state, `rvc/train/utils.py:34-124`)."""
        name = name or f"epoch_{self.epoch:04d}"
        gp = os.path.join(self.checkpoint_dir, f"{name}_G.safetensors")
        dp = os.path.join(self.checkpoint_dir, f"{name}_D.safetensors")
        g_host = self._host_tree(self.state.g_params)
        d_host = self._host_tree(self.state.d_params)
        if full_state:
            # orbax coordinates across processes internally — EVERY host
            # must enter the save (a main-only call deadlocks its
            # multihost barrier); it writes one checkpoint regardless.
            # The (possibly ZeRO-1 cross-host-sharded) moments are passed
            # as global jax.Arrays — each host writes its own shards
            # (a host-side device_get would raise on non-addressable
            # shards).
            try:
                import orbax.checkpoint as ocp

                path = os.path.abspath(
                    os.path.join(self.checkpoint_dir, f"{name}_opt"))
                with ocp.StandardCheckpointer() as ckptr:
                    ckptr.save(path,
                               {"g_opt": self.state.g_opt,
                                "d_opt": self.state.d_opt},
                               force=True)
            except Exception as e:  # params-only checkpoints still valid
                print(f"optimizer-state save skipped: {e}")
        if not self._is_main:
            return gp
        W.save_params(g_host, gp)
        W.save_params(d_host, dp)
        meta = dict(epoch=self.epoch, step=int(self.state.step),
                    best_loss=self.best_loss,
                    config=config_to_dict(self.cfg))
        with open(os.path.join(self.checkpoint_dir, f"{name}_state.json"), "w") as f:
            json.dump(meta, f, indent=2)
        return gp

    def resume(self, name: str) -> None:
        gp = os.path.join(self.checkpoint_dir, f"{name}_G.safetensors")
        dp = os.path.join(self.checkpoint_dir, f"{name}_D.safetensors")
        sp = os.path.join(self.checkpoint_dir, f"{name}_state.json")
        self.load_pretrained(gp, dp)
        if os.path.exists(sp):
            with open(sp) as f:
                meta = json.load(f)
            self.epoch = meta.get("epoch", 0)
            self.best_loss = meta.get("best_loss", float("inf"))
            self.state = self.state._replace(
                step=jax.numpy.asarray(meta.get("step", 0), dtype=jax.numpy.int32))
        opt_path = os.path.abspath(os.path.join(self.checkpoint_dir, f"{name}_opt"))
        if os.path.isdir(opt_path):
            try:
                import orbax.checkpoint as ocp

                with ocp.StandardCheckpointer() as ckptr:
                    # concrete arrays as target: orbax restores into the
                    # SAME shardings (ZeRO-1 moments land sharded again)
                    target = {"g_opt": self.state.g_opt,
                              "d_opt": self.state.d_opt}
                    restored = ckptr.restore(opt_path, target)
                self.state = self.state._replace(
                    g_opt=restored["g_opt"], d_opt=restored["d_opt"])
            except Exception as e:
                print(f"optimizer-state restore skipped: {e}")

    def export_inference_model(self, path: str) -> str:
        """Final inference weights, enc_q stripped. A `.pth` path writes
        the reference's ecosystem checkpoint (fp16 torch state dict +
        18-element config list + metadata,
        `rvc/train/process/extract_model.py:27-100`) so models trained
        here round-trip into upstream RVC tooling; any other extension
        writes native safetensors + config sidecar."""
        params = self._host_tree(self.state.g_params)
        if not self._is_main:
            return path
        params = {k: v for k, v in params.items() if k != "enc_q"}
        if path.endswith(".pth"):
            return W.export_pth(
                params, self.cfg, path, name=self.model_name,
                epoch=self.epoch, step=int(self.state.step),
                pitch_guidance=self.cfg.model.use_f0)
        W.save_params(params, path, config=config_to_dict(self.cfg))
        return path

    # ------------------------------------------------------------------
    def _batches(self):
        """Iterate the epoch's batches; with cache_data_on_device the
        first epoch's collated batches stay device-resident and later
        epochs skip host collation + upload entirely."""
        if not self.cache_data_on_device:
            self.train_loader.set_epoch(self.epoch)
            yield from self.train_loader
            return
        if self._device_batches is None:
            self.train_loader.set_epoch(0)
            self._device_batches = [
                jax.tree.map(jax.numpy.asarray, b) for b in self.train_loader]
        order = np.random.default_rng(self.epoch).permutation(
            len(self._device_batches))
        for i in order:
            yield self._device_batches[i]

    def _ensure_sharded(self) -> None:
        """Lay the train state out over the mesh (params sharded by
        `param_shardings`, optimizer moments ZeRO-1 sharded by
        `opt_state_shardings`) before the first sharded step; re-runs
        after load_pretrained/resume replaced arrays."""
        if self.mesh is None or self._state_sharded:
            return
        from rvc_tpu.parallel.train import shard_state

        self.state = shard_state(self.state, self.mesh)
        self._state_sharded = True

    def train_epoch(self, adversarial: bool = True) -> dict:
        step_fn = self._get_step_fn(adversarial)
        self._ensure_sharded()
        if self.mesh is not None:
            from rvc_tpu.parallel.train import shard_batch
        agg = {}
        n = 0
        for batch in self._batches():
            self._rng, sub = jax.random.split(self._rng)
            if self.mesh is not None:
                batch = shard_batch(batch, self.mesh)
            self.state, metrics = step_fn(self.state, batch, sub)
            n += 1
            host = {k: float(v) for k, v in metrics.items()}
            for k, v in host.items():
                agg[k] = agg.get(k, 0.0) + v
            # rolling-50 scalar means, the torch trainer's tensorboard
            # cadence (`rvc/train/train.py:790-830`)
            smoothed = self._rolling.update(host)
            if n % self.log_every_steps == 0 and self._is_main:
                self.tracker.log_metrics(smoothed, int(self.state.step))
        return {k: v / max(n, 1) for k, v in agg.items()} | {"batches": n}

    # -- preemption handling (beyond reference: SURVEY §5 notes the
    # reference has no failure detection / elastic recovery) ----------
    def _install_preempt_handler(self):
        """SIGTERM (the pod scheduler's eviction signal) requests a
        graceful stop: finish the current epoch, checkpoint, exit 0.
        Returns the previous handler (None when not installable, e.g.
        in a non-main thread under tests)."""
        import signal

        self._preempt = False

        def handler(signum, frame):
            self._preempt = True

        try:
            return signal.signal(signal.SIGTERM, handler)
        except ValueError:
            return None

    def _preempt_requested(self) -> bool:
        """Cross-host agreement on the preempt flag: the signal may land
        on one host only, and a one-sided break would hang the others in
        the next epoch's collectives."""
        flag = bool(getattr(self, "_preempt", False))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.asarray([flag], dtype=np.int32))
            return bool(np.asarray(flags).any())
        return flag

    def train(self, epochs: int, save_every: int = 10,
              warmup_epochs: Optional[int] = None) -> dict:
        warmup = self.cfg.train.warmup_epochs if warmup_epochs is None else warmup_epochs
        history = []
        prev_handler = self._install_preempt_handler()
        try:
            self._train_epochs(epochs, warmup, save_every, history)
        finally:
            # restore the previous SIGTERM handler even when an epoch
            # raises — otherwise a dead trainer keeps intercepting the
            # scheduler's eviction signal for the rest of the process
            if prev_handler is not None:
                import signal

                signal.signal(signal.SIGTERM, prev_handler)
        self.save_checkpoint("last")
        self.tracker.close()
        return {"epochs_run": len(history), "history": history,
                "best_loss": self.best_loss,
                "preempted": bool(getattr(self, "_preempt_agreed", False)
                                  or getattr(self, "_preempt", False))}

    def _train_epochs(self, epochs: int, warmup: int, save_every: int,
                      history: list) -> None:
        for _ in range(epochs):
            t0 = time.time()
            adversarial = self.epoch >= warmup
            metrics = self.train_epoch(adversarial)
            metrics |= {"epoch": self.epoch, "adversarial": adversarial,
                        "seconds": round(time.time() - t0, 2)}
            history.append(metrics)
            if self._is_main:
                with open(self._log_path, "a") as f:
                    f.write(json.dumps(metrics) + "\n")
                self.tracker.log_metrics(
                    {k: v for k, v in metrics.items()
                     if isinstance(v, (int, float)) and np.isfinite(v)},
                    int(self.state.step), context={"subset": "epoch"})

            g_total = metrics.get("loss_g_total", float("inf"))
            if g_total < self.best_loss:
                self.best_loss = g_total
                self.save_checkpoint("best")
            if self.detector is not None and self.detector.update(self.epoch, g_total):
                self.save_checkpoint()
                break
            if self._preempt_requested():
                # record the cross-host AGREED decision: the signal may
                # have landed on a peer only. Increment the epoch FIRST
                # so the checkpoint's epoch metadata matches the regular
                # save path (which saves after the increment) — resuming
                # continues with the next epoch instead of re-running the
                # one that just completed.
                self._preempt_agreed = True
                done = self.epoch
                self.epoch += 1
                self.save_checkpoint(f"preempt_epoch_{done:04d}")
                if self._is_main:
                    print(f"preemption requested: checkpointed after epoch "
                          f"{done}, stopping cleanly (resume with "
                          f"trainer.resume('preempt_epoch_{done:04d}'))")
                break
            self.epoch += 1
            if self.epoch % save_every == 0:
                self.save_checkpoint("latest" if self.save_only_latest else None)
                if self.save_every_weights:
                    self.export_inference_model(os.path.join(
                        self.checkpoint_dir,
                        f"{self.model_name}_{self.epoch}e.safetensors"))
                self.render_eval_audio()
