"""Does a brief deterministic training run tame the random-weight
chaos that blocks the 0.95 perceptual bar on-chip? (VERDICT r4 #2.)

Trains the synthesizer generator for N warmup (mel-loss) steps on
deterministic synthetic speech, swaps the trained params into the
serving pipeline, and re-measures staged-f32-oracle vs fused-policy
parity on the same deterministic voiced chunk as bench.self_check.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def make_batch(cfg, B, T, seed):
    import jax.numpy as jnp

    from rvc_tpu.train.train_step import Batch

    rng = np.random.default_rng(seed)
    hop = cfg.data.hop_length
    f0 = np.tile(bench.synth_f0_track(T)[None], (B, 1))
    # mel-consistent "speech": wave from the f0 track so the mel target
    # correlates with the pitch conditioning
    t = np.arange(T * hop) / cfg.data.sample_rate
    f0_up = np.repeat(f0, hop, axis=1)
    phase = 2 * np.pi * np.cumsum(f0_up, axis=1) / cfg.data.sample_rate
    wave = 0.3 * np.sin(phase) + 0.12 * np.sin(2 * phase)
    wave += 0.02 * rng.standard_normal(wave.shape)
    return Batch(
        phone=jnp.asarray(0.3 * rng.standard_normal(
            (B, T, cfg.model.text_enc_hidden_dim)), jnp.float32),
        phone_lengths=jnp.full((B,), T, jnp.int32),
        pitch=jnp.asarray(np.clip(rng.integers(1, 256, (B, T)), 1, 255),
                          jnp.int32),
        pitchf=jnp.asarray(f0, jnp.float32),
        spec=jnp.asarray(np.abs(rng.standard_normal(
            (B, T, cfg.data.spec_channels))) * 0.1, jnp.float32),
        spec_lengths=jnp.full((B,), T, jnp.int32),
        wave=jnp.asarray(wave, jnp.float32),
        sid=jnp.zeros((B,), jnp.int32),
    )


def main():
    import jax
    import jax.numpy as jnp

    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config
    from rvc_tpu.monitoring.voice_metrics import log_mel_correlation
    from rvc_tpu.pipelines.offline import _f16_in, _f16_out, coarse_f0
    from rvc_tpu.train.train_step import create_train_state, make_train_step
    from rvc_tpu.utils.init_utils import cpu_backend, to_default_device
    from rvc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    n_steps = int(os.environ.get("STEPS", "300"))
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    pl = rvc.pipeline

    # ---- train
    with cpu_backend():
        state, net_g, net_d = create_train_state(
            cfg, jax.random.PRNGKey(0), 100,
            synthesizer=pl.synthesizer)
    state = to_default_device(state)
    step = make_train_step(cfg, net_g, net_d, 100, adversarial=False)
    batch = make_batch(cfg, 4, 120, seed=3)
    rng = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    st, metrics = step(state, batch, rng)
    jax.block_until_ready(st.step)
    print(f"train compile+1: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(n_steps - 1):
        st, metrics = step(st, batch, rng)
    jax.block_until_ready(st.step)
    print(f"{n_steps} steps: {time.perf_counter()-t0:.1f}s "
          f"mel={float(metrics['loss_mel']):.3f}", flush=True)

    # ---- swap trained G into the serving pipeline
    pl.synth_variables = {"params": jax.tree.map(np.asarray, st.g_params)}
    pl._packed_dtype = None  # invalidate packed buffers
    pl._fused = {}

    # ---- measure policy parity on the trained weights
    audio = bench.synth_speech_like(13.5)
    t_pad = pl.t_pad
    pad_tgt = pl.tgt_sr * pl.config.x_pad
    chunk = np.pad(audio[: int(4.0 * 16000)], (t_pad, t_pad),
                   mode="reflect")
    p_len = len(chunk) // pl.window
    in_dtype = np.float16 if _f16_in() else np.float32
    chunk_q = chunk.astype(in_dtype).astype(np.float32)
    rmvpe = pl._get_rmvpe()
    pl._rmvpe_model = rmvpe.model
    n_pad = pl._bucket_samples(len(chunk))
    audio_np = np.pad(chunk, (0, n_pad - len(chunk)),
                      mode="reflect").astype(in_dtype)
    f0_full = bench.synth_f0_track(n_pad // pl.window)
    f0_host = f0_full[:p_len]

    def with_env(env, fn):
        prev = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            return fn()
        finally:
            for k, v in prev.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    def run_fused():
        _, convp = pl._get_packed(False, rmvpe,
                                  trim_frames=t_pad // pl.window)
        sb, hb, _ = pl._packed["bufs"]
        out = convp(sb, hb, jnp.asarray(audio_np)[None],
                    jnp.asarray(f0_full)[None],
                    jnp.asarray([0], np.int32),
                    jnp.asarray([p_len], np.int32), jnp.float32(0.5))
        return pl._materialize(out, p_len, t_pad // pl.window)

    oracle_env = {"RVC_TPU_BF16": "0", "RVC_TPU_PALLAS_RESBLOCK": "0",
                  "RVC_TPU_PALLAS_ATTN": "0", "RVC_TPU_PALLAS_MEL": "0",
                  "RVC_TPU_ONE_DISPATCH": "0"}

    def run_oracle():
        with jax.default_matmul_precision("float32"):
            staged = pl.voice_conversion(chunk_q, coarse_f0(f0_host),
                                         f0_host, 0, None, 0.0, 0.5)
            return staged[pad_tgt:-pad_tgt]

    staged = with_env(oracle_env, run_oracle)
    if _f16_out():
        staged = staged.astype(np.float16).astype(np.float32)
    policy = with_env({"RVC_TPU_ONE_DISPATCH": "0"}, run_fused)
    corr, wcorr = bench._corrs(staged, policy, top_db=80.0)
    lcorr = log_mel_correlation(staged, policy, pl.tgt_sr)
    rms = float(np.sqrt(np.mean(staged**2)))
    print(json.dumps({"steps": n_steps, "out_rms": round(rms, 5),
                      "wave": round(float(wcorr), 6),
                      "spec80": round(float(corr), 4),
                      "logmel": round(float(lcorr), 4)}), flush=True)


if __name__ == "__main__":
    main()
