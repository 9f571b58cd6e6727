"""Which component births the bf16 serving-policy error? Builds the
staged f32 oracle once (Pallas off, pinned f32 matmuls), then runs the
fused program under several env combos and scores each against the
oracle on wave corr, strict spec corr @80 dB, and the reference's
80-mel log-mel metric. (VERDICT r4 #2 diagnosis.)"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    import jax
    import jax.numpy as jnp

    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config
    from rvc_tpu.monitoring.voice_metrics import log_mel_correlation
    from rvc_tpu.pipelines.offline import _f16_in, _f16_out, coarse_f0
    from rvc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    audio = bench.synth_speech_like(13.5)
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)

    pl = rvc.pipeline
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

    combos = [
        ("policy: bf16 + resblock + attn", {"RVC_TPU_ONE_DISPATCH": "0"}),
        ("bf16, resblock OFF", {"RVC_TPU_ONE_DISPATCH": "0",
                                "RVC_TPU_PALLAS_RESBLOCK": "0"}),
        ("bf16, attn OFF", {"RVC_TPU_ONE_DISPATCH": "0",
                            "RVC_TPU_PALLAS_ATTN": "0"}),
        ("bf16, all pallas OFF", {"RVC_TPU_ONE_DISPATCH": "0",
                                  "RVC_TPU_PALLAS_RESBLOCK": "0",
                                  "RVC_TPU_PALLAS_ATTN": "0",
                                  "RVC_TPU_PALLAS_MEL": "0"}),
        ("f32, all pallas ON", {"RVC_TPU_ONE_DISPATCH": "0",
                                "RVC_TPU_BF16": "0"}),
        ("f32 default-precision, pallas OFF",
         {"RVC_TPU_ONE_DISPATCH": "0", "RVC_TPU_BF16": "0",
          "RVC_TPU_PALLAS_RESBLOCK": "0", "RVC_TPU_PALLAS_ATTN": "0",
          "RVC_TPU_PALLAS_MEL": "0"}),
    ]
    outs = {}
    for name, env in combos:
        out = with_env(env, run_fused)
        outs[name] = out
        corr, wcorr = bench._corrs(staged, out, top_db=80.0)
        lcorr = log_mel_correlation(staged, out, pl.tgt_sr)
        print(json.dumps({"leg": name, "wave": round(float(wcorr), 6),
                          "spec80": round(float(corr), 4),
                          "logmel": round(float(lcorr), 4)}), flush=True)

    # the policy INCREMENT: bf16 policy vs the f32 default-precision
    # graph — both in the TPU's native matmul regime, so this isolates
    # what the serving policy itself adds on top of hardware defaults
    a = outs["policy: bf16 + resblock + attn"]
    b = outs["f32, all pallas ON"]
    corr, wcorr = bench._corrs(b, a, top_db=80.0)
    lcorr = log_mel_correlation(b, a, pl.tgt_sr)
    print(json.dumps({"leg": "INCREMENT policy vs f32-default",
                      "wave": round(float(wcorr), 6),
                      "spec80": round(float(corr), 4),
                      "logmel": round(float(lcorr), 4)}), flush=True)


if __name__ == "__main__":
    main()
