"""Component benchmarks (the reference's `benchmarks/benchmark_components.py`
capability): per-stage latency with warmup + median, fixed seed.

Usage: python benchmarks/benchmark_components.py [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _median_time(fn, n=5):
    fn()  # warmup/compile
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=5.0)
    args = ap.parse_args()

    from rvc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from rvc_tpu.configs import get_config
    from rvc_tpu.models.hubert import HubertConfig, HubertModel
    from rvc_tpu.models.rmvpe import RMVPE
    from rvc_tpu.models.synthesizer import build_synthesizer

    results = {}
    sr16 = 16000
    T_samp = int(args.seconds * sr16)
    rng = np.random.default_rng(42)
    audio = jnp.asarray(rng.standard_normal((1, T_samp)).astype(np.float32) * 0.1)

    # RMVPE (5 s clip -> reference: 0.181 s on M3 Max)
    rmvpe = RMVPE(seed=0)
    mel = rmvpe.mel(audio)
    pad = 32 * ((mel.shape[1] - 1) // 32 + 1) - mel.shape[1]
    melp = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)), mode="reflect") if pad else mel

    def run_rmvpe():
        rmvpe._jit_forward(rmvpe.variables, melp).block_until_ready()

    results["rmvpe_s"] = _median_time(run_rmvpe)

    # HuBERT
    hubert = HubertModel(HubertConfig())
    hv = hubert.init(jax.random.PRNGKey(0), jnp.zeros((1, 1600)))
    hj = jax.jit(lambda v, a: hubert.apply(v, a))

    def run_hubert():
        hj(hv, audio).block_until_ready()

    results["hubert_s"] = _median_time(run_hubert)

    # TextEncoder alone (reference: 3.43 ms)
    cfg = get_config(48000, model_spk_embed_dim=4)
    net = build_synthesizer(cfg)
    T = int(args.seconds * 100)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    phone = jax.random.normal(ks[0], (1, T, 768))
    pitch = jax.random.randint(ks[1], (1, T), 1, 255)
    pitchf = jnp.full((1, T), 200.0)
    spec = jax.random.normal(ks[2], (1, T, cfg.data.spec_channels))
    variables = net.init({"params": ks[0], "noise": ks[1]}, phone,
                         jnp.array([T]), pitch, pitchf, spec,
                         jnp.array([T]), jnp.array([0]), rng=ks[3])
    enc_j = jax.jit(lambda v, ph, pi, l: net.apply(
        v, ph, pi, l, method=lambda s, ph, pi, l: s.enc_p(ph, pi, l)))

    def run_enc():
        jax.block_until_ready(enc_j(variables, phone, pitch, jnp.array([T])))

    results["text_encoder_s"] = _median_time(run_enc)

    # full synthesizer infer (flow + NSF-HiFiGAN decode)
    inf_j = jax.jit(lambda v, ph, l, pi, pf, s: net.apply(
        v, ph, l, pi, pf, s, method=net.infer))

    def run_synth():
        jax.block_until_ready(
            inf_j(variables, phone, jnp.array([T]), pitch, pitchf, jnp.array([0])))

    results["synthesizer_infer_s"] = _median_time(run_synth)

    results = {k: round(v, 5) for k, v in results.items()}
    results["audio_seconds"] = args.seconds
    results["rmvpe_rtf"] = round(args.seconds / results["rmvpe_s"], 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
