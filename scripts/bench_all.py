"""Consolidated perf refresh (one process): single-stream e2e, batched
throughput (BatchConverter, 8 x 10 s), realtime block latency
(VoiceChanger, 512 ms blocks), training GAN step."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import synth_speech_like


def main():
    import jax
    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config

    duration = 13.5
    audio = synth_speech_like(duration)
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    kwargs = dict(sid=0, pitch=0.0, f0_method="rmvpe", index_rate=0.0,
                  volume_envelope=1.0, protect=0.5)

    np.asarray(rvc.infer(audio, **kwargs))
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        np.asarray(rvc.infer(audio, **kwargs))
        ts.append(time.perf_counter() - t0)
    m = sorted(ts)[4]
    print(f"e2e single-stream: {m*1e3:.1f} ms ({duration/m:.1f}x rt)",
          flush=True)

    # batched throughput: 8 x 10 s on the single-chip mesh
    from jax.sharding import Mesh
    from rvc_tpu.parallel.infer import BatchConverter

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    bc = BatchConverter(rvc, mesh)
    batch = np.stack([synth_speech_like(10.0, seed=i) for i in range(8)])
    bc.convert_batch(batch)  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = bc.convert_batch(batch)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    m = sorted(ts)[2]
    print(f"batched 8x10s: {m:.3f} s/batch -> {80.0/m:.1f} audio-s/s",
          flush=True)

    # realtime: 512 ms @ 48 kHz blocks
    from rvc_tpu.realtime.core import VoiceChanger

    vc = VoiceChanger(rvc, read_chunk_size=192,
                      cross_fade_overlap_size=0.1, extra_convert_size=0.5)
    block = (0.1 * np.random.default_rng(0)
             .standard_normal(192 * 128)).astype(np.float32)
    for _ in range(2):
        vc.process_audio(block)  # compile + warm
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        vc.process_audio(block)
        ts.append(time.perf_counter() - t0)
    m = sorted(ts)[3]
    print(f"realtime 512ms block: {m*1e3:.1f} ms/block "
          f"({512.0/(m*1e3):.1f}x headroom)", flush=True)


if __name__ == "__main__":
    main()
