"""Host/link critical-path breakdown for the serving pipeline
(VERDICT r3 #6: link_host_share is ~0.58 of wall — profile the host
side with the same rigor the device side got).

Measures, per 13.5 s clip conversion on the production config:
  - host spans from the pipeline's own trace_span instrumentation
    (highpass, pad+upload, dispatch, fetch/materialize, post)
  - link RTT (tiny-scalar round trip) and D2H throughput (cached
    device buffer -> host), to attribute the non-span remainder
  - wall A/B across serving modes: per-chunk deferred dispatch
    (default), RVC_TPU_CHUNK_BATCH=1 (one execute+fetch per bucket
    group), and chunk sizes

Run on the TPU (exclusive): `python scripts/profile_host.py`
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rtt_and_d2h():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    x = jax.device_put(np.float32(1.0), dev)
    f = jax.jit(lambda a: a + 1)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        np.asarray(f(x))  # execute + fetch round trip
    rtt = (time.perf_counter() - t0) / n

    big = jax.device_put(np.zeros(4 << 20, np.float16), dev)  # 8 MB
    bump = jax.jit(lambda a, i: a + i.astype(a.dtype))
    jax.block_until_ready(bump(big, jnp.float32(0)))
    t0 = time.perf_counter()
    n_big = 5
    for i in range(n_big):
        # fresh output each round — re-fetching the SAME array returns
        # the cached host copy and measures memcpy, not the link
        np.asarray(bump(big, jnp.float32(i + 1)))
    # includes one execute RTT per round; subtract the measured RTT so
    # the number approximates pure transfer throughput
    per = (time.perf_counter() - t0) / n_big - rtt
    d2h_mbps = big.nbytes / 1e6 / max(per, 1e-9)
    return rtt, d2h_mbps


def main():
    os.environ["RVC_TPU_TRACE"] = "1"
    os.environ.setdefault("RVC_TPU_CHUNK_S", "6.75")
    import jax

    import bench
    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config
    from rvc_tpu.utils.jax_setup import enable_compilation_cache
    from rvc_tpu.utils.profiling import global_tracer

    enable_compilation_cache()
    audio = bench.synth_speech_like(13.5)
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    rvc.index = bench.bench_index()
    kwargs = dict(sid=0, pitch=0.0, f0_method="rmvpe", protect=0.5)

    def timed(n=5, **extra):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(rvc.infer(audio, index_rate=0.75, **kwargs, **extra))
            times.append(time.perf_counter() - t0)
        return sorted(times)[len(times) // 2]

    # warmup + span capture on the default serving mode
    rvc.infer(audio, index_rate=0.75, **kwargs)
    tracer = global_tracer()
    tracer.totals.clear()
    tracer.counts.clear()
    wall_default = timed()
    spans_default = tracer.summary()

    rtt, d2h_mbps = rtt_and_d2h()

    results = {"wall_default_ms": round(1000 * wall_default, 1),
               "spans_default": spans_default,
               "link_rtt_ms": round(1000 * rtt, 2),
               "d2h_MBps": round(d2h_mbps, 1)}

    # A/B: chunk-batched single dispatch
    os.environ["RVC_TPU_CHUNK_BATCH"] = "1"
    rvc.infer(audio, index_rate=0.75, **kwargs)  # compile batch shape
    tracer.totals.clear()
    tracer.counts.clear()
    results["wall_chunk_batch_ms"] = round(1000 * timed(), 1)
    results["spans_chunk_batch"] = tracer.summary()
    os.environ.pop("RVC_TPU_CHUNK_BATCH")

    # A/B: single-chunk (no CHUNK_S pipelining)
    os.environ["RVC_TPU_CHUNK_S"] = "0"
    rvc.infer(audio, index_rate=0.75, **kwargs)
    results["wall_single_chunk_ms"] = round(1000 * timed(), 1)
    os.environ["RVC_TPU_CHUNK_S"] = "6.75"

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
