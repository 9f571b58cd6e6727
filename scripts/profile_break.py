"""Current sub-piece breakdown of the fused conversion path: upload,
f0 program, HuBERT, enc_p, flow, decoder, conv program, download, e2e.
Each timed as pipelined x10 with one barrier so dispatch amortizes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import synth_speech_like
from rvc_tpu.api import RVC
from rvc_tpu.configs import get_config


def timed(name, fn, N=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    jax.block_until_ready(outs)
    per = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:44s} {per:8.2f} ms/call", flush=True)
    return per


def main():
    duration = 13.5
    audio = synth_speech_like(duration)
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    pipe = rvc.pipeline
    from rvc_tpu.utils import audio as audio_utils

    a = audio_utils.highpass_filter(audio.astype(np.float32), 16000, 48.0, 5)
    chunk = np.pad(a, (pipe.t_pad, pipe.t_pad), mode="reflect")
    n = len(chunk)
    n_pad = pipe._bucket_samples(n)
    audio_np = np.pad(chunk.astype(np.float32), (0, n_pad - n), mode="reflect")
    dev = jax.devices()[0]
    audio_j = jax.device_put(audio_np[None], dev)
    a16_host = audio_np[None].astype(np.float16)

    net = pipe.synthesizer
    sv = pipe.synth_variables
    hv = pipe.hubert_variables

    hub_j = jax.jit(lambda v, x: pipe.hubert.apply(v, x, output_hidden_states=True))
    feats = hub_j(hv, audio_j)
    t_feat = feats.shape[1] * 2
    feats_up = jnp.repeat(feats, 2, axis=1)
    p_len_j = jnp.array([min(n // 160, t_feat)])
    sid_j = jnp.array([0])
    pitch = jnp.full((1, t_feat), 128, dtype=jnp.int32)

    timed("upload f16 audio", lambda: jax.device_put(a16_host, dev))
    timed("hubert (12L transformer)", lambda: hub_j(hv, audio_j))

    def enconly(m, phone, pitch, lengths):
        return m.enc_p(phone, pitch, lengths)[0]
    eo_j = jax.jit(lambda v, ph, pi, l: net.apply(v, ph, pi, l, method=enconly))
    timed("enc_p", lambda: eo_j(sv, feats_up, pitch, p_len_j))

    def flowonly(m, phone, pitch, lengths, sid):
        g = m.emb_g(sid)[:, None, :]
        m_p, logs_p, x_mask = m.enc_p(phone, pitch, lengths)
        return m.flow(m_p * x_mask, x_mask, g=g, reverse=True) * x_mask
    fl_j = jax.jit(lambda v, ph, pi, l, s: net.apply(v, ph, pi, l, s, method=flowonly))
    t_ef = timed("enc_p+flow", lambda: fl_j(sv, feats_up, pitch, p_len_j, sid_j))

    z = fl_j(sv, feats_up, pitch, p_len_j, sid_j)
    nsff0 = jnp.full((1, t_feat), 220.0)

    def deconly(m, z, nsff0, sid):
        g = m.emb_g(sid)[:, None, :]
        return m.dec(z, nsff0, g=g)
    de_j = jax.jit(lambda v, z, f, s: net.apply(v, z, f, s, method=deconly))
    timed("decoder (NSF-HiFiGAN)", lambda: de_j(sv, z, nsff0, sid_j))

    rmvpe = pipe._get_rmvpe()
    pipe._rmvpe_model = rmvpe.model
    f0p, convp = pipe._get_packed(False, rmvpe)
    sb, hb, rb = pipe._packed["bufs"]
    a16 = audio_j.astype(jnp.float16)
    f0 = f0p(rb, a16, 0.0, 0.0)
    timed("f0 program", lambda: f0p(rb, a16, 0.0, 0.0))
    out = convp(sb, hb, a16, f0, sid_j, p_len_j, 0.5)
    timed("conv program", lambda: convp(sb, hb, a16, f0, sid_j, p_len_j, 0.5))
    timed("download output", lambda: np.asarray(out))

    kwargs = dict(sid=0, pitch=0.0, f0_method="rmvpe", index_rate=0.0,
                  volume_envelope=1.0, protect=0.5)
    rvc.infer(audio, **kwargs)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(rvc.infer(audio, **kwargs))
        ts.append(time.perf_counter() - t0)
    m = sorted(ts)[3]
    print(f"e2e: {m*1e3:.1f} ms ({duration/m:.1f}x rt)", flush=True)

    if os.environ.get("RVC_TPU_TRACE", "0") == "1":
        from rvc_tpu.utils.profiling import global_tracer
        import json
        print(json.dumps(global_tracer().summary(), indent=1), flush=True)


if __name__ == "__main__":
    main()
