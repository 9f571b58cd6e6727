"""Decisive A/B: f32 vs bf16 for the conversion program pieces, with
chained ops inside one jit so tunnel dispatch cannot mask device time."""

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
from rvc_tpu.ops import conv as conv_ops


def timed(name, fn, N=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    jax.block_until_ready(outs)
    print(f"{name:44s} {(time.perf_counter()-t0)/N*1e3:8.2f} ms/call")


def main():
    T = 1552
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)

    # 20 chained k=5 convs, f32 vs bf16 storage (f32 accum both)
    for dt, nm in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        x = jax.random.normal(ks[0], (1, T, 384), dtype=jnp.float32).astype(dt)
        w = (jax.random.normal(ks[1], (5, 384, 384)) * 0.02).astype(dt)

        @jax.jit
        def chain(x, w):
            for _ in range(20):
                x = conv_ops.conv1d(x, w, None, padding=2) * 0.5
            return x
        timed(f"20x conv k=5 384->384 {nm} (per-conv below)",
              lambda: chain(x, w))

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

    net = pipe.synthesizer
    sv = pipe.synth_variables
    hv = pipe.hubert_variables
    from rvc_tpu.pipelines.offline import _cast_float_tree

    hub_j = jax.jit(lambda v, x: pipe.hubert.apply(v, x, output_hidden_states=True))
    feats = hub_j(hv, audio_j)
    t_feat = feats.shape[1] * 2
    feats_up = jnp.repeat(feats, 2, axis=1)
    p_len_j = jnp.array([min(n // 160, t_feat)])
    sid_j = jnp.array([0])
    pitch = jnp.full((1, t_feat), 128, dtype=jnp.int32)

    def encflow(m, phone, pitch, lengths, sid):
        g = m.emb_g(sid)[:, None, :]
        m_p, logs_p, x_mask = m.enc_p(phone, pitch, lengths)
        return m.flow(m_p * x_mask, x_mask, g=g, reverse=True) * x_mask

    ef_j = jax.jit(lambda v, ph, pi, l, s: net.apply(v, ph, pi, l, s,
                                                     method=encflow))
    timed("enc_p+flow f32", lambda: ef_j(sv, feats_up, pitch, p_len_j, sid_j))

    sv16 = _cast_float_tree(sv, jnp.bfloat16)
    f16 = feats_up.astype(jnp.bfloat16)
    timed("enc_p+flow bf16", lambda: ef_j(sv16, f16, pitch, p_len_j, sid_j))

    hv16 = _cast_float_tree(hv, jnp.bfloat16)
    a16 = audio_j.astype(jnp.bfloat16)
    timed("hubert f32", lambda: hub_j(hv, audio_j))
    timed("hubert bf16", lambda: hub_j(hv16, a16))

    # full conversion program, f32 vs bf16 policy
    rmvpe = pipe._get_rmvpe()
    pipe._rmvpe_model = rmvpe.model
    os.environ["RVC_TPU_BF16"] = "0"
    pipe.refresh()
    f0p, convp = pipe._get_packed(False, rmvpe)
    sb, hb, rb = pipe._packed["bufs"]
    f0 = f0p(rb, audio_j, 0.0, 0.0)
    timed("conv program f32",
          lambda: convp(sb, hb, audio_j, f0, sid_j, p_len_j, 0.5))

    os.environ["RVC_TPU_BF16"] = "1"
    pipe.refresh()
    f0p2, convp2 = pipe._get_packed(False, rmvpe)
    sb2, hb2, rb2 = pipe._packed["bufs"]
    f02 = f0p2(rb2, audio_j, 0.0, 0.0)
    timed("conv program bf16 policy",
          lambda: convp2(sb2, hb2, audio_j, f02, sid_j, p_len_j, 0.5))

    # e2e with BF16 + f16 in/out
    os.environ["RVC_TPU_F16_IN"] = "1"
    os.environ["RVC_TPU_F16_OUT"] = "1"
    pipe.refresh()
    kwargs = dict(sid=0, pitch=0.0, f0_method="rmvpe", index_rate=0.0,
                  volume_envelope=1.0, protect=0.5)
    rvc.infer(audio, **kwargs)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(rvc.infer(audio, **kwargs))
        ts.append(time.perf_counter() - t0)
    m = sorted(ts)[2]
    print(f"e2e bf16+f16io: {m*1e3:.1f} ms ({duration/m:.1f}x rt)")


if __name__ == "__main__":
    main()
