"""Sub-piece breakdown of the conversion program: HuBERT vs enc_p+flow
vs NSF-HiFiGAN decoder, each as its own pipelined program (x10, one
barrier) so dispatch amortizes and the number approaches device compute."""

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
    fn().block_until_ready()
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    jax.block_until_ready(outs)
    print(f"{name:34s} {(time.perf_counter()-t0)/N*1e3:8.1f} ms/call")


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

    net = pipe.synthesizer
    sv = pipe.synth_variables
    hv = pipe.hubert_variables
    hubert = pipe.hubert

    hub_j = jax.jit(lambda v, x: hubert.apply(v, x, output_hidden_states=True))
    feats = hub_j(hv, audio_j)
    t_feat = feats.shape[1] * 2
    feats_up = jnp.repeat(feats, 2, axis=1)
    p_len_j = jnp.array([min(n // 160, t_feat)])
    sid_j = jnp.array([0])
    pitchf = jnp.full((1, t_feat), 200.0)
    pitch = jnp.full((1, t_feat), 128, dtype=jnp.int32)

    timed("hubert (f32)", lambda: hub_j(hv, audio_j))

    def encflow(m, phone, pitch, lengths, sid):
        g = m.emb_g(sid)[:, None, :]
        m_p, logs_p, x_mask = m.enc_p(phone, pitch, lengths)
        return m.flow(m_p * x_mask, x_mask, g=g, reverse=True) * x_mask

    ef_j = jax.jit(lambda v, ph, pi, l, s: net.apply(v, ph, pi, l, s,
                                                     method=encflow))
    z = ef_j(sv, feats_up, pitch, p_len_j, sid_j)
    timed("enc_p + flow (f32)", lambda: ef_j(sv, feats_up, pitch, p_len_j, sid_j))

    def deconly(m, z, nsff0, sid):
        g = m.emb_g(sid)[:, None, :]
        return m.dec(z.astype(jnp.float32), nsff0, g=g.astype(jnp.float32))

    dec_j = jax.jit(lambda v, z, f0, s: net.apply(v, z, f0, s, method=deconly))
    timed("decoder NSF-HiFiGAN (pallas rb)", lambda: dec_j(sv, z, pitchf, sid_j))

    os.environ["RVC_TPU_PALLAS_RESBLOCK"] = "0"
    dec_x = jax.jit(lambda v, z, f0, s: net.apply(v, z, f0, s, method=deconly))
    timed("decoder NSF-HiFiGAN (xla rb)", lambda: dec_x(sv, z, pitchf, sid_j))
    os.environ["RVC_TPU_PALLAS_RESBLOCK"] = "1"

    # full synth infer for reference
    inf_j = jax.jit(lambda v, ph, l, pi, pf, s: net.apply(
        v, ph, l, pi, pf, s, method=net.infer))
    timed("synthesizer.infer (full)",
          lambda: inf_j(sv, feats_up, p_len_j, pitch, pitchf, sid_j)[0])


if __name__ == "__main__":
    main()
