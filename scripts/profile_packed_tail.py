"""A/B of the packed-lane decoder tail (`ops/packed_tail.py`): NSF
decoder + numerical check with RVC_TPU_PACKED_TAIL=0 vs 1 at the 13.5 s
clip shape, pipelined x10 per variant so dispatch amortizes."""

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
    os.environ.setdefault("RVC_TPU_PALLAS_RESBLOCK", "1")
    audio = synth_speech_like(13.5)
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    pipe = rvc.pipeline
    from rvc_tpu.utils import audio as audio_utils
    a = audio_utils.highpass_filter(audio.astype(np.float32), 16000, 48.0, 5)
    chunk = np.pad(a, (pipe.t_pad, pipe.t_pad), mode="reflect")
    n_pad = pipe._bucket_samples(len(chunk))
    audio_np = np.pad(chunk.astype(np.float32), (0, n_pad - len(chunk)),
                      mode="reflect")
    audio_j = jax.device_put(audio_np[None], jax.devices()[0])

    net = pipe.synthesizer
    sv = pipe.synth_variables
    hv = pipe.hubert_variables
    feats = jax.jit(lambda v, x: pipe.hubert.apply(
        v, x, output_hidden_states=True))(hv, audio_j)
    t_feat = feats.shape[1] * 2
    feats_up = jnp.repeat(feats, 2, axis=1)
    p_len_j = jnp.array([min(len(chunk) // 160, t_feat)])
    sid_j = jnp.array([0])
    pitchf = jnp.full((1, t_feat), 200.0)
    pitch = jnp.full((1, t_feat), 128, dtype=jnp.int32)

    def encflow(m, phone, pitch, lengths, sid):
        g = m.emb_g(sid)[:, None, :]
        m_p, logs_p, x_mask = m.enc_p(phone, pitch, lengths)
        return m.flow(m_p * x_mask, x_mask, g=g, reverse=True) * x_mask

    z = jax.jit(lambda v, ph, pi, l, s: net.apply(
        v, ph, pi, l, s, method=encflow))(sv, feats_up, pitch, p_len_j, sid_j)

    def deconly(m, z, nsff0, sid):
        g = m.emb_g(sid)[:, None, :]
        return m.dec(z.astype(jnp.float32), nsff0, g=g.astype(jnp.float32))

    outs = {}
    for tail in ("0", "1"):
        os.environ["RVC_TPU_PACKED_TAIL"] = tail
        dec_j = jax.jit(lambda v, z, f0, s: net.apply(
            v, z, f0, s, method=deconly))
        outs[tail] = np.asarray(dec_j(sv, z, pitchf, sid_j))
        timed(f"decoder (packed_tail={tail})",
              lambda: dec_j(sv, z, pitchf, sid_j))
    d = outs["1"] - outs["0"]
    corr = np.corrcoef(outs["1"].ravel(), outs["0"].ravel())[0, 1]
    print(f"parity: corr {corr:.6f}  max|d| {np.abs(d).max():.3e}")

    # full fused conversion program through the pipeline (e2e per chunk)
    for tail in ("0", "1"):
        os.environ["RVC_TPU_PACKED_TAIL"] = tail
        out = rvc.infer(audio)  # retrace (knob in _graph_knobs)
        t0 = time.perf_counter()
        for _ in range(5):
            out = np.asarray(rvc.infer(audio))
        print(f"e2e infer (packed_tail={tail})      "
              f"{(time.perf_counter()-t0)/5*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
