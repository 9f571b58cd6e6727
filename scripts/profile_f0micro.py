"""f0-stage microbenchmark (VERDICT r4 #3): time each sub-stage of the
RMVPE f0 program in isolation at the production chunk shape, plus the
BiGRU scan at several unroll factors, to locate the 7.65 ms.

Sub-stages: mel (Pallas + XLA), U-Net conv trunk alone, 3ch head +
reshape, BiGRU alone, fc+sigmoid, decode. Each is its own jitted
program timed with a deep queue (link RTT overlapped).
"""

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
from rvc_tpu.models.rmvpe import E2E, DeepUnet, decode_salience
from rvc_tpu.ops.gru import bigru
from rvc_tpu.pipelines.offline import WINDOW


def timed(name, fn, N=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    jax.block_until_ready(outs)
    per = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:52s} {per:8.3f} ms", flush=True)
    return per


def main():
    # production chunk shape: 6.75 s + 2x1 s reflect pad, bucketed
    os.environ.setdefault("RVC_TPU_CHUNK_S", "6.75")
    os.environ["RVC_TPU_ONE_DISPATCH"] = "0"  # f0 program separable
    audio = synth_speech_like(13.5)
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    pipe = rvc.pipeline
    rmvpe = pipe._get_rmvpe()
    model = rmvpe.model
    rvars = rmvpe.variables

    bounds = pipe.chunk_bounds(audio)
    s, e = bounds[0]
    ap = np.pad(audio, (pipe.t_pad, pipe.t_pad), mode="reflect")
    chunk = ap[s : e + 2 * pipe.t_pad]
    n_pad = pipe._bucket_samples(len(chunk))
    a = np.pad(chunk, (0, n_pad - len(chunk)), mode="reflect")
    a16 = jnp.asarray(a[None].astype(np.float16))
    print(f"chunk samples={n_pad} frames={n_pad // WINDOW}")

    from rvc_tpu.ops.pallas.melspec import pallas_log_mel
    from rvc_tpu.ops.stft import log_mel_spectrogram

    def mel_p(x):
        return pallas_log_mel(x.astype(jnp.float32), 1024, WINDOW, 128,
                              16000, 30.0, 8000.0, htk=True)

    mel_fn = jax.jit(mel_p)
    mel_dev = jax.block_until_ready(mel_fn(a16))
    n_frames = mel_dev.shape[1]
    pad = 32 * ((n_frames - 1) // 32 + 1) - n_frames
    melp = jnp.pad(mel_dev, ((0, 0), (0, pad), (0, 0)), mode="reflect")
    T = melp.shape[1]
    print(f"mel frames={n_frames} padded={T}")

    timed("mel (pallas)", lambda: mel_fn(a16))
    xla_mel = jax.jit(lambda x: log_mel_spectrogram(
        x.astype(jnp.float32), 1024, 128, 16000, WINDOW, 1024,
        fmin=30, fmax=8000, htk=True))
    timed("mel (XLA fft)", lambda: xla_mel(a16))

    # U-Net trunk alone (no GRU head): n_gru=0 variant shares the unet
    # params; build a direct DeepUnet apply — packed knob on/off A/B
    unet = DeepUnet()
    uvars = {"params": rvars["params"]["unet"],
             "batch_stats": rvars["batch_stats"]["unet"]}
    for knob in ("0", "1"):
        os.environ["RVC_TPU_PACKED_UNET"] = knob
        unet_fn = jax.jit(lambda v, m, k=knob: unet.apply(v, m[:, :, :, None]))
        timed(f"unet trunk (packed={knob})", lambda: unet_fn(uvars, melp))

        e2e_fn = jax.jit(lambda v, m, k=knob: model.apply(v, m))
        hidden = jax.block_until_ready(e2e_fn(rvars, melp))
        timed(f"e2e (packed={knob})", lambda: e2e_fn(rvars, melp))
    del os.environ["RVC_TPU_PACKED_UNET"]

    # BiGRU alone at (1, T, 384) for several unrolls
    x_gru = jnp.zeros((1, T, 384), jnp.float32) + 0.1
    p = rvars["params"]
    fwd = {k.replace("gru_fwd_", ""): p[k] for k in p if k.startswith("gru_fwd")}
    bwd = {k.replace("gru_bwd_", ""): p[k] for k in p if k.startswith("gru_bwd")}
    for u in (1, 2, 4, 8, 16, 32):
        f = jax.jit(lambda x, u=u: bigru(x, fwd, bwd, unroll=u))
        timed(f"bigru unroll={u}", lambda: f(x_gru))

    # decode alone
    dec_fn = jax.jit(lambda h: decode_salience(h, 0.03))
    timed("decode", lambda: dec_fn(hidden))

    # the whole production f0 program (packed, current env)
    pipe._rmvpe_model = rmvpe.model
    f0p, _ = pipe._get_packed(True, rmvpe, trim_frames=pipe.t_pad // WINDOW)
    rb = pipe._packed["bufs"][2]
    zero = jnp.float32(0.0)
    timed("PRODUCTION f0 program", lambda: f0p(rb, a16, zero, zero))


if __name__ == "__main__":
    main()
