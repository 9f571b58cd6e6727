"""f0 program dispatch variants: packed single-buffer vs raw pytree vs
frozen constants — plus clean mel/bigru/decode components (idle host)."""

import os, sys, time
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
    print(f"{name:46s} {per:8.3f} ms", flush=True)
    return per


def main():
    audio = synth_speech_like(13.5)
    cfg = get_config(48000, model_spk_embed_dim=4)
    rvc = RVC(config=cfg, seed=0)
    pipe = rvc.pipeline
    rmvpe = pipe._get_rmvpe()
    pipe._rmvpe_model = rmvpe.model

    a = np.pad(audio, (pipe.t_pad, pipe.t_pad), mode="reflect")
    n_pad = pipe._bucket_samples(len(a))
    a = np.pad(a, (0, n_pad - len(a)), mode="reflect")
    a16 = jnp.asarray(a[None].astype(np.float16))
    z = pipe._dev_scalar("f", 0.0, np.float32, vec=False)

    fn_f0 = pipe._build_f0_program()
    raw = jax.jit(fn_f0)
    timed("f0 raw pytree (~600 handles)", lambda: raw(rmvpe.variables, a16, z, z))

    from rvc_tpu.utils.packing import pack_tree, unpack_tree
    rb, rs = pack_tree(rmvpe.variables)
    packed = jax.jit(lambda b, au, p, t: fn_f0(unpack_tree(b, rs), au, p, t))
    timed("f0 packed (1 buffer + unpack)", lambda: packed(rb, a16, z, z))

    t0 = time.perf_counter()
    frozen = jax.jit(lambda au, p, t: fn_f0(rmvpe.variables, au, p, t))
    jax.block_until_ready(frozen(a16, z, z))
    print(f"  (frozen compile: {time.perf_counter()-t0:.1f} s)", flush=True)
    timed("f0 frozen constants", lambda: frozen(a16, z, z))

    from rvc_tpu.ops.pallas.melspec import pallas_log_mel
    mel_fn = jax.jit(lambda x: pallas_log_mel(
        x.astype(jnp.float32), 1024, 160, 128, 16000, 30.0, 8000.0, htk=True))
    timed("pallas mel (clean)", lambda: mel_fn(a16))

    from rvc_tpu.ops.gru import bigru
    p = rmvpe.variables["params"]
    fwd = {k: p[f"gru_fwd_{k}"] for k in
           ("weight_ih", "weight_hh", "bias_ih", "bias_hh")}
    bwd = {k: p[f"gru_bwd_{k}"] for k in
           ("weight_ih", "weight_hh", "bias_ih", "bias_hh")}
    T = n_pad // 160
    x = jnp.zeros((1, ((T + 31) // 32) * 32, 384), jnp.float32)
    g = jax.jit(lambda xx: bigru(xx, fwd, bwd))
    timed(f"bigru (T={x.shape[1]}, clean)", lambda: g(x))

    from rvc_tpu.models.rmvpe import decode_salience
    h = jnp.zeros((1, T, 360), jnp.float32)
    d = jax.jit(lambda hh: decode_salience(hh, 0.03))
    timed("decode_salience (clean)", lambda: d(h))


if __name__ == "__main__":
    main()
