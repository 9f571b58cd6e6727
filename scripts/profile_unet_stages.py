"""Per-stage DeepUnet timing at the production f0 shape: cumulative
prefixes of the encoder/intermediate/decoder ladder, differenced to
per-stage cost. Locates which resolutions burn the 12 ms trunk."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.models.layers import BatchNorm, Conv2d
from rvc_tpu.models.rmvpe import DeepUnet, ResDecoderBlock, ResEncoderBlock
from rvc_tpu.utils.init_utils import cpu_backend, to_default_device


class UnetPrefix(nn.Module):
    """First `n_enc` encoder layers, then optionally `n_inter`
    intermediates and `n_dec` decoders (same names as DeepUnet so the
    real params apply)."""

    n_enc: int = 5
    n_inter: int = 0
    n_dec: int = 0
    n_blocks: int = 4

    @nn.compact
    def __call__(self, x):
        x = BatchNorm(1, momentum=0.01, name="encoder_bn")(x)
        skips = []
        cin, cout = 1, 16
        for i in range(self.n_enc):
            skip, x = ResEncoderBlock(cin, cout, self.n_blocks,
                                      name=f"encoder_layers_{i}")(x)
            skips.append(skip)
            cin, cout = cout, cout * 2
        inter_out = cin * 2
        for i in range(self.n_inter):
            x = ResEncoderBlock(cin if i == 0 else inter_out, inter_out,
                                self.n_blocks, pool=False,
                                name=f"intermediate_layers_{i}")(x)
        cin = inter_out
        for i in range(self.n_dec):
            cout = cin // 2
            x = ResDecoderBlock(cin, cout, self.n_blocks,
                                name=f"decoder_layers_{i}")(x, skips[-1 - i])
            cin = cout
        return x


def timed(name, fn, N=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    jax.block_until_ready(outs)
    per = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:40s} {per:8.3f} ms", flush=True)
    return per


def main():
    T = int(os.environ.get("T", "896"))  # production 6.75 s chunk ≈ 896
    mel = jnp.zeros((1, T, 128, 1), jnp.float32) + 0.1

    unet = DeepUnet()
    with cpu_backend():
        uvars = unet.init(jax.random.PRNGKey(0), mel)
    uvars = to_default_device(uvars)

    full = jax.jit(lambda v, m: unet.apply(v, m))
    t_full = timed("full unet", lambda: full(uvars, mel))

    prev = 0.0
    configs = ([(i, 0, 0, f"enc[:{i}]") for i in range(1, 6)]
               + [(5, i, 0, f"enc+inter[:{i}]") for i in range(1, 5)]
               + [(5, 4, i, f"enc+inter+dec[:{i}]") for i in range(1, 6)])
    for n_enc, n_inter, n_dec, name in configs:
        m = UnetPrefix(n_enc, n_inter, n_dec)
        fn = jax.jit(lambda v, x, m=m: m.apply(v, x))
        t = timed(f"{name} (cum)", lambda: fn(uvars, mel))
        print(f"    -> stage delta {t - prev:8.3f} ms", flush=True)
        prev = t


if __name__ == "__main__":
    main()
