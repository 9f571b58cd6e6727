"""RMVPE pitch detector: log-mel -> DeepUnet -> BiGRU -> 360-bin salience.

Capability parity with `rvc/lib/predictors/RMVPE.py` /
`rvc_mlx/lib/mlx/rmvpe.py`: 5-stage ConvBlockRes encoder (16..256ch,
BatchNorm momentum=0.01, AvgPool 2x2), 4 intermediate blocks (512ch),
5-stage ConvTranspose decoder with skip concats, 3-channel head,
BiGRU(384->256), Linear->360 sigmoid salience, local-average-cents decode
``f0 = 10 * 2^(cents/1200)`` over a 9-bin window around the argmax.

TPU design: the whole net is one jitted program per padded mel length
(frames padded to a multiple of 32 with reflect, as the reference does);
the decode (argmax + windowed weighted average) runs on-device in jnp —
no host round-trip between mel and f0.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.models.layers import BatchNorm, Conv2d, ConvTranspose2d, Linear
from rvc_tpu.ops.gru import bigru
from rvc_tpu.ops.stft import log_mel_spectrogram

N_MELS = 128
N_CLASS = 360


class ConvBlockRes(nn.Module):
    in_channels: int
    out_channels: int
    momentum: float = 0.01

    @nn.compact
    def __call__(self, x: jax.Array, packed_p: int = 1) -> jax.Array:
        if packed_p > 1 and not self.is_initializing():
            return self._packed_forward(x, packed_p)
        h = Conv2d(self.in_channels, self.out_channels, 3, padding=1,
                   use_bias=False, name="conv_0")(x)
        h = BatchNorm(self.out_channels, momentum=self.momentum, name="bn_0")(h)
        h = jnp.maximum(h, 0.0)
        h = Conv2d(self.out_channels, self.out_channels, 3, padding=1,
                   use_bias=False, name="conv_1")(h)
        h = BatchNorm(self.out_channels, momentum=self.momentum, name="bn_1")(h)
        h = jnp.maximum(h, 0.0)
        if self.in_channels != self.out_channels:
            x = Conv2d(self.in_channels, self.out_channels, 1, name="shortcut")(x)
        return h + x

    def _packed_forward(self, xp: jax.Array, p: int) -> jax.Array:
        """Same math on frequency-packed input (B, T, F/P, P*Cin) ->
        (B, T, F/P, P*Cout) — see ops/packed_freq.py for why (C=16
        lanes waste ~87% of the TPU's vector width; measured 4.5x)."""
        from rvc_tpu.ops.packed_freq import (
            packed_batchnorm,
            packed_conv3,
            packed_pointwise,
        )

        params = self.scope.get_variable("params", "conv_0")
        h = packed_conv3(xp, params["weight"], p, cin=self.in_channels)
        bn = self.scope.get_variable("params", "bn_0")
        st = self.scope.get_variable("batch_stats", "bn_0")
        h = packed_batchnorm(h, bn["weight"], bn["bias"],
                             st["running_mean"], st["running_var"], p)
        h = jnp.maximum(h, 0.0)
        h = packed_conv3(h, self.scope.get_variable(
            "params", "conv_1")["weight"], p, cin=self.out_channels)
        bn = self.scope.get_variable("params", "bn_1")
        st = self.scope.get_variable("batch_stats", "bn_1")
        h = packed_batchnorm(h, bn["weight"], bn["bias"],
                             st["running_mean"], st["running_var"], p)
        h = jnp.maximum(h, 0.0)
        if self.in_channels != self.out_channels:
            sc = self.scope.get_variable("params", "shortcut")
            xp = packed_pointwise(xp, sc["weight"], p, sc.get("bias"),
                                  cin=self.in_channels)
        return h + xp


class ResEncoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    n_blocks: int = 1
    pool: bool = True

    @nn.compact
    def __call__(self, x: jax.Array):
        from rvc_tpu.ops.packed_freq import (
            pack,
            packed_avg_pool2,
            packed_unet_enabled,
            pick_pack,
            unpack,
        )

        p = 1
        if not self.is_initializing() and packed_unet_enabled():
            p = pick_pack(x.shape[2], self.out_channels)
        if p > 1:
            x = pack(x, p)
        x = ConvBlockRes(self.in_channels, self.out_channels,
                         name="blocks_0")(x, packed_p=p)
        for i in range(1, self.n_blocks):
            x = ConvBlockRes(self.out_channels, self.out_channels,
                             name=f"blocks_{i}")(x, packed_p=p)
        if not self.pool:
            return unpack(x, p) if p > 1 else x
        if p > 1:
            from rvc_tpu.ops.packed_freq import packed_pool_enabled

            skip = unpack(x, p)
            if (p % 2 == 0 and x.shape[1] % 2 == 0
                    and packed_pool_enabled()):
                # pool in packed space (one dense pass instead of a
                # lane-padded canonical pool), result packed at P/2
                pooled = unpack(packed_avg_pool2(x, p), p // 2)
            else:
                pooled = nn.avg_pool(skip, (2, 2), strides=(2, 2))
            return skip, pooled
        pooled = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x, pooled


class ResDecoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    n_blocks: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array) -> jax.Array:
        from rvc_tpu.ops.packed_freq import (
            pack,
            packed_batchnorm,
            packed_conv_transpose2x,
            packed_unet_enabled,
            pick_pack,
            unpack,
        )

        th, tw = skip.shape[1], skip.shape[2]
        p = 1
        if not self.is_initializing() and packed_unet_enabled():
            p = pick_pack(tw, self.out_channels)
        from rvc_tpu.ops.packed_freq import packed_tc_enabled

        # fully-packed upsample: zero-interleave + packed conv of the
        # flipped kernel, bn and concat in frequency-packed space; only
        # exact 2x upsamples qualify (the DeepUnet always is)
        if (p > 1 and packed_tc_enabled()
                and th == 2 * x.shape[1] and tw == 2 * x.shape[2]
                and x.shape[2] % max(p // 2, 1) == 0):
            w = self.scope.get_variable("params", "conv1")["weight"]
            xp = packed_conv_transpose2x(x, w, p)
            bn = self.scope.get_variable("params", "bn1")
            st = self.scope.get_variable("batch_stats", "bn1")
            xp = packed_batchnorm(xp, bn["weight"], bn["bias"],
                                  st["running_mean"], st["running_var"], p)
            xp = jnp.maximum(xp, 0.0)
            # concat in packed space: per position-group, x then skip
            b, t, g, _ = xp.shape
            sp = pack(skip, p).reshape(b, t, g, p, -1)
            xp = jnp.concatenate(
                [xp.reshape(b, t, g, p, -1), sp], axis=-1)
            x = xp.reshape(b, t, g, -1)
        else:
            x = ConvTranspose2d(self.in_channels, self.out_channels, 3,
                                stride=(2, 2), padding=1, output_padding=1,
                                use_bias=False, name="conv1")(x)
            x = BatchNorm(self.out_channels, momentum=0.01, name="bn1")(x)
            x = jnp.maximum(x, 0.0)
            # crop/pad to the skip's spatial shape before concat
            if x.shape[1] != th or x.shape[2] != tw:
                ph = max(0, th - x.shape[1])
                pw = max(0, tw - x.shape[2])
                if ph or pw:
                    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
                x = x[:, :th, :tw, :]
            x = jnp.concatenate([x, skip], axis=-1)
            if p > 1 and x.shape[2] % p == 0:
                x = pack(x, p)
            else:
                p = 1
        x = ConvBlockRes(self.out_channels * 2, self.out_channels,
                         name="blocks_0")(x, packed_p=p)
        for i in range(1, self.n_blocks):
            x = ConvBlockRes(self.out_channels, self.out_channels,
                             name=f"blocks_{i}")(x, packed_p=p)
        if p > 1:
            x = unpack(x, p)
        return x


class DeepUnet(nn.Module):
    n_blocks: int = 4
    en_de_layers: int = 5
    inter_layers: int = 4
    in_channels: int = 1
    en_out_channels: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, T, 128, 1)
        from rvc_tpu.ops.packed_freq import (
            pack,
            packed_batchnorm,
            packed_unet_enabled,
            pick_pack,
            unpack,
        )

        p0 = 1
        if not self.is_initializing() and packed_unet_enabled():
            p0 = pick_pack(x.shape[2], self.in_channels)
        if p0 > 1:
            # the C=1 input plane normalizes in packed space — a
            # canonical (T, 128, 1) elementwise pass pads its 1-wide
            # minor dim to a full 128-lane tile
            bn = self.scope.get_variable("params", "encoder_bn")
            st = self.scope.get_variable("batch_stats", "encoder_bn")
            x = unpack(packed_batchnorm(
                pack(x, p0), bn["weight"], bn["bias"],
                st["running_mean"], st["running_var"], p0), p0)
        else:
            x = BatchNorm(self.in_channels, momentum=0.01,
                          name="encoder_bn")(x)
        skips = []
        cin, cout = self.in_channels, self.en_out_channels
        for i in range(self.en_de_layers):
            skip, x = ResEncoderBlock(cin, cout, self.n_blocks,
                                      name=f"encoder_layers_{i}")(x)
            skips.append(skip)
            cin, cout = cout, cout * 2

        inter_out = cin * 2
        x = ResEncoderBlock(cin, inter_out, self.n_blocks, pool=False,
                            name="intermediate_layers_0")(x)
        for i in range(1, self.inter_layers):
            x = ResEncoderBlock(inter_out, inter_out, self.n_blocks, pool=False,
                                name=f"intermediate_layers_{i}")(x)

        cin = inter_out
        for i in range(self.en_de_layers):
            cout = cin // 2
            x = ResDecoderBlock(cin, cout, self.n_blocks,
                                name=f"decoder_layers_{i}")(x, skips[-1 - i])
            cin = cout
        return x


class E2E(nn.Module):
    """DeepUnet -> 3ch conv -> BiGRU -> 360 sigmoid salience.

    Input mel: (B, T, 128); output salience: (B, T, 360).
    """

    n_blocks: int = 4
    n_gru: int = 1
    en_de_layers: int = 5
    inter_layers: int = 4
    en_out_channels: int = 16
    gru_hidden: int = 256

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        x = mel[:, :, :, None]  # (B, T, M, 1)
        x = DeepUnet(self.n_blocks, self.en_de_layers, self.inter_layers,
                     1, self.en_out_channels, name="unet")(x)
        from rvc_tpu.ops.packed_freq import (
            pack,
            packed_conv3,
            packed_unet_enabled,
            pick_pack,
            unpack,
        )

        p = 1
        if not self.is_initializing() and packed_unet_enabled():
            p = pick_pack(x.shape[2], 3)
        if p > 1:  # params created by the canonical branch at init
            head = self.scope.get_variable("params", "cnn")
            x = unpack(packed_conv3(pack(x, p), head["weight"], p,
                                    head["bias"],
                                    cin=self.en_out_channels), p)
        else:
            x = Conv2d(self.en_out_channels, 3, 3, padding=1, name="cnn")(x)
        B, T, M, C = x.shape
        # torch flattens (B, T, C, M) -> (B, T, C*M); match that order
        x = x.transpose(0, 1, 3, 2).reshape(B, T, C * M)
        # the BiGRU/fc/sigmoid head always runs f32 regardless of the
        # U-Net compute dtype (the recurrent carry compounds rounding;
        # the conv trunk does not)
        x = x.astype(jnp.float32)
        if self.n_gru:
            fwd = {
                "weight_ih": self.param("gru_fwd_weight_ih", nn.initializers.normal(0.02), (3 * self.gru_hidden, 3 * M)),
                "weight_hh": self.param("gru_fwd_weight_hh", nn.initializers.normal(0.02), (3 * self.gru_hidden, self.gru_hidden)),
                "bias_ih": self.param("gru_fwd_bias_ih", nn.initializers.zeros, (3 * self.gru_hidden,)),
                "bias_hh": self.param("gru_fwd_bias_hh", nn.initializers.zeros, (3 * self.gru_hidden,)),
            }
            bwd = {
                "weight_ih": self.param("gru_bwd_weight_ih", nn.initializers.normal(0.02), (3 * self.gru_hidden, 3 * M)),
                "weight_hh": self.param("gru_bwd_weight_hh", nn.initializers.normal(0.02), (3 * self.gru_hidden, self.gru_hidden)),
                "bias_ih": self.param("gru_bwd_bias_ih", nn.initializers.zeros, (3 * self.gru_hidden,)),
                "bias_hh": self.param("gru_bwd_bias_hh", nn.initializers.zeros, (3 * self.gru_hidden,)),
            }
            # fused-direction BiGRU: one scan instead of two (the scan's
            # sequential steps are the f0 program's latency bottleneck)
            x = bigru(x, fwd, bwd)
            x = Linear(2 * self.gru_hidden, N_CLASS, name="fc")(x)
        else:
            x = Linear(3 * M, N_CLASS, name="fc")(x)
        return jax.nn.sigmoid(x)


def prepack_unet_variables(variables, n_mels: int = N_MELS):
    """Host-side packed-weight precomputation for the serving path.

    The packed U-Net branch (RVC_TPU_PACKED_UNET) otherwise builds each
    conv's packed weight IN-GRAPH — ~24 dynamic-update-slices per conv,
    ~190 per forward, measured as the dominant residual cost of the
    packed path. This walks the E2E variable tree ONCE on the host and
    replaces every eligible U-Net conv weight with its packed form
    (same tree keys, bigger arrays); the model detects pre-packed
    weights by shape. Respects the current knob state (tc sub-knob), so
    callers must re-prepack when knobs change (keyed caching in the
    pipeline/predictor)."""
    import copy

    from rvc_tpu.ops.packed_freq import (
        _np_packed_conv3_weight,
        _np_packed_pointwise_weight,
        packed_tc_enabled,
        packed_unet_enabled,
        pick_pack,
    )

    if not packed_unet_enabled():
        return variables
    params = copy.deepcopy(jax.tree.map(np.asarray, variables["params"]))
    unet = params["unet"]

    def pack_block(blk, p):
        for key in ("conv_0", "conv_1"):
            blk[key]["weight"] = _np_packed_conv3_weight(
                blk[key]["weight"], p)
        if "shortcut" in blk:
            blk["shortcut"]["weight"] = _np_packed_pointwise_weight(
                blk["shortcut"]["weight"], p)

    f = n_mels
    cout = 16
    for i in range(5):  # encoder stages
        p = pick_pack(f, cout)
        if p > 1:
            layer = unet[f"encoder_layers_{i}"]
            for name in layer:
                pack_block(layer[name], p)
        f //= 2
        cout *= 2
    # decoder stages: out channels 256..16, out freq 8..128
    f_out, cout = n_mels // 16, 256
    for i in range(5):
        p = pick_pack(f_out, cout)
        if p > 1:
            layer = unet[f"decoder_layers_{i}"]
            if packed_tc_enabled():
                layer["conv1"]["weight"] = _np_packed_conv3_weight(
                    np.flip(layer["conv1"]["weight"], axis=(0, 1)), p)
            for name in layer:
                if name.startswith("blocks_"):
                    pack_block(layer[name], p)
        f_out *= 2
        cout //= 2
    p_head = pick_pack(n_mels, 3)
    if p_head > 1:
        params["cnn"]["weight"] = _np_packed_conv3_weight(
            params["cnn"]["weight"], p_head)
    return {**variables, "params": params}


# ---------------------------------------------------------------------------
# decoding: salience -> f0 (on-device)
# ---------------------------------------------------------------------------

CENTS_MAPPING = (20.0 * np.arange(N_CLASS) + 1997.3794084376191).astype(np.float32)


def decode_salience(hidden: jax.Array, thred: float = 0.03) -> jax.Array:
    """(B, T, 360) salience -> (B, T) f0 in Hz (0 = unvoiced).

    Local weighted average of cents over a 9-bin window centered on the
    argmax, thresholded on max salience (reference `rmvpe.py:357-406`).
    """
    B, T, C = hidden.shape
    center = jnp.argmax(hidden, axis=-1)  # (B, T)
    padded = jnp.pad(hidden, ((0, 0), (0, 0), (4, 4)))
    cents_pad = jnp.pad(jnp.asarray(CENTS_MAPPING), (4, 4))

    # windowed sums at EVERY bin via 9 shifted slices, then a one-hot
    # select at the argmax (gathers via take_along_axis measured ~3 ms on
    # v5e for this shape; the dense form is a few elementwise passes)
    weighted = padded * cents_pad
    wsum_all = sum(padded[..., i : i + C] for i in range(9))
    wcent_all = sum(weighted[..., i : i + C] for i in range(9))
    onehot = jnp.arange(C)[None, None, :] == center[:, :, None]
    wsum = jnp.sum(jnp.where(onehot, wsum_all, 0.0), axis=-1)
    wcent = jnp.sum(jnp.where(onehot, wcent_all, 0.0), axis=-1)
    cents = jnp.where(wsum > 0, wcent / jnp.maximum(wsum, 1e-12), 0.0)
    maxx = jnp.max(hidden, axis=-1)
    cents = jnp.where(maxx > thred, cents, 0.0)
    f0 = 10.0 * (2.0 ** (cents / 1200.0))
    return jnp.where(cents > 0, f0, 0.0)


class RMVPE:
    """End-to-end RMVPE predictor: audio -> f0, jit-compiled per mel-length
    bucket. Mirrors `RMVPE0Predictor.infer_from_audio`."""

    def __init__(self, params=None, batch_stats=None, seed: int = 0):
        self.model = E2E()
        if params is None:
            from rvc_tpu.utils.init_utils import cpu_backend

            mel = jnp.zeros((1, 32, N_MELS))
            with cpu_backend():
                variables = self.model.init(jax.random.PRNGKey(seed), mel)
            from rvc_tpu.utils.init_utils import to_default_device

            variables = to_default_device(variables)
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
        self.variables = {"params": params, "batch_stats": batch_stats or {}}
        self._serving_cache = {}
        self._jit_forward = jax.jit(
            lambda v, mel: self.model.apply(v, mel)
        )

    def serving_variables(self):
        """Variables for the CURRENT knob state: host-prepacked U-Net
        conv weights when the packed path is on (in-graph weight
        packing measurably dominates the packed forward otherwise),
        cached per knob tuple."""
        import os

        key = tuple(os.environ.get(k, "") for k in (
            "RVC_TPU_PACKED_UNET", "RVC_TPU_PACKED_TC"))
        if key not in self._serving_cache:
            v = prepack_unet_variables(self.variables)
            # device-resident: prepack returns HOST arrays, and handing
            # them to a jit re-uploads the whole tree EVERY call (moved
            # a 64x60s longform run from 38 s to 163 s through the
            # tunnel before this was caught)
            self._serving_cache[key] = jax.device_put(v)
        return self._serving_cache[key]

    def mel(self, audio: jax.Array) -> jax.Array:
        """(B, T_samples) 16 kHz -> (B, T_frames, 128) log-mel (htk, 30..8000)."""
        return log_mel_spectrogram(audio, 1024, N_MELS, 16000, 160, 1024,
                                   fmin=30, fmax=8000, htk=True)

    def mel2hidden(self, mel: jax.Array) -> jax.Array:
        n_frames = mel.shape[1]
        pad = 32 * ((n_frames - 1) // 32 + 1) - n_frames
        if pad > 0:
            mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        hidden = self._jit_forward(self.serving_variables(), mel)
        return hidden[:, :n_frames]

    def infer_from_audio(self, audio, thred: float = 0.03):
        """audio: (T,) or (B, T) numpy/jax @16 kHz -> f0 per frame (hop 160)."""
        audio = jnp.asarray(audio)
        squeeze = audio.ndim == 1
        if squeeze:
            audio = audio[None]
        hidden = self.mel2hidden(self.mel(audio))
        f0 = decode_salience(hidden, thred)
        return np.asarray(f0[0] if squeeze else f0)
