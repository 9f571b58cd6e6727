"""The jitted GAN train step (generator + discriminator in one program).

Capability parity with the reference trainers
(`rvc_mlx/train/trainer.py:381-505`, `rvc/train/train.py:608-780`):
per batch — generator forward (prior/posterior/flow/random segment/dec),
mel L1 x45 + KL + LS-GAN adversarial + feature matching, gradient
sanitize (nan/inf -> 0) + global-norm clip, AdamW(0.8, 0.99, eps 1e-9);
discriminator LS-GAN step on the stop-gradient fake, optional
d_loss_threshold gating and warmup (non-adversarial) mode.

TPU design: ONE jit compiles the whole G+D update; both grads are
computed in a single program so XLA can overlap and fuse; state is donated
to avoid double-buffering; batches are padded to static bucket shapes by
the data pipeline. The same function runs sharded under a Mesh via
`rvc_tpu.parallel` (data-parallel batch axis; optimizer sync is a psum
that XLA inserts from shardings).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from rvc_tpu.configs import RVCConfig
from rvc_tpu.models.discriminators import MultiPeriodDiscriminator
from rvc_tpu.models.synthesizer import Synthesizer
from rvc_tpu.ops.commons import slice_segments
from rvc_tpu.ops.stft import mel_spectrogram
from rvc_tpu.train import losses as L


class TrainState(NamedTuple):
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    step: jax.Array


class Batch(NamedTuple):
    phone: jax.Array          # (B, T, 768)
    phone_lengths: jax.Array  # (B,)
    pitch: jax.Array          # (B, T) int32 coarse
    pitchf: jax.Array         # (B, T) float
    spec: jax.Array           # (B, T, spec_channels)
    spec_lengths: jax.Array   # (B,)
    wave: jax.Array           # (B, T*hop)
    sid: jax.Array            # (B,)


def sanitize_grads(grads, clip_value: float = 1e3):
    """Replace non-finite gradient entries and clamp magnitude
    (`rvc_mlx/train/trainer.py:27-67`)."""
    return jax.tree.map(
        lambda g: jnp.clip(jnp.nan_to_num(g, nan=0.0, posinf=clip_value,
                                          neginf=-clip_value),
                           -clip_value, clip_value),
        grads,
    )


def build_discriminator(cfg: RVCConfig) -> MultiPeriodDiscriminator:
    """Vocoder-conditioned discriminator selection: RefineGAN training
    uses the v3 discriminator (5-period MPD + multi-resolution
    DiscriminatorR bank, `rvc/lib/algorithm/discriminators.py:38-40`),
    everything else the v2 MPD (`rvc/train/train.py:71-75`)."""
    if cfg.model.vocoder == "RefineGAN":
        return MultiPeriodDiscriminator(periods=(2, 3, 5, 7, 11),
                                        use_multi_resolution=True)
    return MultiPeriodDiscriminator()


def make_optimizers(cfg: RVCConfig, steps_per_epoch: int = 100):
    lr = optax.exponential_decay(
        cfg.train.learning_rate, transition_steps=steps_per_epoch,
        decay_rate=cfg.train.lr_decay, staircase=True)
    d_lr = optax.exponential_decay(
        cfg.train.learning_rate * cfg.train.d_lr_scale,
        transition_steps=steps_per_epoch,
        decay_rate=cfg.train.lr_decay, staircase=True)

    def adamw(sched):
        # use_bf16 keeps first-moment state in bf16 — the reference's
        # AnyPrecisionAdamW memory saving (`rvc/train/anyprecision_optimizer.py:19`)
        mu_dtype = jnp.bfloat16 if cfg.train.use_bf16 else None
        return optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(sched, b1=cfg.train.betas[0], b2=cfg.train.betas[1],
                        eps=cfg.train.eps, weight_decay=0.01,
                        mu_dtype=mu_dtype),
        )

    return adamw(lr), adamw(d_lr)


def create_train_state(
    cfg: RVCConfig,
    rng: jax.Array,
    steps_per_epoch: int = 100,
    synthesizer: Optional[Synthesizer] = None,
    discriminator: Optional[MultiPeriodDiscriminator] = None,
) -> Tuple[TrainState, Synthesizer, MultiPeriodDiscriminator]:
    from rvc_tpu.models.synthesizer import build_synthesizer

    net_g = synthesizer or build_synthesizer(cfg)
    net_d = discriminator or build_discriminator(cfg)

    T = max(cfg.segment_frames + 4, 40)
    ks = jax.random.split(rng, 5)
    g_vars = net_g.init(
        {"params": ks[0], "noise": ks[1]},
        jnp.zeros((1, T, cfg.model.text_enc_hidden_dim)), jnp.array([T]),
        jnp.zeros((1, T), jnp.int32), jnp.full((1, T), 200.0),
        jnp.zeros((1, T, cfg.data.spec_channels)), jnp.array([T]),
        jnp.array([0]), rng=ks[2],
    )
    seg_samples = cfg.segment_frames * cfg.data.hop_length
    d_vars = net_d.init(ks[3], jnp.zeros((1, seg_samples, 1)),
                        jnp.zeros((1, seg_samples, 1)))

    g_tx, d_tx = make_optimizers(cfg, steps_per_epoch)
    state = TrainState(
        g_params=g_vars["params"],
        d_params=d_vars["params"],
        g_opt=g_tx.init(g_vars["params"]),
        d_opt=d_tx.init(d_vars["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return state, net_g, net_d


def make_train_step(
    cfg: RVCConfig,
    net_g: Synthesizer,
    net_d: MultiPeriodDiscriminator,
    steps_per_epoch: int = 100,
    adversarial: bool = True,
    freeze_encoder: bool = False,
    out_shardings=None,
):
    """Build the jitted (state, batch, rng) -> (state, metrics) update.

    out_shardings (optional, mesh runs): pins the output TrainState to
    the input layout — without it GSPMD may re-layout params to match
    the ZeRO-1-sharded optimizer moments, which both recompiles on the
    second step and leaves params cross-host-sharded (breaking
    host-local fetches of replicated params).

    freeze_encoder zeroes enc_p gradients (the reference's finetuning
    freeze, `rvc_mlx/train/trainer.py:216-221`)."""
    g_tx, d_tx = make_optimizers(cfg, steps_per_epoch)
    hop = cfg.data.hop_length
    seg_frames = cfg.segment_frames
    seg_samples = seg_frames * hop
    data = cfg.data

    def mel_of(wave):  # (B, S) -> log-mel (B, F, n_mels)
        return mel_spectrogram(
            wave, data.filter_length, data.n_mel_channels, data.sample_rate,
            data.hop_length, data.win_length, data.mel_fmin, data.mel_fmax)

    # vocoder-conditioned mel loss: RefineGAN trains against the
    # multi-scale log-mel L1 at c_mel/3, others single-scale log-mel L1
    # at c_mel (`rvc/train/train.py:465-469,738,760`)
    multiscale_mel = cfg.model.vocoder == "RefineGAN"

    def g_loss_fn(g_params, d_params, batch: Batch, rng):
        out = net_g.apply(
            {"params": g_params}, batch.phone, batch.phone_lengths,
            batch.pitch, batch.pitchf, batch.spec, batch.spec_lengths,
            batch.sid, rng=rng)
        y_hat = out.wave  # (B, seg_samples, 1)
        wave_real = slice_segments(
            batch.wave, out.ids_slice * hop, seg_samples)[:, :, None]

        if multiscale_mel:
            loss_mel = L.multi_scale_mel_loss(
                wave_real[:, :, 0], y_hat[:, :, 0],
                data.sample_rate) * cfg.train.c_mel / 3.0
        else:
            mel_r = mel_of(wave_real[:, :, 0])
            mel_g = mel_of(y_hat[:, :, 0])
            loss_mel = L.mel_l1_loss(mel_r, mel_g) * cfg.train.c_mel
        loss_kl = L.kl_loss(out.z_p, out.logs_q, out.m_p, out.logs_p,
                            out.y_mask) * cfg.train.c_kl

        if adversarial:
            _, y_d_gs, fmap_rs, fmap_gs = net_d.apply(
                {"params": d_params}, wave_real, y_hat)
            loss_adv = L.generator_loss(y_d_gs)
            loss_fm = L.feature_loss(fmap_rs, fmap_gs)
        else:
            loss_adv = jnp.zeros(())
            loss_fm = jnp.zeros(())

        total = loss_mel + loss_kl + loss_adv + loss_fm
        aux = dict(loss_mel=loss_mel, loss_kl=loss_kl, loss_adv=loss_adv,
                   loss_fm=loss_fm, y_hat=y_hat, wave_real=wave_real)
        return total, aux

    def d_loss_fn(d_params, wave_real, y_hat):
        y_d_rs, y_d_gs, _, _ = net_d.apply({"params": d_params},
                                           wave_real, y_hat)
        return L.discriminator_loss(y_d_rs, y_d_gs)

    jit_kwargs = {"donate_argnums": (0,)}
    if out_shardings is not None:
        jit_kwargs["out_shardings"] = out_shardings

    @partial(jax.jit, **jit_kwargs)
    def train_step(state: TrainState, batch: Batch, rng: jax.Array):
        rng_g, _ = jax.random.split(rng)
        (g_total, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params, state.d_params, batch, rng_g)
        g_grads = sanitize_grads(g_grads)
        if freeze_encoder and "enc_p" in g_grads:
            g_grads = dict(g_grads)
            g_grads["enc_p"] = jax.tree.map(jnp.zeros_like, g_grads["enc_p"])
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        y_hat = jax.lax.stop_gradient(aux["y_hat"])
        wave_real = jax.lax.stop_gradient(aux["wave_real"])
        d_params, d_opt = state.d_params, state.d_opt
        # d_step_per_g_step (`rvc/train/train.py` d_step loop): K D updates
        # per G update on the generated segment (static unroll, K is small)
        for _ in range(max(cfg.train.d_step_per_g_step, 1)):
            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
                d_params, wave_real, y_hat)
            d_grads = sanitize_grads(d_grads)

            d_updates, d_opt_new = d_tx.update(d_grads, d_opt, d_params)
            d_params_new = optax.apply_updates(d_params, d_updates)
            if cfg.train.d_loss_threshold > 0:
                # d_loss_threshold gating (`rvc_mlx/train/trainer.py:453`):
                # while the D loss is under threshold the update is SKIPPED
                # entirely — params, AdamW moments, weight decay, and the
                # step count all stay untouched, exactly like the
                # reference's `continue`
                apply = d_loss >= cfg.train.d_loss_threshold
                sel = lambda new, old: jax.tree.map(
                    lambda n, o: jnp.where(apply, n, o), new, old)
                d_params = sel(d_params_new, d_params)
                d_opt = sel(d_opt_new, d_opt)
            else:
                d_params, d_opt = d_params_new, d_opt_new

        metrics = dict(
            loss_g_total=g_total, loss_d=d_loss,
            loss_mel=aux["loss_mel"], loss_kl=aux["loss_kl"],
            loss_adv=aux["loss_adv"], loss_fm=aux["loss_fm"],
            grad_norm_g=optax.global_norm(g_grads),
        )
        return TrainState(g_params, d_params, g_opt, d_opt, state.step + 1), metrics

    return train_step
