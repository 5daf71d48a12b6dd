"""Vocoder GAN trainer — TPU-native re-creation of the reference training
loop (``third_party/BigVGAN/train.py:34-445``).

Per step (reference ``train.py:253-314``):
  * G forward (weight-normed params) on input mels,
  * D step: LSGAN loss on MPD + MRD over (y, stop_grad(y_hat)), grad-clip
    1000, AdamW — skipped for the first ``freeze_step`` steps,
  * G step: 45 x L1 mel + feature-matching + adversarial (mel-only while D
    is frozen), grad-clip 1000, AdamW,
  * both optimizers AdamW(lr, betas=(adam_b1, adam_b2)) with per-epoch
    ExponentialLR decay (``train.py:87-96,372-373``).

TPU-first differences: the whole step (G fwd, mel of y_hat, both D passes,
both optimizer updates) is ONE jitted XLA program; mels are computed
on-device; data parallelism is a sharded batch over a Mesh (XLA psum
replaces DDP all-reduce).  The mel used for the input/loss is our causal
frontend — the reference's training-time mel calls are stale against its
own causal frontend signature (missing ``padding_left``, SURVEY §2.12), so
exact loss-mel parity with upstream is unattainable by construction.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bvsc_tpu.config import VocoderConfig
from bvsc_tpu.models import vocoder as voc_mod
from bvsc_tpu.models.discriminators import init_mpd_params, init_mrd_params, mpd_apply, mrd_apply
from bvsc_tpu.models.losses import discriminator_loss, feature_loss, generator_loss
from bvsc_tpu.ops.conv import (
    spectral_norm_power_iteration,
    spectral_norm_trainable_mask,
)
from bvsc_tpu.ops.mel import MelFrontend
from bvsc_tpu.parallel.mesh import batch_sharded, make_mesh, replicated


@dataclasses.dataclass(frozen=True)
class GANTrainConfig:
    """Hyperparameters of the reference vocoder trainer
    (``bigvgan_base_22khz_80band.json`` + ``train.py`` argparse defaults)."""

    learning_rate: float = 1e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999  # per epoch (train.py:95-96,372-373)
    grad_clip: float = 1000.0  # train.py:282,313
    mel_loss_weight: float = 45.0  # train.py:294
    freeze_step: int = 0  # train.py:403
    segment_size: int = 8192
    batch_size: int = 32
    sampling_rate: int = 22050
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    fmin: float = 0.0
    fmax: float = 8000.0
    fmax_for_loss: float | None = None  # full band (json: fmax_for_loss null)
    mel_pad_left: int = 256
    # rematerialise resblocks in differentiated generator programs: same
    # math, backward recomputes instead of keeping intermediates live —
    # required to keep the tunneled TPU AOT compile helper under its
    # memory cap (round-1 gap: the un-remat'd G grad program SIGKILLed it)
    remat: bool = True


@dataclasses.dataclass
class GANTrainState:
    gen: Any
    mpd: Any
    mrd: Any
    opt_g: Any
    opt_d: Any
    step: jax.Array

    def tree_flatten(self):
        return (self.gen, self.mpd, self.mrd, self.opt_g, self.opt_d, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    GANTrainState, GANTrainState.tree_flatten, GANTrainState.tree_unflatten
)


def make_gan_train_step(tcfg: GANTrainConfig, vcfg: VocoderConfig, opt_g, opt_d):
    """Build (d_step, g_step) jitted-separately step functions.

    ``mel_in`` is the generator input (equal to mel(y) except in fine-tuning,
    where it is a BVRNN-decoded mel); ``y_mel_target`` is the loss-band mel
    of the ground truth.  D and G are two XLA programs (like the reference's
    two optimizer steps) — one fused program compiles 2x slower and can OOM
    the AOT compile helper.

    For environments where even these compile too slowly (tunneled AOT
    helpers), :class:`VocoderGANTrainer` also exposes a fully split
    formulation (``split_programs=True``): per-discriminator gradient
    programs plus a surrogate-loss generator update — a dozen small XLA
    programs instead of two big ones, mathematically identical."""

    loss_frontend = MelFrontend(
        sampling_rate=tcfg.sampling_rate, n_fft=tcfg.n_fft, hop_size=tcfg.hop_size,
        win_size=tcfg.win_size, fmin=tcfg.fmin,
        fmax=tcfg.fmax_for_loss if tcfg.fmax_for_loss is not None
        else tcfg.sampling_rate / 2,
        padding_left=tcfg.mel_pad_left, num_mels=vcfg.num_mels,
    )

    def d_loss_fn(d_params, y, y_hat):
        y_df_r, y_df_g, _, _ = mpd_apply(d_params["mpd"], vcfg, y, y_hat)
        loss_f, _, _ = discriminator_loss(y_df_r, y_df_g)
        y_ds_r, y_ds_g, _, _ = mrd_apply(d_params["mrd"], vcfg, y, y_hat)
        loss_s, _, _ = discriminator_loss(y_ds_r, y_ds_g)
        return loss_f + loss_s, {"disc_loss_mpd": loss_f, "disc_loss_mrd": loss_s}

    def g_loss_fn(gen_params, d_params, mel_in, y, y_mel, frozen):
        y_hat = voc_mod.generator_apply(gen_params, vcfg, mel_in, y.shape[-1],
                                        remat=tcfg.remat)
        y_hat_mel = loss_frontend(y_hat[:, 0, :])
        loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * tcfg.mel_loss_weight

        _, y_df_g, fmap_f_r, fmap_f_g = mpd_apply(d_params["mpd"], vcfg, y, y_hat)
        loss_fm_f = feature_loss(fmap_f_r, fmap_f_g)
        loss_gen_f, _ = generator_loss(y_df_g)
        _, y_ds_g, fmap_s_r, fmap_s_g = mrd_apply(d_params["mrd"], vcfg, y, y_hat)
        loss_fm_s = feature_loss(fmap_s_r, fmap_s_g)
        loss_gen_s, _ = generator_loss(y_ds_g)

        adv = loss_gen_s + loss_gen_f + loss_fm_s + loss_fm_f
        # while D is frozen, G trains on the regression loss only
        # (train.py:306-310)
        loss = jnp.where(frozen, loss_mel, loss_mel + adv)
        metrics = {
            "gen_loss_total": loss,
            "mel_spec_error": loss_mel / tcfg.mel_loss_weight,
            "fm_loss_mpd": loss_fm_f,
            "gen_loss_mpd": loss_gen_f,
            "fm_loss_mrd": loss_fm_s,
            "gen_loss_mrd": loss_gen_s,
        }
        return loss, (y_hat, metrics)

    def d_step(state: GANTrainState, mel_in, y):
        """Update the discriminators on (y, stop_grad(y_hat)); skipped while
        frozen (reference train.py:267-288)."""
        frozen = state.step < tcfg.freeze_step
        y_hat_sg = jax.lax.stop_gradient(
            voc_mod.generator_apply(state.gen, vcfg, mel_in, y.shape[-1])
        )
        # one torch-style power iteration per training forward updates the
        # spectral-norm u/v buffers (no-op for weight-normed params)
        d_params = spectral_norm_power_iteration(
            {"mpd": state.mpd, "mrd": state.mrd}
        )
        (d_loss, d_metrics), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            d_params, y, y_hat_sg
        )

        def apply_d(_):
            updates, opt_state = opt_d.update(d_grads, state.opt_d, d_params)
            return optax.apply_updates(d_params, updates), opt_state

        def skip_d(_):
            return d_params, state.opt_d

        new_d, new_opt_d = jax.lax.cond(frozen, skip_d, apply_d, None)
        metrics = {**d_metrics, "grad_norm_d": optax.global_norm(d_grads)}
        new_state = GANTrainState(
            state.gen, new_d["mpd"], new_d["mrd"], state.opt_g, new_opt_d,
            state.step,
        )
        return new_state, metrics

    def g_step(state: GANTrainState, mel_in, y, y_mel):
        """Update the generator against the (already-updated) discriminators
        (reference train.py:290-314)."""
        frozen = state.step < tcfg.freeze_step
        d_params = {"mpd": state.mpd, "mrd": state.mrd}
        (g_loss, (_, g_metrics)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.gen, d_params, mel_in, y, y_mel, frozen)
        g_updates, new_opt_g = opt_g.update(g_grads, state.opt_g, state.gen)
        new_gen = optax.apply_updates(state.gen, g_updates)
        metrics = {**g_metrics, "grad_norm_g": optax.global_norm(g_grads)}
        new_state = GANTrainState(
            new_gen, state.mpd, state.mrd, new_opt_g, state.opt_d,
            state.step + 1,
        )
        return new_state, metrics

    return d_step, g_step


def make_split_gan_programs(tcfg: GANTrainConfig, vcfg: VocoderConfig, opt_g, opt_d):
    """Per-discriminator program decomposition of the GAN step.

    Mathematically identical to (d_step, g_step) but compiled as ~12 small
    XLA programs (one per sub-discriminator + generator fwd + two updates):

      * D side: per-discriminator jax.grad wrt that discriminator's params
        on (y, stop_grad(y_hat)) — losses are independent sums, so grads
        concatenate exactly;
      * G side: per-discriminator cotangent dL_adv/d y_hat, summed on
        device, then one surrogate-loss program
        grad_gen[45*L1mel(gen) + vdot(y_hat(gen), stop_grad(cot))] — the
        chain rule written out, exact.
    """
    from bvsc_tpu.models.discriminators import (
        _resolution_spectrogram,
        discriminator_p_apply,
        discriminator_r_apply_mag,
    )

    loss_frontend = MelFrontend(
        sampling_rate=tcfg.sampling_rate, n_fft=tcfg.n_fft, hop_size=tcfg.hop_size,
        win_size=tcfg.win_size, fmin=tcfg.fmin,
        fmax=tcfg.fmax_for_loss if tcfg.fmax_for_loss is not None
        else tcfg.sampling_rate / 2,
        padding_left=tcfg.mel_pad_left, num_mels=vcfg.num_mels,
    )

    @functools.partial(jax.jit, static_argnames=("length",))
    def gen_fwd(gen_params, mel_in, length):
        return voc_mod.generator_apply(gen_params, vcfg, mel_in, length)

    def _one_disc(d_params_i, x, kind, idx):
        """x is the waveform for MPD, the |STFT| magnitude for MRD (the
        spectrogram runs in its own program — see mrd_spec/spec_vjp)."""
        if kind == "mpd":
            return discriminator_p_apply(d_params_i, x, vcfg.mpd_reshapes[idx])
        return discriminator_r_apply_mag(d_params_i, x)

    @functools.partial(jax.jit, static_argnames=("idx",))
    def mrd_spec(x, *, idx):
        """Forward-only |STFT| at resolution idx (own program)."""
        return _resolution_spectrogram(x, vcfg.resolutions[idx])

    @functools.partial(jax.jit, static_argnames=("idx",))
    def mrd_spec_vjp(y_hat, cot_mag, *, idx):
        """Chain a magnitude cotangent back to the waveform:
        grad_yhat[vdot(|STFT|(y_hat), stop_grad(cot_mag))]."""
        return jax.grad(
            lambda yh: jnp.vdot(
                _resolution_spectrogram(yh, vcfg.resolutions[idx]),
                jax.lax.stop_gradient(cot_mag),
            )
        )(y_hat)

    @functools.partial(jax.jit, static_argnames=("kind", "idx", "real"))
    def d_grads_half(d_params_i, x, *, kind, idx, real):
        """One LSGAN D-loss half — (1-D(y))^2 on real or D(y_hat)^2 on
        generated — and its param grads.  The two halves are additive, so
        grads sum exactly; splitting halves the backward program (the full
        two-pass program OOMs tunneled AOT compile helpers).  For MRD, x is
        a precomputed magnitude (constant wrt d params)."""

        def loss_fn(p):
            d, _ = _one_disc(p, x, kind, idx)
            return jnp.mean((1.0 - d) ** 2) if real else jnp.mean(d**2)

        return jax.value_and_grad(loss_fn)(d_params_i)

    def d_grads_one(d_params_i, y, y_hat, *, kind, idx):
        lr, gr = d_grads_half(d_params_i, y, kind=kind, idx=idx, real=True)
        lg, gg = d_grads_half(d_params_i, y_hat, kind=kind, idx=idx, real=False)
        return lr + lg, jax.tree.map(jnp.add, gr, gg)

    @functools.partial(jax.jit, static_argnames=("kind", "idx"))
    def disc_fmaps(d_params_i, x, *, kind, idx):
        """Forward-only feature maps of the REAL input (constants for the
        G step — keeping them out of the backward program halves it)."""
        _, fmap = _one_disc(d_params_i, x, kind, idx)
        return fmap

    @functools.partial(jax.jit, static_argnames=("kind", "idx"))
    def g_cotangent_one(d_params_i, fmap_r, y_hat, *, kind, idx):
        """(adv + feature-matching) loss of one sub-discriminator and its
        gradient wrt y_hat (for MRD: wrt the magnitude; chain with
        mrd_spec_vjp).  fmap_r comes from :func:`disc_fmaps`."""

        def loss_fn(yh):
            dg, fmap_g = _one_disc(d_params_i, yh, kind, idx)
            adv = jnp.mean((1.0 - dg) ** 2)
            fm = 0.0
            for rl, gl in zip(fmap_r, fmap_g):
                fm += jnp.mean(jnp.abs(jax.lax.stop_gradient(rl) - gl))
            return adv + 2.0 * fm, (adv, 2.0 * fm)

        (loss, aux), cot = jax.value_and_grad(loss_fn, has_aux=True)(y_hat)
        return loss, aux, cot

    @jax.jit
    def d_update(state: GANTrainState, d_grads):
        frozen = state.step < tcfg.freeze_step
        d_params = {"mpd": state.mpd, "mrd": state.mrd}

        def apply_d(_):
            updates, opt_state = opt_d.update(d_grads, state.opt_d, d_params)
            return optax.apply_updates(d_params, updates), opt_state

        new_d, new_opt_d = jax.lax.cond(
            frozen, lambda _: (d_params, state.opt_d), apply_d, None
        )
        return GANTrainState(state.gen, new_d["mpd"], new_d["mrd"],
                             state.opt_g, new_opt_d, state.step)

    @functools.partial(jax.jit, static_argnames=("length",))
    def g_update(state: GANTrainState, mel_in, y_mel, cot, length):
        frozen = state.step < tcfg.freeze_step

        def loss_fn(gen_params):
            y_hat = voc_mod.generator_apply(gen_params, vcfg, mel_in, length,
                                            remat=tcfg.remat)
            y_hat_mel = loss_frontend(y_hat[:, 0, :])
            loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * tcfg.mel_loss_weight
            adv_surrogate = jnp.vdot(y_hat, jax.lax.stop_gradient(cot))
            loss = loss_mel + jnp.where(frozen, 0.0, adv_surrogate)
            return loss, loss_mel

        (_, loss_mel), g_grads = jax.value_and_grad(loss_fn, has_aux=True)(state.gen)
        g_updates, new_opt_g = opt_g.update(g_grads, state.opt_g, state.gen)
        new_gen = optax.apply_updates(state.gen, g_updates)
        metrics = {
            "mel_spec_error": loss_mel / tcfg.mel_loss_weight,
            "grad_norm_g": optax.global_norm(g_grads),
        }
        return (
            GANTrainState(new_gen, state.mpd, state.mrd, new_opt_g,
                          state.opt_d, state.step + 1),
            metrics,
        )

    return (gen_fwd, d_grads_one, g_cotangent_one, d_update, g_update,
            mrd_spec, mrd_spec_vjp, disc_fmaps)


def _make_optimizer(tcfg: GANTrainConfig):
    """AdamW (torch default weight_decay 0.01) + clip, lr injected so the
    per-epoch ExponentialLR schedule can be driven from the host.

    Spectral-norm power-iteration buffers (sn_u/sn_v) are torch *buffers*,
    not parameters: their updates are zeroed so only
    :func:`spectral_norm_power_iteration` ever moves them (in particular
    AdamW's weight decay must not shrink them)."""

    def _zero_sn_updates(updates, state, params=None):
        del params
        mask = spectral_norm_trainable_mask(updates)
        return (
            jax.tree.map(
                lambda u, keep: u if keep else jnp.zeros_like(u), updates, mask
            ),
            state,
        )

    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(tcfg.grad_clip),
            optax.adamw(learning_rate, b1=tcfg.adam_b1, b2=tcfg.adam_b2,
                        weight_decay=0.01),
            optax.GradientTransformation(lambda params: optax.EmptyState(),
                                         _zero_sn_updates),
        )
    )(learning_rate=tcfg.learning_rate)


class VocoderGANTrainer:
    """Data-parallel GAN trainer (params replicated, batch sharded)."""

    def __init__(
        self,
        vcfg: VocoderConfig,
        tcfg: GANTrainConfig = GANTrainConfig(),
        mesh=None,
        seed: int = 0,
        gen_params=None,
        split_programs: bool = False,
    ):
        self.vcfg, self.tcfg = vcfg, tcfg
        self.split_programs = split_programs
        self.mesh = mesh if mesh is not None else make_mesh()
        self.epoch = 0
        k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
        gen = gen_params if gen_params is not None else voc_mod.init_generator_params(
            k1, vcfg, weight_norm=True
        )
        mpd = init_mpd_params(k2, vcfg)
        mrd = init_mrd_params(k3, vcfg)
        self.opt_g = _make_optimizer(tcfg)
        self.opt_d = _make_optimizer(tcfg)
        d_params = {"mpd": mpd, "mrd": mrd}
        state = GANTrainState(
            gen, mpd, mrd, self.opt_g.init(gen), self.opt_d.init(d_params),
            jnp.zeros((), jnp.int32),
        )
        repl = replicated(self.mesh)
        self.state = jax.device_put(state, repl)
        data_sh = batch_sharded(self.mesh)
        d_step, g_step = make_gan_train_step(tcfg, vcfg, self.opt_g, self.opt_d)
        self._d_step = jax.jit(
            d_step,
            in_shardings=(repl, data_sh, data_sh),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
        self._g_step = jax.jit(
            g_step,
            in_shardings=(repl, data_sh, data_sh, data_sh),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
        if split_programs:
            (self._gen_fwd, self._d_grads_one, self._g_cot_one,
             self._d_update, self._g_update,
             self._mrd_spec, self._mrd_spec_vjp,
             self._disc_fmaps) = make_split_gan_programs(
                tcfg, vcfg, self.opt_g, self.opt_d
            )
        self.input_frontend = MelFrontend(
            sampling_rate=tcfg.sampling_rate, n_fft=tcfg.n_fft,
            hop_size=tcfg.hop_size, win_size=tcfg.win_size, fmin=tcfg.fmin,
            fmax=tcfg.fmax, padding_left=tcfg.mel_pad_left, num_mels=vcfg.num_mels,
        )
        loss_fmax = (tcfg.fmax_for_loss if tcfg.fmax_for_loss is not None
                     else tcfg.sampling_rate / 2)
        self.loss_frontend = MelFrontend(
            sampling_rate=tcfg.sampling_rate, n_fft=tcfg.n_fft,
            hop_size=tcfg.hop_size, win_size=tcfg.win_size, fmin=tcfg.fmin,
            fmax=loss_fmax, padding_left=tcfg.mel_pad_left, num_mels=vcfg.num_mels,
        )
        self._mels = jax.jit(
            lambda y: (self.input_frontend(y), self.loss_frontend(y))
        )

    def set_epoch(self, epoch: int) -> None:
        """Per-epoch ExponentialLR (reference train.py:372-373)."""
        self.epoch = epoch
        lr = self.tcfg.learning_rate * (self.tcfg.lr_decay ** epoch)
        self.state.opt_g.hyperparams["learning_rate"] = jnp.asarray(lr)
        self.state.opt_d.hyperparams["learning_rate"] = jnp.asarray(lr)

    def step_on_audio(self, y: np.ndarray, mel_in=None) -> dict:
        """y: (B, segment) ground-truth audio.  mel_in overrides the input
        mel for fine-tuning mode (BVRNN-decoded mels, (B, M, T))."""
        y = jnp.asarray(y)
        mel, mel_loss = self._mels(y)
        T = y.shape[-1] // self.tcfg.hop_size
        mel = mel[..., :T] if mel_in is None else jnp.asarray(mel_in)[..., :T]
        mel_loss = mel_loss[..., :T]
        if self.split_programs:
            return self._step_split(mel, y[:, None, :], mel_loss)
        self.state, d_metrics = self._d_step(self.state, mel, y[:, None, :])
        self.state, g_metrics = self._g_step(self.state, mel, y[:, None, :], mel_loss)
        return {**d_metrics, **g_metrics}

    def _step_split(self, mel, y, y_mel) -> dict:
        """Per-discriminator program decomposition (see
        make_split_gan_programs); same math as the two-program step.

        All per-program scalar losses are accumulated ON DEVICE and read
        back in ONE transfer at the end — each ``float()`` here would be a
        full device round-trip (~ms on tunneled links)."""
        length = y.shape[-1]
        y_hat = jax.lax.stop_gradient(self._gen_fwd(self.state.gen, mel, length))

        # spectral-norm buffer power iteration (no-op for weight norm)
        st = self.state
        self.state = GANTrainState(
            st.gen,
            spectral_norm_power_iteration(st.mpd),
            spectral_norm_power_iteration(st.mrd),
            st.opt_g, st.opt_d, st.step,
        )

        # MRD operates on magnitudes computed in their own programs
        mags_r = [self._mrd_spec(y, idx=i)
                  for i in range(len(self.vcfg.resolutions))]
        mags_g = [self._mrd_spec(y_hat, idx=i)
                  for i in range(len(self.vcfg.resolutions))]

        # ---- D: independent grads per sub-discriminator ----
        d_grads = {"mpd": [], "mrd": []}
        d_loss_f = jnp.zeros(())
        d_loss_s = jnp.zeros(())
        for i in range(len(self.vcfg.mpd_reshapes)):
            l, g = self._d_grads_one(self.state.mpd[i], y, y_hat, kind="mpd", idx=i)
            d_loss_f = d_loss_f + l
            d_grads["mpd"].append(g)
        for i in range(len(self.vcfg.resolutions)):
            l, g = self._d_grads_one(self.state.mrd[i], mags_r[i], mags_g[i],
                                     kind="mrd", idx=i)
            d_loss_s = d_loss_s + l
            d_grads["mrd"].append(g)
        self.state = self._d_update(self.state, d_grads)

        # ---- G: cotangent accumulation against the updated D ----
        cot = jnp.zeros_like(y_hat)
        adv_tot = jnp.zeros(())
        fm_tot = jnp.zeros(())
        for i in range(len(self.vcfg.mpd_reshapes)):
            fmap_r = self._disc_fmaps(self.state.mpd[i], y, kind="mpd", idx=i)
            _, (adv, fm), c = self._g_cot_one(self.state.mpd[i], fmap_r, y_hat,
                                              kind="mpd", idx=i)
            cot = cot + c
            adv_tot = adv_tot + adv
            fm_tot = fm_tot + fm
        for i in range(len(self.vcfg.resolutions)):
            fmap_r = self._disc_fmaps(self.state.mrd[i], mags_r[i],
                                      kind="mrd", idx=i)
            _, (adv, fm), c_mag = self._g_cot_one(self.state.mrd[i], fmap_r,
                                                  mags_g[i], kind="mrd", idx=i)
            cot = cot + self._mrd_spec_vjp(y_hat, c_mag, idx=i)
            adv_tot = adv_tot + adv
            fm_tot = fm_tot + fm
        # frozen flag BEFORE the G update increments step — so the
        # reported gen_loss_total matches the fused path's
        # jnp.where(frozen, loss_mel, ...) semantics during the warmup
        frozen_flag = (
            self.state.step < self.tcfg.freeze_step
        ).astype(jnp.float32)
        d_grad_norm = optax.global_norm(d_grads)
        self.state, g_metrics = self._g_update(self.state, mel, y_mel, cot, length)

        # one host readback for every scalar of the step
        packed = np.asarray(jnp.stack([
            d_loss_f, d_loss_s, adv_tot, fm_tot,
            g_metrics["mel_spec_error"], g_metrics["grad_norm_g"],
            frozen_flag, d_grad_norm,
        ]))
        (d_f, d_s, adv_v, fm_v, mel_err, gnorm, frozen_v, dnorm) = (
            float(x) for x in packed
        )
        return {
            "mel_spec_error": mel_err,
            "grad_norm_g": gnorm,
            "grad_norm_d": dnorm,
            "disc_loss_mpd": d_f,
            "disc_loss_mrd": d_s,
            "gen_adv_loss": adv_v,
            "fm_loss": fm_v,
            "gen_loss_total": mel_err * self.tcfg.mel_loss_weight + (
                0.0 if frozen_v else adv_v + fm_v
            ),
        }

    @property
    def generator_params_folded(self):
        """Inference-ready (weight-norm folded) generator params."""
        return voc_mod.fold_generator_params(self.state.gen)
