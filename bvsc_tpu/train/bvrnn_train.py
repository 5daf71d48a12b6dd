"""BVRNN VAE trainer — re-created from the reference's config keys.

The reference publishes no BVRNN training script; its TOML carries the full
hyperparameter set (``configs/config_varBitRate.toml:1-38``: Adam betas,
batch 32, lr 2e-4 with per-step exp decay 0.99999306855, grad-clip 130,
200 k steps, 4-s segments, scheduled-sampling ramp ``teacher_force_step_1perc``
and per-frame bitrate redraw prob ``p_bitratechange``) plus the training
forward interface (``bvrnn.py:86-160``).  This module rebuilds that trainer:

  loss = Gaussian NLL with learned ``log_sigma`` (reference ``bvrnn.py:33``:
  "to balance the KLD and the reconstruction loss") + Bernoulli KLD.

Scheduling assumptions (documented because upstream is unpublished):
  * ``p_use_gen`` ramps +1% every ``teacher_force_step_1perc / 100`` steps,
    reaching fully closed-loop training at step ``teacher_force_step_1perc``.
  * with prob ``p_bitratechange`` a sequence switches to a second random
    bitrate at a uniformly random frame; otherwise one bitrate per sequence.

Parallelism: pure data-parallel over a ``Mesh`` — params replicated, batch
sharded on the ``data`` axis; XLA inserts the gradient all-reduce (psum) over
ICI (TPU-native replacement for the reference's DDP/NCCL, SURVEY §2.10-2.11).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from bvsc_tpu.config import CodecConfig
from bvsc_tpu.models import bvrnn as bvrnn_mod
from bvsc_tpu.parallel.mesh import batch_sharded, make_mesh, replicated


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array  # scalar int32

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def make_optimizer(conf: CodecConfig) -> optax.GradientTransformation:
    """Adam + per-step exponential lr decay + global-norm clip
    (keys: learning_rate, lr_decay, adam_b1/b2, grad_clip)."""
    schedule = optax.exponential_decay(
        init_value=conf.learning_rate,
        transition_steps=1,
        decay_rate=conf.lr_decay,
        end_value=None,
    )
    return optax.chain(
        optax.clip_by_global_norm(conf.grad_clip),
        optax.adam(schedule, b1=conf.adam_b1, b2=conf.adam_b2),
    )


def p_use_gen_schedule(step: jax.Array, conf: CodecConfig) -> jax.Array:
    """Scheduled-sampling ramp: 0 -> 1 over ``teacher_force_step_1perc`` steps
    (+1% per 1% of that horizon)."""
    return jnp.minimum(1.0, step / max(conf.teacher_force_step_1perc, 1))


def draw_bitrates(key: jax.Array, conf: CodecConfig, batch: int, frames: int) -> jax.Array:
    """Per-frame bits/frame in [1, z_dim], with prob ``p_bitratechange`` of a
    mid-sequence switch to a second bitrate."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b1 = jax.random.randint(k1, (batch, 1), 1, conf.z_dim + 1).astype(jnp.float32)
    b2 = jax.random.randint(k2, (batch, 1), 1, conf.z_dim + 1).astype(jnp.float32)
    switch_at = jax.random.randint(k3, (batch, 1), 0, frames)
    do_switch = jax.random.uniform(k4, (batch, 1)) < conf.p_bitratechange
    t = jnp.arange(frames)[None, :]
    second = (t >= switch_at) & do_switch
    return jnp.where(second, b2, b1)


def stripe_mask(key: jax.Array, batch: int, length: int, n: int,
                max_width: int) -> jax.Array:
    """(batch, length) bool — union of ``n`` random stripes of width
    uniform in [0, max_width] per sample (width 0 == stripe disabled)."""
    ks, kw = jax.random.split(key)
    start = jax.random.randint(ks, (batch, n, 1), 0, length)
    width = jax.random.randint(kw, (batch, n, 1), 0, max_width + 1)
    idx = jnp.arange(length)[None, None, :]
    return ((idx >= start) & (idx < start + width)).any(axis=1)


def apply_spec_mask(
    key: jax.Array, mel: jax.Array, *, n_freq: int = 2, freq_width: int = 10,
    n_time: int = 2, time_width: int = 24,
) -> jax.Array:
    """SpecAugment-style input masking for denoising VAE training: replace
    random mel-band and frame stripes with the per-sequence per-band mean.
    Only the ENCODER input is masked — the NLL target stays the clean mel
    (see ``loss_fn(mel_in=...)``), so the model must reconstruct masked
    regions from its temporal prior, the same machinery PLC exploits."""
    B, T, M = mel.shape
    kt, kf = jax.random.split(key)
    t_mask = stripe_mask(kt, B, T, n_time, time_width)[:, :, None]
    f_mask = stripe_mask(kf, B, M, n_freq, freq_width)[:, None, :]
    mean = jnp.mean(mel, axis=1, keepdims=True)  # (B, 1, M)
    return jnp.where(t_mask | f_mask, mean, mel)


def loss_fn(
    params,
    bcfg: bvrnn_mod.BVRNNConfig,
    mel: jax.Array,
    p_use_gen: jax.Array,
    bits: jax.Array | None,
    rng: jax.Array,
    mel_in: jax.Array | None = None,
) -> tuple[jax.Array, dict]:
    """Gaussian NLL (learned log_sigma) + Bernoulli KLD.

    ``mel_in``: optional corrupted encoder input (e.g. spec-masked); the
    NLL target is always the clean ``mel``.

    With ``bcfg.dtype=bfloat16`` this is the bf16-compute /
    f32-master-weights mode (VERDICT r4 #3): the optimizer state and
    ``params`` stay f32; the forward runs on a bf16 CAST of the params
    (gradients flow through the cast back to f32), and the NLL/KLD
    reductions are f32."""
    if bcfg.dtype != jnp.float32:
        fwd_params = jax.tree.map(lambda a: a.astype(bcfg.dtype), params)
    else:
        fwd_params = params
    mel_hat, kld = bvrnn_mod.forward_train(
        fwd_params, bcfg, mel if mel_in is None else mel_in, p_use_gen,
        False, bits, rng
    )
    mel_hat = mel_hat.astype(jnp.float32)
    kld = kld.astype(jnp.float32)
    log_sigma = params["log_sigma"][0]
    se = (mel_hat - mel) ** 2
    # NLL per element: 0.5 * exp(-2 log_sigma) * err^2 + log_sigma
    nll = jnp.mean(0.5 * jnp.exp(-2.0 * log_sigma) * se + log_sigma)
    loss = nll + kld
    metrics = {
        "loss": loss,
        "nll": nll,
        "kld": kld,
        "mse": jnp.mean(se),
        "log_sigma": log_sigma,
    }
    return loss, metrics


def make_train_step(conf: CodecConfig, bcfg: bvrnn_mod.BVRNNConfig, optimizer,
                    mel_mask: dict | None = None):
    """Pure (state, mel, rng) -> (state, metrics) step function.

    ``mel_mask``: optional kwargs for :func:`apply_spec_mask` (empty dict =
    defaults) enabling SpecAugment-style denoising of the encoder input."""

    def train_step(state: TrainState, mel: jax.Array, rng: jax.Array):
        k_bits, k_model, k_mask = jax.random.split(
            jax.random.fold_in(rng, state.step), 3
        )
        B, T, _ = mel.shape
        bits = draw_bitrates(k_bits, conf, B, T) if conf.var_bit else None
        p_gen = p_use_gen_schedule(state.step, conf)
        mel_in = (apply_spec_mask(k_mask, mel, **mel_mask)
                  if mel_mask is not None else None)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, bcfg, mel, p_gen, bits, k_model, mel_in
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


class BVRNNTrainer:
    """Data-parallel BVRNN trainer over a device mesh."""

    def __init__(
        self,
        conf: CodecConfig,
        mesh=None,
        params=None,
        seed: int = 0,
        mean_std_mel=None,
        mel_mask: dict | None = None,
        fused_cell: bool = False,
        compute_dtype: str | None = None,
        unroll: int = 1,
    ):
        """fused_cell / compute_dtype ('bf16') / unroll: the trainer
        throughput knobs (VERDICT r4 #3) — fused scan step, bf16 compute
        with f32 master weights (see loss_fn), scan unroll.  All default
        off: the reference-parity training numerics stay f32/HIGHEST."""
        if compute_dtype not in (None, "f32", "bf16"):
            raise ValueError(f"compute_dtype must be 'f32'/'bf16', got "
                             f"{compute_dtype!r}")
        bf16 = compute_dtype == "bf16"
        self.conf = conf
        self.bcfg = bvrnn_mod.BVRNNConfig(
            x_dim=conf.num_mels, h_dim=conf.h_dim, z_dim=conf.z_dim,
            var_bit=conf.var_bit,
            dtype=jnp.bfloat16 if bf16 else jnp.float32,
            precision=(jax.lax.Precision.DEFAULT if bf16
                       else jax.lax.Precision.HIGHEST),
            fused_cell=bool(fused_cell),
            unroll=int(unroll),
        )
        self.mesh = mesh if mesh is not None else make_mesh()
        self.optimizer = make_optimizer(conf)
        if params is None:
            # master weights are ALWAYS f32, whatever the compute dtype
            params = bvrnn_mod.init_bvrnn_params(
                jax.random.key(seed),
                dataclasses.replace(self.bcfg, dtype=jnp.float32),
                mean_std_mel=mean_std_mel,
                log_sigma_init=conf.log_sigma_init,
            )
        repl = replicated(self.mesh)
        self.state = jax.device_put(
            TrainState(params, self.optimizer.init(params), jnp.zeros((), jnp.int32)),
            repl,
        )
        data_sh = batch_sharded(self.mesh)
        self._step = jax.jit(
            make_train_step(conf, self.bcfg, self.optimizer, mel_mask),
            in_shardings=(repl, data_sh, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    def step(self, mel, rng) -> dict:
        """One optimizer step on a (B, T, num_mels) mel batch."""
        self.state, metrics = self._step(self.state, mel, rng)
        return metrics
