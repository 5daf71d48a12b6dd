"""BVRNN VAE trainer coverage (the trainer the reference never published,
re-created from its TOML keys — ``train/bvrnn_train.py``).

The GAN trainer has step-parity and loss-decrease tests (test_gan.py); this
gives the BVRNN trainer the same safety net: one-step mechanics, a short
loss-decrease run, the scheduled-sampling ramp, and the per-frame bitrate
draw (``p_bitratechange`` mid-sequence switches)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bvsc_tpu.config import CodecConfig
from bvsc_tpu.train.bvrnn_train import (
    BVRNNTrainer,
    draw_bitrates,
    p_use_gen_schedule,
)


def tiny_conf(**kw) -> CodecConfig:
    return CodecConfig(
        num_mels=8, h_dim=24, z_dim=6, batch_size=8,
        learning_rate=1e-3, **kw,
    )


def test_trainer_step_and_loss_decrease():
    conf = tiny_conf()
    trainer = BVRNNTrainer(conf, seed=0)
    rng = np.random.default_rng(0)
    # a learnable low-rank signal (not pure noise) so the loss can fall
    t = np.linspace(0, 1, 12)[None, :, None]
    mel = (np.sin(2 * np.pi * 3 * t) * np.linspace(1, 2, 8)[None, None, :]
           + 0.05 * rng.standard_normal((8, 12, 8))).astype(np.float32)

    losses = []
    for i in range(30):
        m = trainer.step(jnp.asarray(mel), jax.random.key(1))
        losses.append(float(m["loss"]))
        for k in ("loss", "nll", "kld", "mse", "grad_norm", "log_sigma"):
            assert np.isfinite(float(m[k])), (k, m)
    assert int(trainer.state.step) == 30
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    assert float(m["kld"]) >= 0.0


def test_p_use_gen_ramp():
    conf = tiny_conf(teacher_force_step_1perc=100)
    assert float(p_use_gen_schedule(jnp.asarray(0), conf)) == 0.0
    assert float(p_use_gen_schedule(jnp.asarray(50), conf)) == pytest.approx(0.5)
    assert float(p_use_gen_schedule(jnp.asarray(100), conf)) == 1.0
    assert float(p_use_gen_schedule(jnp.asarray(10_000), conf)) == 1.0  # clamped


def test_draw_bitrates_properties():
    conf = tiny_conf(p_bitratechange=1.0)
    B, T = 64, 20
    bits = np.asarray(draw_bitrates(jax.random.key(0), conf, B, T))
    assert bits.shape == (B, T)
    assert bits.min() >= 1 and bits.max() <= conf.z_dim
    assert (bits == np.round(bits)).all()
    # p_bitratechange=1: every row is one or two constant segments
    n_switched = 0
    for row in bits:
        changes = np.flatnonzero(np.diff(row))
        assert len(changes) <= 1, row
        n_switched += len(changes)
    assert n_switched > B // 4  # switches actually happen

    # p_bitratechange=0: constant per sequence
    conf0 = tiny_conf(p_bitratechange=0.0)
    bits0 = np.asarray(draw_bitrates(jax.random.key(1), conf0, B, T))
    assert (np.diff(bits0, axis=1) == 0).all()


def test_spec_mask_properties():
    """Masked regions take the per-sequence band mean; unmasked regions are
    untouched; shapes/dtype preserved; seeded-deterministic."""
    from bvsc_tpu.train.bvrnn_train import apply_spec_mask, stripe_mask

    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((4, 40, 8)).astype(np.float32))
    key = jax.random.key(3)
    out = apply_spec_mask(key, mel, n_time=2, time_width=10,
                          n_freq=1, freq_width=3)
    assert out.shape == mel.shape and out.dtype == mel.dtype
    np.testing.assert_array_equal(
        np.asarray(apply_spec_mask(key, mel, n_time=2, time_width=10,
                                   n_freq=1, freq_width=3)),
        np.asarray(out))
    changed = ~np.isclose(np.asarray(out), np.asarray(mel))
    assert changed.any()  # something was masked
    # every changed element equals the per-sequence per-band mean
    mean = np.asarray(mel).mean(axis=1, keepdims=True)
    target = np.broadcast_to(mean, mel.shape)
    np.testing.assert_allclose(np.asarray(out)[changed], target[changed],
                               rtol=1e-6)
    # width 0 == no masking
    m0 = stripe_mask(jax.random.key(0), 4, 40, 3, 0)
    assert not np.asarray(m0).any()


def test_trainer_with_mel_mask_runs():
    """mel_mask trainer steps are finite and still learn; the mask reaches
    the graph (loss differs from the unmasked trainer on the same data)."""
    conf = tiny_conf()
    t = np.linspace(0, 1, 12)[None, :, None]
    rng = np.random.default_rng(0)
    mel = (np.sin(2 * np.pi * 3 * t) * np.linspace(1, 2, 8)[None, None, :]
           + 0.05 * rng.standard_normal((8, 12, 8))).astype(np.float32)
    plain = BVRNNTrainer(conf, seed=0)
    masked = BVRNNTrainer(conf, seed=0,
                          mel_mask=dict(n_time=1, time_width=4,
                                        n_freq=1, freq_width=2))
    m_p = plain.step(jnp.asarray(mel), jax.random.key(1))
    m_m = masked.step(jnp.asarray(mel), jax.random.key(1))
    assert np.isfinite(float(m_m["loss"]))
    assert float(m_m["loss"]) != float(m_p["loss"])
    for _ in range(5):
        m_m = masked.step(jnp.asarray(mel), jax.random.key(1))
        assert np.isfinite(float(m_m["loss"]))


def test_trainer_fused_bf16_modes():
    """VERDICT r4 #3 knobs: fused_cell + bf16 compute with f32 master
    weights must train (finite metrics, falling loss) and keep the
    optimizer/master params in f32."""
    rng = np.random.default_rng(1)
    t = np.linspace(0, 1, 12)[None, :, None]
    mel = (np.sin(2 * np.pi * 3 * t) * np.linspace(1, 2, 8)[None, None, :]
           + 0.05 * rng.standard_normal((8, 12, 8))).astype(np.float32)

    for kw in ({"fused_cell": True},
               {"compute_dtype": "bf16"},
               {"fused_cell": True, "compute_dtype": "bf16", "unroll": 2}):
        trainer = BVRNNTrainer(tiny_conf(), seed=0, **kw)
        assert all(a.dtype == jnp.float32
                   for a in jax.tree.leaves(trainer.state.params))
        losses = []
        for _ in range(20):
            m = trainer.step(jnp.asarray(mel), jax.random.key(1))
            losses.append(float(m["loss"]))
            assert np.isfinite(losses[-1]), (kw, m)
        assert np.mean(losses[-5:]) < np.mean(losses[:5]), (kw, losses)
        assert all(a.dtype == jnp.float32
                   for a in jax.tree.leaves(trainer.state.params)), kw


def test_trainer_fused_first_loss_close_to_standard():
    """Same data/rng, step 1: the fused cell computes the same objective up
    to reassociation (straight-through rounding can flip rare bits, so the
    tolerance is loose but catches wiring errors)."""
    rng = np.random.default_rng(2)
    mel = (0.3 * rng.standard_normal((8, 12, 8))).astype(np.float32)
    l_std = float(BVRNNTrainer(tiny_conf(), seed=0).step(
        jnp.asarray(mel), jax.random.key(3))["loss"])
    l_fused = float(BVRNNTrainer(tiny_conf(), seed=0, fused_cell=True).step(
        jnp.asarray(mel), jax.random.key(3))["loss"])
    assert abs(l_std - l_fused) < 0.05 * max(1.0, abs(l_std)), (l_std, l_fused)


def test_trainer_rejects_bad_compute_dtype():
    with pytest.raises(ValueError, match="compute_dtype"):
        BVRNNTrainer(tiny_conf(), compute_dtype="fp8")


def test_forward_train_accepts_f32_masters_under_bf16_cfg():
    """Validation helpers call forward_train directly with the f32 master
    params while the trainer cfg computes bf16 — the entry cast must keep
    the scan carries consistent (regression: r5 paired-run experiment
    crashed at validation)."""
    from bvsc_tpu.models import bvrnn

    for fused in (False, True):
        cfg = bvrnn.BVRNNConfig(x_dim=8, h_dim=24, z_dim=6,
                                dtype=jnp.bfloat16,
                                precision=jax.lax.Precision.DEFAULT,
                                fused_cell=fused)
        params = bvrnn.init_bvrnn_params(
            jax.random.key(0),
            bvrnn.BVRNNConfig(x_dim=8, h_dim=24, z_dim=6))  # f32 masters
        y = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 6, 8)).astype(np.float32))
        vb = jnp.full((1, 6), 5.0)
        mel_hat, kld = bvrnn.forward_train(params, cfg, y, 1.0, True, vb,
                                           jax.random.key(1))
        assert np.isfinite(np.asarray(mel_hat, np.float32)).all(), fused
        assert np.isfinite(float(kld)), fused
