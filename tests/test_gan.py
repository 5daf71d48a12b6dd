"""Discriminator parity vs reference torch + GAN train-step smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from bvsc_tpu.config import VocoderConfig
from bvsc_tpu.convert import mpd_params_from_torch, mrd_params_from_torch
from bvsc_tpu.models import losses as jlosses
from bvsc_tpu.models.discriminators import mpd_apply, mrd_apply
from test_vocoder import tiny_cfg
from torch_ref import import_reference_bigvgan


def disc_cfg(**overrides) -> VocoderConfig:
    base = dict(
        mpd_reshapes=(2, 3),
        resolutions=((128, 32, 64), (256, 64, 128), (512, 128, 256)),  # ref asserts len==3
        discriminator_channel_mult=0.25,
        use_spectral_norm=False,
    )
    base.update(overrides)
    return tiny_cfg(**base)


def build_ref_discs(cfg: VocoderConfig, seed=0):
    models, env = import_reference_bigvgan()
    torch.manual_seed(seed)
    h = env.AttrDict(
        dict(
            mpd_reshapes=list(cfg.mpd_reshapes),
            resolutions=[list(r) for r in cfg.resolutions],
            use_spectral_norm=cfg.use_spectral_norm,
            discriminator_channel_mult=cfg.discriminator_channel_mult,
        )
    )
    mpd = models.MultiPeriodDiscriminator(h)
    mrd = models.MultiResolutionDiscriminator(h)
    mpd.eval(), mrd.eval()
    return mpd, mrd


def test_mpd_parity(rng):
    cfg = disc_cfg()
    mpd_ref, _ = build_ref_discs(cfg)
    params = mpd_params_from_torch(mpd_ref.state_dict(), cfg)
    y = rng.standard_normal((2, 1, 2000)).astype(np.float32) * 0.3
    yh = rng.standard_normal((2, 1, 2000)).astype(np.float32) * 0.3
    with torch.no_grad():
        r_ref, g_ref, fr_ref, fg_ref = mpd_ref(torch.from_numpy(y), torch.from_numpy(yh))
    r, g, fr, fg = mpd_apply(params, cfg, jnp.asarray(y), jnp.asarray(yh))
    for a, b in zip(r, r_ref):
        np.testing.assert_allclose(np.asarray(a), b.flatten(1).numpy(), atol=1e-4)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), b.flatten(1).numpy(), atol=1e-4)
    # feature maps too (these drive the FM loss)
    for fa, fb in zip(fr, fr_ref):
        for a, b in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-4)


def test_mrd_parity(rng):
    cfg = disc_cfg()
    _, mrd_ref = build_ref_discs(cfg)
    params = mrd_params_from_torch(mrd_ref.state_dict(), cfg)
    y = rng.standard_normal((2, 1, 2000)).astype(np.float32) * 0.3
    yh = rng.standard_normal((2, 1, 2000)).astype(np.float32) * 0.3
    with torch.no_grad():
        r_ref, g_ref, fr_ref, fg_ref = mrd_ref(torch.from_numpy(y), torch.from_numpy(yh))
    r, g, fr, fg = mrd_apply(params, cfg, jnp.asarray(y), jnp.asarray(yh))
    for a, b in zip(r, r_ref):
        np.testing.assert_allclose(np.asarray(a), b.flatten(1).numpy(), atol=2e-4)
    for fa, fb in zip(fr, fr_ref):
        for a, b in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-4)


def test_gan_losses_match_reference_formulas(rng):
    import sys
    sys.path.insert(0, "/root/reference")
    from torch_ref import _install_librosa_stub
    _install_librosa_stub()
    from third_party.BigVGAN import models as ref_models

    r = [torch.from_numpy(rng.standard_normal((2, 5)).astype(np.float32)) for _ in range(3)]
    g = [torch.from_numpy(rng.standard_normal((2, 5)).astype(np.float32)) for _ in range(3)]
    ld_ref, _, _ = ref_models.discriminator_loss(r, g)
    lg_ref, _ = ref_models.generator_loss(g)
    fmr = [[x] for x in r]
    fmg = [[x] for x in g]
    fl_ref = ref_models.feature_loss(fmr, fmg)

    jr = [jnp.asarray(x.numpy()) for x in r]
    jg = [jnp.asarray(x.numpy()) for x in g]
    ld, _, _ = jlosses.discriminator_loss(jr, jg)
    lg, _ = jlosses.generator_loss(jg)
    fl = jlosses.feature_loss([[x] for x in jr], [[x] for x in jg])
    np.testing.assert_allclose(float(ld), float(ld_ref), rtol=1e-6)
    np.testing.assert_allclose(float(lg), float(lg_ref), rtol=1e-6)
    np.testing.assert_allclose(float(fl), float(fl_ref), rtol=1e-6)


def test_gan_train_step_smoke(rng):
    from bvsc_tpu.parallel.mesh import make_mesh, shard_batch
    from bvsc_tpu.train.vocoder_train import GANTrainConfig, VocoderGANTrainer

    cfg = disc_cfg(num_mels=8, upsample_initial_channel=8,
                   upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                   resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
                   layers_sym=(False, False), layers_antialias=(False, False))
    tcfg = GANTrainConfig(segment_size=1024, batch_size=8, hop_size=8,
                          n_fft=64, win_size=64, mel_pad_left=16,
                          fmax=4000.0, freeze_step=1)
    mesh = make_mesh(8)
    trainer = VocoderGANTrainer(cfg, tcfg, mesh=mesh)
    y = (rng.standard_normal((8, tcfg.segment_size)) * 0.3).astype(np.float32)
    y = shard_batch(mesh, jnp.asarray(y))

    m1 = trainer.step_on_audio(y)  # step 0: D frozen
    assert np.isfinite(float(m1["gen_loss_total"]))
    d0 = jax.tree.leaves(trainer.state.mpd)[0].copy()
    m2 = trainer.step_on_audio(y)  # step 1: D trains
    assert np.isfinite(float(m2["disc_loss_mpd"]))
    d1 = jax.tree.leaves(trainer.state.mpd)[0]
    assert np.abs(np.asarray(d0) - np.asarray(d1)).max() > 0, "D did not update"
    assert int(trainer.state.step) == 2

    # lr schedule epoch step
    trainer.set_epoch(5)
    m3 = trainer.step_on_audio(y)
    assert np.isfinite(float(m3["gen_loss_total"]))


def test_mrstft_loss_sane(rng):
    from bvsc_tpu.ops.stft_loss import multi_resolution_stft_loss

    y = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
    same = float(multi_resolution_stft_loss(y, y))
    other = float(multi_resolution_stft_loss(
        y, jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
    ))
    assert same < 1e-3
    assert other > same + 0.5


def test_split_programs_match_two_program_step(rng):
    """The per-discriminator decomposition must produce the same updates as
    the fused two-program step."""
    import jax

    from bvsc_tpu.train.vocoder_train import GANTrainConfig, VocoderGANTrainer

    # minimal discriminators (1 period + 1 resolution): the fused reference
    # step this compares against compiles in minutes otherwise
    cfg = disc_cfg(num_mels=8, upsample_initial_channel=8,
                   upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                   resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
                   layers_sym=(False, False), layers_antialias=(False, False),
                   mpd_reshapes=(3,), resolutions=((128, 32, 64),))
    tcfg = GANTrainConfig(segment_size=512, batch_size=4, hop_size=8,
                          n_fft=64, win_size=64, mel_pad_left=16,
                          fmax=4000.0, freeze_step=0)
    y = (rng.standard_normal((4, tcfg.segment_size)) * 0.3).astype(np.float32)

    t1 = VocoderGANTrainer(cfg, tcfg, seed=7)
    t2 = VocoderGANTrainer(cfg, tcfg, seed=7, split_programs=True)
    m1 = t1.step_on_audio(y)
    m2 = t2.step_on_audio(y)

    np.testing.assert_allclose(float(m1["mel_spec_error"]),
                               float(m2["mel_spec_error"]), rtol=1e-5)
    for p1, p2 in zip(jax.tree.leaves(t1.state.gen), jax.tree.leaves(t2.state.gen)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-5)
    for p1, p2 in zip(jax.tree.leaves(t1.state.mpd), jax.tree.leaves(t2.state.mpd)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-5)
