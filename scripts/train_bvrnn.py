"""BVRNN VAE training CLI — the trainer the reference left unpublished,
re-created from its TOML keys (``configs/config_varBitRate.toml:1-38``).

Usage:
  python scripts/train_bvrnn.py --config configs/varbitrate.toml \
      --input_wavs_dir WAVS --input_training_file train.txt \
      --checkpoint_path exp/bvrnn

Pipeline per step: load ``train_seq_duration``-second audio segments ->
log-mel on device -> scheduled-sampling BVRNN forward -> NLL(log_sigma)+KLD
-> Adam(exp-decay lr, clip 130), data-parallel over the mesh.  Mel mean/std
statistics are estimated from the first batches and frozen into the params
(the reference stores them as non-trainable parameters, ``bvrnn.py:30-31``).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _cli_common

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/varbitrate.toml")
    p.add_argument("--checkpoint_path", default="exp/bvrnn")
    p.add_argument("--input_wavs_dir", default="")
    p.add_argument("--input_training_file", required=True)
    p.add_argument("--input_validation_file", default=None)
    p.add_argument("--val_interval", type=int, default=None,
                   help="defaults to the config's val_interval")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--stdout_interval", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--stats_batches", type=int, default=8,
                   help="batches used to estimate mel mean/std")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--teacher_force_step_1perc", type=int, default=None,
                   help="override the config's scheduled-sampling ramp "
                        "length (reference config_varBitRate.toml:32); the "
                        "reference's 30000 is tuned for 200k-step budgets — "
                        "short demo runs should scale it so the ramp "
                        "completes well before max_steps (inference is "
                        "100%% closed-loop)")
    p.add_argument("--augment", action="store_true",
                   help="on-the-fly speed perturbation (0.85-1.15) + "
                        "random gain (-10..0 dB) per crop — counters "
                        "overfitting on tiny corpora")
    p.add_argument("--augment_full", action="store_true",
                   help="the full augmentation tier: speed+gain plus "
                        "additive noise (SNR 8-30 dB, p=0.5), synthetic-RIR "
                        "reverb (RT60 0.1-0.4 s, p=0.3) and WSOLA pitch "
                        "shift (+-2 semitones, p=0.3)")
    p.add_argument("--mel_mask", action="store_true",
                   help="SpecAugment-style denoising: random time/freq "
                        "stripes of the ENCODER input mel replaced by the "
                        "sequence mean (targets stay clean)")
    p.add_argument("--fused_cell", action="store_true",
                   help="fused scan step (weight-concatenated matmuls — "
                        "fewer sequential ops/step; reassociated f32 "
                        "numerics, same objective)")
    p.add_argument("--compute_dtype", choices=["f32", "bf16"], default=None,
                   help="bf16: forward/backward on a bf16 cast of the f32 "
                        "master weights (optimizer state stays f32; "
                        "NLL/KLD reduced in f32)")
    p.add_argument("--scan_unroll", type=int, default=1,
                   help="lax.scan unroll factor for the frame loop "
                        "(scheduling only)")
    _cli_common.add_platform_arg(p)
    _cli_common.add_distributed_args(p)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    _cli_common.setup_runtime(args)

    import jax
    import jax.numpy as jnp

    # scan compiles are minutes cold on the tunneled AOT stack; cache them
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))

    from bvsc_tpu.config import CodecConfig
    from bvsc_tpu.data.dataset import AudioSegmentDataset
    from bvsc_tpu.models import bvrnn as bvrnn_mod
    from bvsc_tpu.ops.mel import MelFrontend
    from bvsc_tpu.parallel.mesh import make_mesh, shard_batch
    from bvsc_tpu.train import checkpoint as ckpt
    from bvsc_tpu.train.bvrnn_train import BVRNNTrainer
    from bvsc_tpu.utils.logging import TrainLogger

    conf = CodecConfig.from_toml(args.config)
    if args.teacher_force_step_1perc is not None:
        import dataclasses

        conf = dataclasses.replace(
            conf, teacher_force_step_1perc=args.teacher_force_step_1perc
        )
    if jax.process_index() == 0:  # reference env.py:14-18 via train.py:427
        _cli_common.build_env(args.config, args.checkpoint_path)
    batch_size = args.batch_size or conf.batch_size
    max_steps = args.max_steps or conf.max_steps
    segment = int(conf.train_seq_duration * conf.fs)
    segment -= segment % conf.hopsize

    with open(args.input_training_file) as f:
        train_files = [
            os.path.join(args.input_wavs_dir, line.split("|")[0])
            for line in f.read().splitlines() if line
        ]
    train_files = [f if f.endswith(".wav") else f + ".wav" for f in train_files]
    aug = None
    if args.augment or args.augment_full:
        aug = {"speed": (0.85, 1.15), "gain_db": (-10.0, 0.0)}
    if args.augment_full:
        aug.update({"noise_snr_db": (8.0, 30.0), "noise_p": 0.5,
                    "reverb_rt60": (0.1, 0.4), "reverb_p": 0.3,
                    "pitch_semitones": (-2.0, 2.0), "pitch_p": 0.3})
    trainset = AudioSegmentDataset(
        train_files, segment, conf.fs, conf.hopsize, seed=args.seed,
        augment=aug,
    )

    frontend = MelFrontend(
        sampling_rate=conf.fs, n_fft=conf.winsize, num_mels=conf.num_mels,
        hop_size=conf.hopsize, win_size=conf.winsize, fmin=conf.fmin,
        fmax=conf.fmax, padding_left=conf.mel_pad_left,
    )
    mel_fn = jax.jit(lambda y: jnp.swapaxes(frontend(y), 1, 2))

    # --- mel statistics over a few batches (frozen into params) -------------
    # multi-host: each process iterates ITS dataset shard at the local batch
    # size; stats are then synced so every process freezes identical params
    local_bs = _cli_common.local_batch_size(batch_size)
    batches = trainset.batches(
        local_bs, host_id=jax.process_index(), num_hosts=jax.process_count()
    )
    stats_mels = []
    for _ in range(args.stats_batches):
        audio, _ = next(batches)
        stats_mels.append(np.asarray(mel_fn(jnp.asarray(audio))))
    cat = np.concatenate(stats_mels).reshape(-1, conf.num_mels)
    mean_std = (cat.mean(0), cat.std(0) + 1e-5)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        mean_std = tuple(multihost_utils.broadcast_one_to_all(mean_std))
    print(f"mel stats from {len(stats_mels)} batches: "
          f"mean[0]={mean_std[0][0]:.3f} std[0]={mean_std[1][0]:.3f}")

    mesh = make_mesh()
    trainer = BVRNNTrainer(conf, mesh=mesh, seed=args.seed, mean_std_mel=mean_std,
                          mel_mask={} if args.mel_mask else None,
                          fused_cell=args.fused_cell,
                          compute_dtype=args.compute_dtype,
                          unroll=args.scan_unroll)

    # auto-resume
    if conf.resume or ckpt.scan_checkpoint(args.checkpoint_path, "bvrnn_") is not None:
        restored, start = ckpt.restore_latest(
            args.checkpoint_path, "bvrnn_", target=trainer.state
        )
        if restored is not None:
            trainer.state = restored
            print(f"resumed from step {start}")

    # TensorBoard from process 0 only (reference rank gating, train.py:141-143)
    logger = TrainLogger(os.path.join(args.checkpoint_path, "logs")
                         if jax.process_index() == 0 else None)

    # --- validation: closed-loop greedy forward on held-out segments -------
    val_mels = None
    if args.input_validation_file:
        with open(args.input_validation_file) as f:
            val_files = [
                os.path.join(args.input_wavs_dir, line.split("|")[0])
                for line in f.read().splitlines() if line
            ]
        val_files = [f if f.endswith(".wav") else f + ".wav" for f in val_files]
        valset = AudioSegmentDataset(
            val_files, segment, conf.fs, conf.hopsize, shuffle=False, seed=0
        )
        val_audio = np.stack([valset[i][0] for i in range(len(valset))])
        val_mels = mel_fn(jnp.asarray(val_audio))

    val_interval = args.val_interval or conf.val_interval

    @jax.jit
    def val_metrics(params, mels):
        from bvsc_tpu.train.bvrnn_train import loss_fn

        B, T, _ = mels.shape
        bits = jnp.full((B, T), float(conf.z_dim))
        _, m = loss_fn(params, trainer.bcfg, mels, 1.0, bits, jax.random.key(0))
        return m

    @jax.jit
    def val_decoded_mel(params, mels):
        """Greedy closed-loop resynthesis of the first val segment, for the
        TensorBoard gt/decoded/delta spectrogram figures (the vocoder
        trainer logs the same triple; reference train.py:202-217)."""
        from bvsc_tpu.models.bvrnn import forward_train

        B, T, _ = mels.shape
        bits = jnp.full((B, T), float(conf.z_dim))
        mel_hat, _ = forward_train(
            params, trainer.bcfg, mels, 1.0, True, bits, jax.random.key(0)
        )
        return mel_hat

    best_val = [np.inf]

    def validate(step):
        if val_mels is None:
            return
        m = val_metrics(trainer.state.params, val_mels)
        logger.scalars(m, step, prefix="validation/")
        if logger._sw is not None:  # figures only when TB is live
            gt = np.asarray(val_mels[0]).T  # (M, T)
            dec = np.asarray(val_decoded_mel(trainer.state.params,
                                             val_mels[:1])[0]).T
            logger.spectrogram_figure("validation/gt_mel", gt, step)
            logger.spectrogram_figure("validation/decoded_mel", dec, step)
            logger.spectrogram_figure(
                "validation/delta_dclip1",
                np.clip(np.abs(gt - dec), 1e-6, 1.0), step)
        mse = float(m["mse"])
        print(f"validation @ {step}: mse={mse:.4f} "
              f"kld={float(m['kld']):.4f}")
        # keep the best-validation checkpoint alongside the periodic ones
        # (early stopping for tiny corpora where the final step overfits)
        if mse < best_val[0]:
            best_val[0] = mse
            ckpt.save_step(
                os.path.join(args.checkpoint_path, "best"), "bvrnn_", step,
                trainer.state,
            )
            print(f"  new best validation ({mse:.4f}) -> best/bvrnn_{step:08d}")

    if conf.validate_only:
        validate(int(trainer.state.step))
        return

    rng = jax.random.key(args.seed)
    t0 = time.time()
    steps = int(trainer.state.step)
    while steps < max_steps:
        audio, _ = next(batches)
        mel = shard_batch(mesh, mel_fn(jnp.asarray(audio)))
        metrics = trainer.step(mel, rng)
        steps = int(trainer.state.step)

        if steps % args.stdout_interval == 0:
            print(f"Steps : {steps}, loss : {float(metrics['loss']):.4f}, "
                  f"nll : {float(metrics['nll']):.4f}, "
                  f"kld : {float(metrics['kld']):.4f}, s/b : "
                  f"{(time.time() - t0) / args.stdout_interval:.3f}")
            t0 = time.time()
        if steps % 100 == 0:
            logger.scalars(metrics, steps)
        if steps % conf.distinct_chkpt_interval == 0:
            ckpt.save_step(args.checkpoint_path, "bvrnn_", steps, trainer.state)
            print(f"saved checkpoint at step {steps}")
        if steps % val_interval == 0:
            validate(steps)

    ckpt.save_step(args.checkpoint_path, "bvrnn_", steps, trainer.state)
    print(f"done at step {steps}")


if __name__ == "__main__":
    main()
