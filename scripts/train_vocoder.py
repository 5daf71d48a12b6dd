"""Vocoder GAN training CLI — TPU-native counterpart of the reference
``third_party/BigVGAN/train.py`` (same flags where meaningful).

Usage:
  python scripts/train_vocoder.py --config configs/varbitrate.toml \
      --input_wavs_dir WAVS --input_training_file train.txt \
      --input_validation_file val.txt --checkpoint_path exp/voc

Config may be a codec TOML (uses its ``vocoder_config`` table + DSP keys) or
a BigVGAN-style JSON.  Checkpoints are Orbax directories named
``g_XXXXXXXX`` / ``do_XXXXXXXX`` (reference naming, ``train.py:327,330``)
with auto-resume from the latest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _cli_common

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint_path", default="exp/vocoder")
    p.add_argument("--input_wavs_dir", default="")
    p.add_argument("--input_training_file", required=True)
    p.add_argument("--input_validation_file", default=None)
    p.add_argument("--input_mels_dir", default=None,
                   help="precomputed .npy mels for --fine_tuning")
    p.add_argument("--list_input_unseen_wavs_dir", nargs="+", default=[],
                   help="wav dirs of extra (unseen-speaker) validation sets "
                        "(reference train.py:391)")
    p.add_argument("--list_input_unseen_validation_file", nargs="+", default=[],
                   help="filelists of extra validation sets, validated with "
                        "mode tag unseen_<name> (reference train.py:392,"
                        "234-236)")
    p.add_argument("--training_epochs", type=int, default=100000)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--stdout_interval", type=int, default=5)
    p.add_argument("--checkpoint_interval", type=int, default=50000)
    p.add_argument("--summary_interval", type=int, default=100)
    p.add_argument("--validation_interval", type=int, default=50000)
    p.add_argument("--freeze_step", type=int, default=0)
    p.add_argument("--fine_tuning", action="store_true")
    p.add_argument("--augment", action="store_true",
                   help="on-the-fly speed perturbation (0.85-1.15) + random "
                        "gain (-10..0 dB) per crop (train split only) — "
                        "counters overfitting on tiny corpora; incompatible "
                        "with --fine_tuning (precomputed mels would desync "
                        "from the augmented waveform)")
    p.add_argument("--augment_full", action="store_true",
                   help="speed+gain plus additive noise, synthetic-RIR "
                        "reverb and WSOLA pitch shift (see train_bvrnn.py)")
    p.add_argument("--init_generator", default=None,
                   help="warm-start the generator from a g_ checkpoint or "
                        "exported npz (fresh discriminators/optimizers); "
                        "folded inference weights are re-parametrized as "
                        "weight norm.  Ignored when the run auto-resumes.")
    p.add_argument("--audio_scale", type=float, default=None,
                   help="multiply target audio by this; defaults to the "
                        "codec's -10 dB SCALING in --fine_tuning mode (the "
                        "dumped mels live in the scaled domain, see "
                        "scripts/dump_finetune_mels.py), else 1.0")
    p.add_argument("--debug", action="store_true", help="skip validation")
    p.add_argument("--evaluate", action="store_true", help="validate and exit")
    p.add_argument("--eval_subsample", type=int, default=5,
                   help="log audio/spectrogram figures for every nth "
                        "validation item (reference train.py:412,197)")
    p.add_argument("--skip_seen", action="store_true",
                   help="skip the seen-speaker validation loop, keep unseen "
                        "(reference train.py:414,231)")
    p.add_argument("--save_audio", action="store_true",
                   help="also write validation gt/generated wavs under "
                        "<checkpoint_path>/samples/ (reference train.py:416,"
                        "144-148,200-206)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--segment_size", type=int, default=8192)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--split_programs", choices=["auto", "on", "off"], default="auto",
                   help="per-discriminator program decomposition (mathematically "
                        "identical; keeps TPU AOT compiles tractable). auto = on "
                        "for TPU backends")
    _cli_common.add_platform_arg(p)
    _cli_common.add_distributed_args(p)
    return p.parse_args(argv)


def load_configs(args):
    from bvsc_tpu.config import CodecConfig, VocoderConfig
    from bvsc_tpu.train.vocoder_train import GANTrainConfig

    if args.config.endswith(".json"):
        with open(args.config) as f:
            raw = json.load(f)
        vcfg = VocoderConfig.from_dict(raw)
        tcfg = GANTrainConfig(
            learning_rate=raw.get("learning_rate", 1e-4),
            adam_b1=raw.get("adam_b1", 0.8),
            adam_b2=raw.get("adam_b2", 0.99),
            lr_decay=raw.get("lr_decay", 0.999),
            freeze_step=args.freeze_step,
            segment_size=raw.get("segment_size", args.segment_size),
            batch_size=args.batch_size or raw.get("batch_size", 32),
            sampling_rate=raw.get("sampling_rate", 22050),
            n_fft=raw.get("n_fft", 1024),
            hop_size=raw.get("hop_size", 256),
            win_size=raw.get("win_size", 1024),
            fmin=raw.get("fmin", 0),
            fmax=raw.get("fmax", 8000),
            fmax_for_loss=raw.get("fmax_for_loss"),
            mel_pad_left=raw.get("mel_pad_left", 256),
        )
    else:
        conf = CodecConfig.from_toml(args.config)
        vcfg = conf.vocoder_config
        tcfg = GANTrainConfig(
            freeze_step=args.freeze_step,
            segment_size=args.segment_size,
            batch_size=args.batch_size or conf.batch_size,
            sampling_rate=conf.fs,
            n_fft=conf.winsize,
            hop_size=conf.hopsize,
            win_size=conf.winsize,
            fmin=conf.fmin,
            fmax=conf.fmax,
            mel_pad_left=conf.mel_pad_left,
        )
    return vcfg, tcfg


def _augment_dict(args):
    if not (args.augment or getattr(args, "augment_full", False)):
        return None
    aug = {"speed": (0.85, 1.15), "gain_db": (-10.0, 0.0)}
    if getattr(args, "augment_full", False):
        aug.update({"noise_snr_db": (8.0, 30.0), "noise_p": 0.5,
                    "reverb_rt60": (0.1, 0.4), "reverb_p": 0.3,
                    "pitch_semitones": (-2.0, 2.0), "pitch_p": 0.3})
    return aug


def main(argv=None):
    args = parse_args(argv)
    _cli_common.setup_runtime(args)

    import jax
    import jax.numpy as jnp

    # GAN-step compiles are minutes cold on the tunneled AOT stack
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))

    from bvsc_tpu.data.dataset import AudioSegmentDataset
    from bvsc_tpu.eval.metrics import mel_l1, mrstft, pesq_wb_16k, stoi
    from bvsc_tpu.parallel.mesh import make_mesh, shard_batch
    from bvsc_tpu.train import checkpoint as ckpt
    from bvsc_tpu.train.vocoder_train import GANTrainState, VocoderGANTrainer
    from bvsc_tpu.utils.logging import TrainLogger
    from bvsc_tpu.models import vocoder as voc_mod

    vcfg, tcfg = load_configs(args)
    if jax.process_index() == 0:  # reference env.py:14-18 via train.py:427
        _cli_common.build_env(args.config, args.checkpoint_path)
    mesh = make_mesh()
    split = (
        jax.default_backend() == "tpu"
        if args.split_programs == "auto"
        else args.split_programs == "on"
    )
    trainer = VocoderGANTrainer(vcfg, tcfg, mesh=mesh, seed=args.seed,
                                split_programs=split)

    # auto-resume (reference train.py:63-79)
    restored, start_step = ckpt.restore_latest(
        args.checkpoint_path, "do_", target=trainer.state
    )
    if restored is not None:
        trainer.state = restored
        print(f"resumed from step {start_step}")
    elif args.init_generator:
        # warm-start the generator from a g_ checkpoint (fresh
        # discriminators/optimizers) — the fine-tune lineage when only the
        # shipped generator artifact exists.  Folded inference weights are
        # re-parametrized as weight norm (fold(unfold(w)) == w).
        import dataclasses as _dc

        from bvsc_tpu.models.vocoder import unfold_generator_params
        from bvsc_tpu.train.checkpoint import restore_pytree

        tree = restore_pytree(args.init_generator)
        gen = tree["generator"] if isinstance(tree, dict) and "generator" in tree else tree
        if isinstance(gen, dict) and "conv_pre" in gen and "g" not in gen["conv_pre"]:
            gen = unfold_generator_params(gen)
        gen = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float32), gen)
        trainer.state = _dc.replace(trainer.state, gen=gen)
        print(f"generator warm-started from {args.init_generator}")

    with open(args.input_training_file) as f:
        train_files = [
            os.path.join(args.input_wavs_dir, line.split("|")[0])
            for line in f.read().splitlines() if line
        ]
    train_files = [f if f.endswith(".wav") else f + ".wav" for f in train_files]
    if (args.augment or args.augment_full) and args.fine_tuning:
        raise SystemExit("--augment is incompatible with --fine_tuning "
                         "(precomputed mels would desync from the "
                         "augmented waveform)")
    trainset = AudioSegmentDataset(
        train_files, tcfg.segment_size, tcfg.sampling_rate, tcfg.hop_size,
        fine_tuning=args.fine_tuning, base_mels_path=args.input_mels_dir,
        seed=args.seed,
        augment=_augment_dict(args),
    )
    def read_filelist(filelist, wavs_dir):
        with open(filelist) as f:
            files = [
                os.path.join(wavs_dir, line.split("|")[0])
                for line in f.read().splitlines() if line
            ]
        return [f if f.endswith(".wav") else f + ".wav" for f in files]

    def set_name(filelist):
        return os.path.splitext(os.path.basename(filelist))[0]

    val_files = []
    if args.input_validation_file:
        val_files = read_filelist(args.input_validation_file,
                                  args.input_wavs_dir)
    # extra validation sets, mode-tagged unseen_<name> (ref train.py:127-140)
    if len(args.list_input_unseen_wavs_dir) != len(
            args.list_input_unseen_validation_file):
        raise SystemExit("--list_input_unseen_wavs_dir and "
                         "--list_input_unseen_validation_file must pair up")
    unseen_sets = [
        (f"unseen_{set_name(fl)}", read_filelist(fl, wd))
        for wd, fl in zip(args.list_input_unseen_wavs_dir,
                          args.list_input_unseen_validation_file)
    ]

    # TensorBoard from process 0 only (reference rank gating, train.py:141-143)
    logger = TrainLogger(os.path.join(args.checkpoint_path, "logs")
                         if jax.process_index() == 0 else None)

    # jitted validation forward (one program per distinct clip length,
    # persistently cached) — the eager fallback dispatches every conv
    # separately, which is pathological through a tunneled device
    import functools

    @functools.partial(jax.jit, static_argnames=("length",))
    def _val_fwd(gen, mel, length):
        return voc_mod.generator_apply(gen, vcfg, mel, length)

    def validate(step, files, mode="seen"):
        """One validation loop over `files`, metrics tagged validation_<mode>/
        (reference train.py:150-227: per-mode scalars, every
        --eval_subsample'th item's audio + spectrogram figures to
        TensorBoard, optional --save_audio wavs, PESQ skipped for
        "nonspeech" modes)."""
        if not files:
            return
        valset = AudioSegmentDataset(
            files, tcfg.segment_size, tcfg.sampling_rate, tcfg.hop_size,
            split=False, shuffle=False, seed=args.seed,
        )
        save_audio = args.save_audio and jax.process_index() == 0
        if save_audio:
            os.makedirs(os.path.join(args.checkpoint_path, "samples",
                                     f"gt_{mode}"), exist_ok=True)
            os.makedirs(os.path.join(args.checkpoint_path, "samples",
                                     f"{mode}_{step:08d}"), exist_ok=True)
        gen = trainer.state.gen
        errs, stfts, stois, pesqs = [], [], [], []
        for i in range(len(valset)):
            audio, _, _ = valset[i]
            mel = trainer.input_frontend(jnp.asarray(audio[None, :]))
            y_hat = _val_fwd(gen, mel, audio.shape[0])[:, 0, :]
            errs.append(mel_l1(trainer.loss_frontend, jnp.asarray(audio[None, :]), y_hat))
            stfts.append(mrstft(y_hat, audio[None, :]))
            try:
                stois.append(stoi(audio, np.asarray(y_hat[0]), tcfg.sampling_rate))
            except ValueError:  # clip too short/silent for STOI's 30 frames
                pass
            if "nonspeech" not in mode:  # ref train.py:186 PESQ guard
                p = pesq_wb_16k(audio, np.asarray(y_hat[0]), tcfg.sampling_rate)
                if p is not None:
                    pesqs.append(p)
            if i % args.eval_subsample == 0:  # ref train.py:197-217
                y_np = np.asarray(y_hat[0])
                logger.audio(f"gt_{mode}/y_{i}", audio, step, tcfg.sampling_rate)
                logger.audio(f"generated_{mode}/y_hat_{i}", y_np, step,
                             tcfg.sampling_rate)
                mel_hat = trainer.input_frontend(y_hat)
                logger.spectrogram_figure(f"gt_{mode}/y_spec_{i}",
                                          np.asarray(mel[0]), step)
                logger.spectrogram_figure(f"generated_{mode}/y_hat_spec_{i}",
                                          np.asarray(mel_hat[0]), step)
                t = min(mel.shape[-1], mel_hat.shape[-1])
                delta = np.clip(np.abs(np.asarray(mel[0, :, :t])
                                       - np.asarray(mel_hat[0, :, :t])),
                                1e-6, 1.0)
                logger.spectrogram_figure(f"delta_dclip1_{mode}/spec_{i}",
                                          delta, step)
                if save_audio:
                    from bvsc_tpu.data.audio import save_wav

                    save_wav(audio, os.path.join(
                        args.checkpoint_path, "samples", f"gt_{mode}",
                        f"{i:04d}.wav"), tcfg.sampling_rate)
                    save_wav(y_np, os.path.join(
                        args.checkpoint_path, "samples", f"{mode}_{step:08d}",
                        f"{i:04d}.wav"), tcfg.sampling_rate)
        logger.scalar(f"validation_{mode}/mel_spec_error", np.mean(errs), step)
        logger.scalar(f"validation_{mode}/mrstft", np.mean(stfts), step)
        if stois:
            logger.scalar(f"validation_{mode}/stoi", np.mean(stois), step)
        if pesqs:
            logger.scalar(f"validation_{mode}/pesq", np.mean(pesqs), step)
        print(f"validation @ {step} [{mode}]: mel_l1={np.mean(errs):.4f} "
              f"mrstft={np.mean(stfts):.4f}"
              + (f" stoi={np.mean(stois):.4f}" if stois else "")
              + (f" pesq={np.mean(pesqs):.3f}" if pesqs else " (pesq unavailable)"))

    def validate_all(step):
        if not args.skip_seen:  # ref train.py:231-233
            validate(step, val_files,
                     mode=f"seen_{set_name(args.input_validation_file)}"
                     if args.input_validation_file else "seen")
        for mode, files in unseen_sets:  # ref train.py:234-236
            validate(step, files, mode=mode)

    if args.evaluate:
        validate_all(int(trainer.state.step))
        return

    from bvsc_tpu.codec import SCALING

    audio_scale = args.audio_scale
    if audio_scale is None:
        audio_scale = SCALING if args.fine_tuning else 1.0

    steps = int(trainer.state.step)
    # resumed run starts with a validation pass (reference train.py:230-236)
    if steps != 0 and not args.debug:
        validate_all(steps)
    # multi-host: each process feeds its dataset shard at the local batch
    # size; shard_batch assembles the global batch over all processes
    batches = trainset.batches(
        _cli_common.local_batch_size(tcfg.batch_size),
        host_id=jax.process_index(), num_hosts=jax.process_count(),
    )
    steps_per_epoch = max(1, len(trainset) // tcfg.batch_size)
    t0 = time.time()
    for audio, mel_ft in batches:
        epoch = steps // steps_per_epoch
        trainer.set_epoch(epoch)
        y = shard_batch(mesh, jnp.asarray(audio * audio_scale))
        mel_in = None
        if mel_ft is not None:
            mel_in = shard_batch(mesh, jnp.asarray(mel_ft))
        metrics = trainer.step_on_audio(y, mel_in)
        steps += 1

        if steps % args.stdout_interval == 0:
            print(
                f"Steps : {steps}, Gen Loss Total : "
                f"{float(metrics['gen_loss_total']):.3f}, Mel-Spec. Error : "
                f"{float(metrics['mel_spec_error']):.3f}, s/b : "
                f"{(time.time() - t0) / args.stdout_interval:.3f}"
            )
            t0 = time.time()
        if steps % args.summary_interval == 0:
            logger.scalars(metrics, steps)
        if steps % args.checkpoint_interval == 0:
            ckpt.save_step(args.checkpoint_path, "g_", steps,
                           {"generator": trainer.generator_params_folded})
            ckpt.save_step(args.checkpoint_path, "do_", steps, trainer.state)
            print(f"saved checkpoints at step {steps}")
        if steps % args.validation_interval == 0 and not args.debug:
            # all processes run the jitted compute (SPMD requirement);
            # logging/saving inside are process-0 only
            validate_all(steps)
        if args.max_steps is not None and steps >= args.max_steps:
            break
    ckpt.save_step(args.checkpoint_path, "g_", steps,
                   {"generator": trainer.generator_params_folded})
    ckpt.save_step(args.checkpoint_path, "do_", steps, trainer.state)
    print(f"done at step {steps}")


if __name__ == "__main__":
    main()
