"""Shared setup for the trainer CLIs (train_bvrnn.py, train_vocoder.py)."""

from __future__ import annotations


def add_platform_arg(parser) -> None:
    parser.add_argument(
        "--platform", default="default",
        help="force a jax platform (e.g. 'cpu' for functional checks); env "
             "vars are read too late when a device plugin registers at "
             "interpreter start")


def add_distributed_args(parser) -> None:
    """Multi-host training flags — the reference DDP's ``init_process_group``
    equivalent (reference ``third_party/BigVGAN/train.py:36-38,438-441``),
    via ``jax.distributed``: launch one process per host, point them all at
    process 0, and the device mesh spans every host (batch is sharded
    per-host; gradient psum rides ICI/DCN)."""
    parser.add_argument(
        "--coordinator_address", default=None,
        help="host:port of process 0; presence enables multi-host mode")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)


def setup_runtime(args) -> None:
    """Faulthandler for stall diagnosis + optional jax platform forcing.

    Must run before the first backend init (``jax.devices()`` or any op) —
    see tests/conftest.py for why config-level forcing is the only reliable
    mechanism under a device plugin that registers at interpreter start.
    """
    import faulthandler
    import signal

    try:
        # stall diagnosis: `kill -USR1 <pid>` dumps all thread stacks
        faulthandler.register(signal.SIGUSR1)
    except (ValueError, OSError):
        pass  # stderr has no real fd (redirected/captured context)

    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
        jax.config.update("jax_platform_name", args.platform)

    if getattr(args, "coordinator_address", None):
        # after platform forcing, before the first backend init
        import jax

        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )


def build_env(config_path: str, checkpoint_path: str) -> None:
    """Copy the config beside the checkpoints as ``config.<ext>`` so a run
    directory is self-describing (reference ``env.py:14-18`` via
    ``train.py:427``); the synthesis CLI can then find it automatically
    (reference ``inference.py:83-89``)."""
    import os
    import shutil

    ext = os.path.splitext(config_path)[1] or ".toml"
    target = os.path.join(checkpoint_path, "config" + ext)
    if os.path.abspath(config_path) != os.path.abspath(target):
        os.makedirs(checkpoint_path, exist_ok=True)
        shutil.copyfile(config_path, target)


def find_config_near(checkpoint_file: str) -> str | None:
    """A ``config.toml``/``config.json`` in the checkpoint's directory
    (reference ``inference.py:83``: config.json next to the ckpt file).
    Orbax checkpoints are directories, so also look one level up."""
    import os

    ckpt = os.path.abspath(checkpoint_file)
    dirs = [os.path.dirname(ckpt)]
    if os.path.isdir(ckpt):
        dirs.insert(0, ckpt)
    for d in dirs:
        for name in ("config.toml", "config.json"):
            cand = os.path.join(d, name)
            if os.path.isfile(cand):
                return cand
    return None


def local_batch_size(global_batch: int) -> int:
    """Per-process batch (reference divides the batch by the world size,
    ``train.py:433``)."""
    import jax

    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"batch_size {global_batch} not divisible by {n} processes"
        )
    return global_batch // n
