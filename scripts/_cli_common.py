"""Shared setup for the trainer CLIs (train_bvrnn.py, train_vocoder.py)."""

from __future__ import annotations


def add_platform_arg(parser) -> None:
    parser.add_argument(
        "--platform", default="default",
        help="force a jax platform (e.g. 'cpu' for functional checks); env "
             "vars are read too late when a device plugin registers at "
             "interpreter start")


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
