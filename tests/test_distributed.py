"""REAL multi-process training test (jax.distributed over localhost).

The reference scales with DDP: one process per GPU, NCCL all-reduce
(``third_party/BigVGAN/train.py:36-38,438-441``).  Our equivalent is
``jax.distributed.initialize`` + a device mesh spanning all processes
(trainer CLIs: ``--coordinator_address/--num_processes/--process_id``).
This test actually launches TWO trainer processes (2 virtual CPU devices
each = a 4-device global mesh), with per-process dataset shards assembled
into the global batch by ``shard_batch`` — the full DDP-replacement path,
executed for real, not simulated.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_cli import TINY_TOML  # noqa: E402


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_bvrnn_training(tmp_path):
    from bvsc_tpu.data.audio import save_wav

    wavs = tmp_path / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(0)
    names = [f"utt_{i}" for i in range(4)]  # 2 files per host shard
    t = np.arange(int(0.8 * 8000)) / 8000.0
    for i, name in enumerate(names):
        wav = 0.5 * np.sin(2 * np.pi * (150 + 60 * i) * t)
        wav += 0.05 * rng.standard_normal(t.shape)
        save_wav(wav.astype(np.float32), str(wavs / f"{name}.wav"), 8000)
    (tmp_path / "train.txt").write_text("\n".join(names) + "\n")
    (tmp_path / "tiny.toml").write_text(TINY_TOML)

    port = _free_port()
    ckdir = tmp_path / "run"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/.cache/jax_comp_tests"

    def launch(pid):
        return subprocess.Popen(
            [
                sys.executable, os.path.join(REPO, "scripts/train_bvrnn.py"),
                "--config", str(tmp_path / "tiny.toml"),
                "--input_wavs_dir", str(wavs),
                "--input_training_file", str(tmp_path / "train.txt"),
                "--checkpoint_path", str(ckdir),
                "--max_steps", "2", "--batch_size", "8",
                "--stdout_interval", "1", "--stats_batches", "1",
                "--platform", "cpu",
                "--coordinator_address", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(pid),
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )

    procs = [launch(0), launch(1)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"rc={p.returncode}\n{out[-2000:]}\n{err[-4000:]}"
        outs.append(out)

    # both processes ran both steps, and the psum'd (replicated) losses are
    # IDENTICAL across processes — the all-reduce really happened
    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("Steps : 2,")]
        assert lines, out[-2000:]
        losses.append(lines[-1].split(", s/b")[0])  # drop wall-clock timing
    assert losses[0] == losses[1], losses

    # the (coordinated, multihost) Orbax save produced a loadable checkpoint
    from bvsc_tpu.train.checkpoint import scan_checkpoint

    assert scan_checkpoint(str(ckdir), "bvrnn_") is not None
