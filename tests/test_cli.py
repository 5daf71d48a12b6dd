"""Smoke tests for the user-facing CLI scripts (scripts/*.py).

The reference's CLI surface is its train/inference scripts (reference
``third_party/BigVGAN/train.py:379-441``, ``inference.py:73-104``); ours are
``scripts/train_bvrnn.py``, ``train_vocoder.py``, ``synthesize.py``,
``evaluate_codec.py``, ``codec_cli.py``.  Each exposes ``main(argv)``, so the
whole arg-parsing + wiring path is testable in-process on a tiny config —
these tests guard the flag surface and end-to-end plumbing, not numerics
(covered elsewhere).
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

TINY_TOML = """\
train_name = "tiny"
fs = 8000
winsize = 256
hopsize = 64
num_mels = 8
fmin = 0
fmax = 4000
mel_pad_left = 64

h_dim = 24
z_dim = 6
log_sigma_init = -1.0
var_bit = true

batch_size = 8
learning_rate = 0.001
lr_decay = 0.9999
scheduler_max_steps = 100
adam_b1 = 0.8
adam_b2 = 0.99
grad_clip = 100
max_steps = 100
val_interval = 2
distinct_chkpt_interval = 100
num_workers = 0
train_seq_duration = 0.25
teacher_force_step_1perc = 10
p_bitratechange = 0.3
validate_only = false
resume = false
vocoder_checkpoint = ""

vocoder_config.resblock = "1"
vocoder_config.num_mels = 8
vocoder_config.upsample_rates = [4, 4, 2, 2]
vocoder_config.upsample_kernel_sizes = [8, 8, 4, 4]
vocoder_config.upsample_initial_channel = 16
vocoder_config.resblock_kernel_sizes = [3]
vocoder_config.resblock_dilation_sizes = [[1, 3]]
vocoder_config.activation = "snakebeta"
vocoder_config.snake_logscale = true
vocoder_config.pre_sym = false
vocoder_config.post_sym = false
vocoder_config.layers_sym = [false, false, false, false]
vocoder_config.layers_antialias = [false, false, false, false]
vocoder_config.antialias_post = false
vocoder_config.resolutions = [[64, 16, 32], [128, 32, 64], [32, 8, 16]]
vocoder_config.mpd_reshapes = [2, 3]
vocoder_config.use_spectral_norm = false
vocoder_config.discriminator_channel_mult = 0.25
"""


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    """Tiny config + wav corpus + filelists, shared by the CLI tests."""
    from bvsc_tpu.data.audio import save_wav

    root = tmp_path_factory.mktemp("cli")
    (root / "wavs").mkdir()
    rng = np.random.default_rng(0)
    names = [f"utt_{i}" for i in range(3)]
    t = np.arange(int(0.8 * 8000)) / 8000.0
    for i, name in enumerate(names):
        wav = 0.5 * np.sin(2 * np.pi * (150 + 60 * i) * t)
        wav += 0.05 * rng.standard_normal(t.shape)
        save_wav(wav.astype(np.float32), str(root / "wavs" / f"{name}.wav"), 8000)
    (root / "train.txt").write_text("\n".join(names[:2]) + "\n")
    (root / "val.txt").write_text(names[2] + "\n")
    (root / "tiny.toml").write_text(TINY_TOML)
    return root


@pytest.fixture()
def test_cache_env(monkeypatch):
    """Keep trainer mains on the test compilation cache: they call
    jax.config.update(cache_dir) themselves, honoring this env var —
    without it they'd flip the session-global config to the production
    cache for every later test."""
    monkeypatch.setenv(
        "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_tests"
    )


@pytest.mark.slow
def test_train_bvrnn_cli(cli_env, tmp_path, capsys, test_cache_env):
    """2 steps of the BVRNN trainer CLI: resume scan, mel stats, sharded
    steps, validation (val_interval=2 fires) + best-checkpoint keeping."""
    import train_bvrnn

    ckdir = tmp_path / "run"
    train_bvrnn.main([
        "--config", str(cli_env / "tiny.toml"),
        "--input_wavs_dir", str(cli_env / "wavs"),
        "--input_training_file", str(cli_env / "train.txt"),
        "--input_validation_file", str(cli_env / "val.txt"),
        "--checkpoint_path", str(ckdir),
        "--max_steps", "2", "--batch_size", "8",
        "--stdout_interval", "1", "--stats_batches", "1",
        "--platform", "cpu",
    ])
    out = capsys.readouterr().out
    assert "Steps : 2" in out
    assert "validation @ 2" in out
    assert os.path.isdir(ckdir / "best")


@pytest.mark.slow
def test_train_vocoder_cli(cli_env, tmp_path, capsys, test_cache_env):
    """1 GAN step through the vocoder trainer CLI (un-split program path)."""
    import train_vocoder

    ckdir = tmp_path / "voc"
    train_vocoder.main([
        "--config", str(cli_env / "tiny.toml"),
        "--input_wavs_dir", str(cli_env / "wavs"),
        "--input_training_file", str(cli_env / "train.txt"),
        "--checkpoint_path", str(ckdir),
        "--max_steps", "1", "--batch_size", "8",
        "--segment_size", "512", "--stdout_interval", "1",
        "--split_programs", "off", "--debug", "--augment",
        "--platform", "cpu",
    ])
    out = capsys.readouterr().out
    assert "Steps : 1" in out

    # --augment with --fine_tuning must be rejected (mel/wave desync)
    with pytest.raises(SystemExit, match="incompatible"):
        train_vocoder.main([
            "--config", str(cli_env / "tiny.toml"),
            "--input_wavs_dir", str(cli_env / "wavs"),
            "--input_training_file", str(cli_env / "train.txt"),
            "--checkpoint_path", str(tmp_path / "voc_ft"),
            "--max_steps", "1", "--batch_size", "8",
            "--segment_size", "512",
            "--augment", "--fine_tuning",
            "--input_mels_dir", str(tmp_path),
            "--platform", "cpu",
        ])


def test_synthesize_cli(cli_env, tmp_path, capsys):
    """wav -> mel -> vocoder synthesis CLI writes one output per input."""
    import jax
    import synthesize

    from bvsc_tpu.config import CodecConfig
    from bvsc_tpu.models import vocoder as voc_mod
    from bvsc_tpu.train import checkpoint as ckpt

    conf = CodecConfig.from_toml(str(cli_env / "tiny.toml"))
    params = voc_mod.init_generator_params(
        jax.random.key(0), conf.vocoder_config, weight_norm=True
    )
    gpath = tmp_path / "g_00000001"
    ckpt.save_pytree(str(gpath), {"generator": params})

    outdir = tmp_path / "synth_out"
    synthesize.main([
        "--input_wavs_dir", str(cli_env / "wavs"),
        "--output_dir", str(outdir),
        "--checkpoint_file", str(gpath),
        "--config", str(cli_env / "tiny.toml"),
        "--fs_out", "4000",
    ])
    outs = sorted(os.listdir(outdir))
    assert outs == [f"utt_{i}_generated.wav" for i in range(3)]

    # --config omitted: a config.toml beside the checkpoint is discovered
    # (reference inference.py:83 loads config.json next to the ckpt)
    import shutil

    shutil.copyfile(cli_env / "tiny.toml", tmp_path / "config.toml")
    outdir2 = tmp_path / "synth_out2"
    synthesize.main([
        "--input_wavs_dir", str(cli_env / "wavs"),
        "--output_dir", str(outdir2),
        "--checkpoint_file", str(gpath),
    ])
    out = capsys.readouterr().out
    assert f"using config {tmp_path / 'config.toml'}" in out
    assert len(os.listdir(outdir2)) == 3


def test_select_vocoder_ckpt_cli(cli_env, tmp_path, capsys):
    """Checkpoint-selection CLI ranks candidate generators end-to-end."""
    import jax
    import numpy as np
    import select_vocoder_ckpt
    from export_bvrnn_npz import flatten

    from bvsc_tpu.config import CodecConfig
    from bvsc_tpu.models import bvrnn as bvrnn_mod
    from bvsc_tpu.models import vocoder as voc_mod
    from bvsc_tpu.train import checkpoint as ckpt

    conf = CodecConfig.from_toml(str(cli_env / "tiny.toml"))
    bparams = bvrnn_mod.init_bvrnn_params(
        jax.random.key(0),
        bvrnn_mod.BVRNNConfig(
            x_dim=conf.num_mels, h_dim=conf.h_dim, z_dim=conf.z_dim
        ),
    )
    npz = tmp_path / "bvrnn.npz"
    np.savez(npz, **{k: v for k, v in flatten(bparams)})
    cands = []
    for i in range(2):
        g = voc_mod.init_generator_params(
            jax.random.key(10 + i), conf.vocoder_config, weight_norm=False
        )
        path = tmp_path / f"g_0000000{i}"
        ckpt.save_pytree(str(path), {"generator": g})
        cands.append(str(path))

    select_vocoder_ckpt.main([
        "--config", str(cli_env / "tiny.toml"),
        "--bvrnn_checkpoint", str(npz),
        "--candidates", *cands,
        "--stimuli", str(cli_env / "wavs" / "utt_0.wav"),
        "--bitrate", "200",
    ])
    out = capsys.readouterr().out
    assert "g_00000000" in out and "g_00000001" in out


def test_evaluate_codec_cli(cli_env, tmp_path):
    """Objective eval CLI on a flat wav dir with a random-init tiny codec,
    including the JSON report."""
    import json

    import evaluate_codec

    out_json = tmp_path / "eval.json"
    evaluate_codec.main([
        "--config", str(cli_env / "tiny.toml"),
        "--stimuli_dir", str(cli_env / "wavs"),
        "--bitrates", "200",
        "--limit", "1",
        "--out_json", str(out_json),
    ])
    report = json.loads(out_json.read_text())
    assert report["summary"]["200.0"]["mel_l1"] > 0


def test_export_serving_cli(cli_env, tmp_path, capsys):
    """Serving-bundle exporter CLI: export a tiny codec, reload the bundle,
    run one exported program."""
    import jax
    import numpy as np
    import export_serving
    from export_bvrnn_npz import flatten

    from bvsc_tpu.config import CodecConfig
    from bvsc_tpu.models import bvrnn as bvrnn_mod

    conf = CodecConfig.from_toml(str(cli_env / "tiny.toml"))
    bparams = bvrnn_mod.init_bvrnn_params(
        jax.random.key(0),
        bvrnn_mod.BVRNNConfig(
            x_dim=conf.num_mels, h_dim=conf.h_dim, z_dim=conf.z_dim
        ),
    )
    npz = tmp_path / "bvrnn.npz"
    np.savez(npz, **{k: v for k, v in flatten(bparams)})

    out = tmp_path / "tiny.bvscx"
    export_serving.main([
        "--config", str(cli_env / "tiny.toml"),
        "--bvrnn", str(npz),
        "--out", str(out),
        "--seconds", "0.25",
        "--platforms", "cpu",
        "--no_packet",
        "--platform", "cpu",
    ])
    assert "buckets" in capsys.readouterr().out

    from bvsc_tpu.serve.export import ServingBundle

    bundle = ServingBundle.load(str(out))
    codes = bundle.encode(np.zeros((1, 1600), np.float32), 200)
    assert codes.shape == (1, 1600 // conf.hopsize, conf.z_dim)


def test_prepare_demo_data_cli(cli_env, tmp_path):
    """Corpus-prep CLI: rebuild a training corpus + filelists from a
    directory of stim_*/ref.wav sources (the docs/TRAINING.md data path)."""
    import prepare_demo_data

    from bvsc_tpu.data.audio import load_wav, save_wav

    # stage a fake reference layout at a non-22050 rate to exercise resample
    src = tmp_path / "audio"
    rng = np.random.default_rng(1)
    for i in range(3):
        d = src / f"stim_{i:02d}"
        d.mkdir(parents=True)
        save_wav(rng.uniform(-0.5, 0.5, 2400).astype(np.float32),
                 str(d / "ref.wav"), 24000)

    out = tmp_path / "corpus"
    prepare_demo_data.main([
        "--src", str(src), "--out", str(out), "--val", "stim_02",
    ])
    train = (out / "train.txt").read_text().split()
    val = (out / "val.txt").read_text().split()
    assert train == ["stim_00", "stim_01"] and val == ["stim_02"]
    x, fs = load_wav(str(out / "wavs" / "stim_00.wav"))
    assert fs == 22050 and x.shape[0] == 2205

    with pytest.raises(SystemExit, match="not found"):
        prepare_demo_data.main(
            ["--src", str(src), "--out", str(out), "--val", "stim_99"])


@pytest.mark.slow
def test_serve_daemon_cli_sigterm(cli_env):
    """The daemon CLI serves a stream end-to-end and shuts down cleanly on
    SIGTERM (the service-manager stop signal), exit code 0."""
    import signal
    import subprocess

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/.cache/jax_comp_tests"
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve_daemon.py"),
         "--config", str(cli_env / "tiny.toml"),
         "--port", "0", "--max_streams", "2", "--platform", "cpu"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env, text=True,
    )
    try:
        line = proc.stdout.readline()  # blocks until the daemon is up
        assert "BVSP/1 serving on" in line, line
        port = int(line.split()[3].rsplit(":", 1)[1])

        from bvsc_tpu.serve.client import CodecClient

        x = np.zeros(1024, np.float32)
        with CodecClient("127.0.0.1", port, mode="resynth",
                         bitrate=200, timeout=300) as c:
            c.send_audio(x)
            c.close_input()
            out = c.drain()
        assert out["audio"].size > 0

        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_compare_reference_conditions_cli(tmp_path, capsys):
    """Published-conditions scorer on one real stimulus dir (--skip_ours:
    no model run, pure metric path + ratings CSV join)."""
    import json

    import compare_reference_conditions

    out_json = tmp_path / "cond.json"
    compare_reference_conditions.main([
        "--skip_ours", "--limit", "1", "--out_json", str(out_json),
    ])
    report = json.loads(out_json.read_text())
    conds = report["conditions"]
    # every published wav scored, MUSHRA means joined from the ratings CSV
    assert conds["prop_13.wav"]["mushra_condition"] == "Proposed 1.38"
    assert conds["prop_55.wav"]["mel_l1"] > 0
    assert {"mel_l1", "mrstft", "stoi", "mcd_db"} <= set(
        report["spearman_vs_mushra"])


@pytest.mark.slow
def test_train_vocoder_validation_modes(cli_env, tmp_path, capsys,
                                        test_cache_env):
    """--evaluate drives the full per-mode validation surface: seen +
    unseen_<name> loops, --eval_subsample figure cadence, --save_audio
    sample dumps (reference train.py:150-236,412-416)."""
    import train_vocoder

    ckdir = tmp_path / "voc_eval"
    train_vocoder.main([
        "--config", str(cli_env / "tiny.toml"),
        "--input_wavs_dir", str(cli_env / "wavs"),
        "--input_training_file", str(cli_env / "train.txt"),
        "--input_validation_file", str(cli_env / "val.txt"),
        "--list_input_unseen_wavs_dir", str(cli_env / "wavs"),
        "--list_input_unseen_validation_file", str(cli_env / "train.txt"),
        "--checkpoint_path", str(ckdir),
        "--evaluate", "--eval_subsample", "1", "--save_audio",
        "--split_programs", "off",
        "--platform", "cpu",
    ])
    out = capsys.readouterr().out
    assert "[seen_val]" in out and "[unseen_train]" in out
    # gt + step-0 generated wavs for both modes, one per --eval_subsample item
    assert sorted(os.listdir(ckdir / "samples" / "gt_seen_val")) == ["0000.wav"]
    assert len(os.listdir(ckdir / "samples" / "unseen_train_00000000")) == 2

    # --skip_seen drops the seen loop, keeps unseen (reference train.py:231)
    train_vocoder.main([
        "--config", str(cli_env / "tiny.toml"),
        "--input_wavs_dir", str(cli_env / "wavs"),
        "--input_training_file", str(cli_env / "train.txt"),
        "--input_validation_file", str(cli_env / "val.txt"),
        "--list_input_unseen_wavs_dir", str(cli_env / "wavs"),
        "--list_input_unseen_validation_file", str(cli_env / "train.txt"),
        "--checkpoint_path", str(ckdir),
        "--evaluate", "--skip_seen",
        "--split_programs", "off",
        "--platform", "cpu",
    ])
    out = capsys.readouterr().out
    assert "[seen_val]" not in out and "[unseen_train]" in out
