"""Checkpoint selection: end-to-end held-out mel-L1 for new vocoder candidates."""
import os, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp
from bvsc_tpu import BVRNNCodecModel
from bvsc_tpu.ops.mel import MelFrontend
from evaluate_codec import load_22k

speech = load_22k('/root/reference/mushra_results_dataset/audio/stim_15/ref.wav')
mf = MelFrontend(sampling_rate=22050, n_fft=1024, num_mels=80, hop_size=256,
                 win_size=1024, fmin=0, fmax=8000, padding_left=256)
m_in = np.asarray(mf(jnp.asarray(speech[None, :])))

CANDS = [
    ("shipped_ft450", "chkpts/bvsc_vocoder_demo_ftbvrnn_g_step450"),
    ("gan_g2000", "exp/voc_tpu/g_00002000"),
    ("gan_g2300", "exp/voc_tpu/g_00002300"),
    ("ft3_g2400", "exp/voc_ft3/g_00002400"),
    ("ft3_g2600", "exp/voc_ft3/g_00002600"),
]

for name, path in CANDS:
    codec = BVRNNCodecModel(
        "configs/varbitrate.toml",
        bvrnn_chkpt_path="chkpts/bvsc_bvrnn_demo_step3000_f16.npz",
        vocoder_chkpt_path=path,
    )
    out = np.asarray(codec(speech[None, :], 3000))[0]
    m_out = np.asarray(mf(jnp.asarray(out[None, : speech.shape[0]])))
    T = min(m_in.shape[-1], m_out.shape[-1])
    l1 = float(np.abs(m_in[..., :T] - m_out[..., :T]).mean())
    print(f"{name:16s} {path:45s} mel-L1={l1:.3f}", flush=True)
