"""End-to-end demo: the committed demo checkpoints (chkpts/) through the public API."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
from bvsc_tpu import BVRNNCodecModel
from bvsc_tpu.data.audio import save_wav
from bvsc_tpu.ops.mel import MelFrontend
from evaluate_codec import load_22k

# stim_15 is held out from the demo-checkpoint training filelist
speech = load_22k('/root/reference/mushra_results_dataset/audio/stim_15/ref.wav')

codec = BVRNNCodecModel(
    "configs/varbitrate.toml",
    bvrnn_chkpt_path="chkpts/bvsc_bvrnn_demo_augfull_step1800_f16.npz",
    vocoder_chkpt_path="chkpts/bvsc_vocoder_demo_cl_ft_g_step600",
)
out = np.asarray(codec(speech[None, :], 3000))[0]
print("decoded:", out.shape, "finite:", np.isfinite(out).all(),
      "rms:", float(np.sqrt((out**2).mean())))
save_wav(out, "docs/artifacts/demo_stim15_3kbps.wav", 22050)

# objective: mel-L1 between input and resynthesis (the codec's fidelity axis)
mf = MelFrontend(sampling_rate=22050, n_fft=1024, num_mels=80, hop_size=256,
                 win_size=1024, fmin=0, fmax=8000, padding_left=256)
import jax.numpy as jnp
m_in = np.asarray(mf(jnp.asarray(speech[None, :])))
m_out = np.asarray(mf(jnp.asarray(out[None, : speech.shape[0]])))
T = min(m_in.shape[-1], m_out.shape[-1])
l1 = float(np.abs(m_in[..., :T] - m_out[..., :T]).mean())
print(f"mel-L1(in, resynth) = {l1:.3f}")

# baseline: random-init codec on the same input
rnd = BVRNNCodecModel("configs/varbitrate.toml")
out_r = np.asarray(rnd(speech[None, :], 3000))[0]
m_r = np.asarray(mf(jnp.asarray(out_r[None, : speech.shape[0]])))
l1_r = float(np.abs(m_in[..., :T] - m_r[..., :T]).mean())
print(f"mel-L1 random-init baseline = {l1_r:.3f}")
