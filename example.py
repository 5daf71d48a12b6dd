"""Usage demo — mirrors the reference ``example.py`` flow.

Loads a MUSHRA stimulus, resamples to 22.05 kHz, codes it at 3 kbps one-shot
and in two steps, and writes the decoded wavs.  With no checkpoint paths the
model runs with random weights (the reference's pretrained checkpoints are
git-LFS pointers and not distributable); pass converted checkpoints for real
resynthesis quality.
"""

import numpy as np
import scipy.signal
from scipy.io import wavfile

from bvsc_tpu import BVRNNCodecModel

# instantiate the codec (optionally: BVRNNCodecModel(config, bvrnn_ckpt, voc_ckpt))
codec_model = BVRNNCodecModel()

# load a speech file, use first channel
fs_speech, data = wavfile.read(
    "/root/reference/mushra_results_dataset/audio/stim_01/ref.wav"
)
speech = np.atleast_2d(data.T)[0].astype(np.float64)
if data.dtype == np.int16:
    speech = speech / 32768.0

# resample to 22050 Hz and normalize
speech = scipy.signal.resample_poly(speech, 22050, fs_speech)
speech = (speech / np.max(np.abs(speech))).astype(np.float32)

## Example 1: encode with 3 kbps and decode in a single step
decoded = np.asarray(codec_model(speech[None, :], 3000))[0]
wavfile.write("stim_01_decoded.wav", 22050, (decoded * 32767).astype(np.int16))

## Example 2: encoding and decoding in two steps
length = speech.shape[0]
codes = codec_model.encode(speech[None, :], 3000)
decoded2 = np.asarray(codec_model.decode(codes, length))[0]
wavfile.write("stim_01_decoded2.wav", 22050, (decoded2 * 32767).astype(np.int16))

print("codes:", codes.shape, "decoded:", decoded.shape)
print("wrote stim_01_decoded.wav, stim_01_decoded2.wav")
