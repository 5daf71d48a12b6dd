"""bvsc_tpu — TPU-native (JAX/XLA/Pallas) bitrate-scalable variational speech codec.

A from-scratch framework with the capabilities of
``BenjSta/bernoulli-var-speech-codec`` (IEEE Access 2024), redesigned
TPU-first: scan-based recurrent codec core, XLA-compiled DSP frontend,
causal vocoder, data-parallel trainers over ``jax.sharding`` meshes, and a
batched multi-stream serving engine.
"""

import os as _os

# Persistent XLA compilation cache: full-size scan compiles take minutes on
# tunneled TPU backends, seconds when cached.  Opt out by setting
# BVSC_NO_COMPILE_CACHE=1 or pre-setting JAX_COMPILATION_CACHE_DIR.
if not _os.environ.get("BVSC_NO_COMPILE_CACHE"):
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/jax_comp"),
    )

from bvsc_tpu.config import CodecConfig, VocoderConfig, load_config

__all__ = [
    "CodecConfig",
    "VocoderConfig",
    "load_config",
    "BVRNNCodecModel",
    "PriorEntropyCoder",
]

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy import: keep `import bvsc_tpu` light (config-only) so data/eval
    # tools can load without pulling in JAX model code.
    if name == "BVRNNCodecModel":
        from bvsc_tpu.codec import BVRNNCodecModel

        return BVRNNCodecModel
    if name == "PriorEntropyCoder":
        from bvsc_tpu.entropy import PriorEntropyCoder

        return PriorEntropyCoder
    raise AttributeError(name)
