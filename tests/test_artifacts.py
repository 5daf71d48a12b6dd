"""Guard the committed demo artifacts (chkpts/) and their exporter.

The demo checkpoints are the round's trainability evidence (docs/TRAINING.md);
these tests make sure the shipped files stay loadable through the public API
path (``BVRNNCodecModel(bvrnn_chkpt_path=...)`` -> ``_load_bvrnn_checkpoint``)
and that ``scripts/export_bvrnn_npz.py`` remains the exact inverse of the
loader's un-flattening.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _shipped_npzs():
    d = os.path.join(REPO, "chkpts")
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".npz")
    )


def test_exporter_flatten_inverts_loader(tmp_path):
    """export_bvrnn_npz.flatten ∘ _unflatten_npz == identity on a params tree
    (modulo the exporter's f16 cast)."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from export_bvrnn_npz import flatten

    from bvsc_tpu.codec import _load_bvrnn_checkpoint
    from bvsc_tpu.models import bvrnn as bvrnn_mod

    cfg = bvrnn_mod.BVRNNConfig(x_dim=16, h_dim=32, z_dim=8)
    params = bvrnn_mod.init_bvrnn_params(jax.random.key(0), cfg)
    flat = {k: v.astype(np.float16) for k, v in flatten(params)}
    path = tmp_path / "tiny.npz"
    np.savez_compressed(path, **flat)

    loaded = _load_bvrnn_checkpoint(str(path), jnp.float32)
    assert jax.tree.structure(loaded) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b, np.float16).astype(np.float32)
        )


@pytest.mark.parametrize("path", _shipped_npzs(), ids=os.path.basename)
def test_shipped_bvrnn_npz_loads(path):
    """Every committed .npz demo checkpoint unflattens to the exact pytree
    structure of a varbitrate-config BVRNN, with finite parameters."""
    from bvsc_tpu.codec import _load_bvrnn_checkpoint
    from bvsc_tpu.config import CodecConfig
    from bvsc_tpu.models import bvrnn as bvrnn_mod

    conf = CodecConfig.from_toml(os.path.join(REPO, "configs/varbitrate.toml"))
    ref = bvrnn_mod.init_bvrnn_params(
        jax.random.key(0),
        bvrnn_mod.BVRNNConfig(
            x_dim=conf.num_mels, h_dim=conf.h_dim, z_dim=conf.z_dim
        ),
    )
    loaded = _load_bvrnn_checkpoint(path, jnp.float32)
    assert jax.tree.structure(loaded) == jax.tree.structure(ref)
    for got, want in zip(jax.tree.leaves(loaded), jax.tree.leaves(ref)):
        assert got.shape == want.shape
        assert bool(jnp.isfinite(got).all())


def test_shipped_vocoder_checkpoint_loads():
    """The committed Orbax vocoder generator restores through the codec's
    loader (weight-norm already folded) and matches the config's shapes."""
    from bvsc_tpu.codec import _load_vocoder_checkpoint
    from bvsc_tpu.config import CodecConfig
    from bvsc_tpu.models import vocoder as voc_mod

    dirs = [
        os.path.join(REPO, "chkpts", d)
        for d in os.listdir(os.path.join(REPO, "chkpts"))
        if os.path.isdir(os.path.join(REPO, "chkpts", d))
    ]
    assert dirs, "no committed vocoder checkpoint directory"
    conf = CodecConfig.from_toml(os.path.join(REPO, "configs/varbitrate.toml"))
    ref = voc_mod.init_generator_params(
        jax.random.key(0), conf.vocoder_config, weight_norm=False
    )
    for d in dirs:
        loaded = _load_vocoder_checkpoint(d, conf.vocoder_config, jnp.float32)
        assert jax.tree.structure(loaded) == jax.tree.structure(ref)
        for got, want in zip(jax.tree.leaves(loaded), jax.tree.leaves(ref)):
            assert got.shape == want.shape
            assert bool(jnp.isfinite(got).all())
