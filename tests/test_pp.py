"""Pipeline-parallel two-stage resynthesis == per-microbatch composition.

The PP scheme (parallel/pp.py): stage 0 (BVRNN encode_decode scan) and
stage 1 (causal generator) on separate devices, microbatches flowing
through one ppermute hop per schedule step.  The pipelined output must be
numerically identical to running each microbatch through the unpipelined
composition on one device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bvsc_tpu.models import bvrnn as jbvrnn
from bvsc_tpu.models import vocoder as jvoc
from bvsc_tpu.parallel.pp import make_pp_mesh, pipeline_resynth
from test_codec import small_conf

N_MICRO, M, T = 3, 2, 16


@pytest.fixture(scope="module")
def setup():
    conf = small_conf()
    vcfg = conf.vocoder_config
    bcfg = jbvrnn.BVRNNConfig(
        x_dim=conf.num_mels, h_dim=conf.h_dim, z_dim=conf.z_dim, var_bit=True
    )
    bparams = jbvrnn.init_bvrnn_params(jax.random.key(0), bcfg)
    vparams = jvoc.init_generator_params(jax.random.key(1), vcfg, weight_norm=False)
    rng = np.random.default_rng(5)
    mel_mb = jnp.asarray(
        rng.standard_normal((N_MICRO, M, T, bcfg.x_dim)), jnp.float32
    )
    bits_mb = jnp.asarray(
        rng.integers(1, bcfg.z_dim + 1, size=(N_MICRO, M, T)), jnp.float32
    )
    return bparams, bcfg, vparams, vcfg, mel_mb, bits_mb


def _reference(bparams, bcfg, vparams, vcfg, mel_mb, bits_mb):
    codes, wavs = [], []
    for i in range(mel_mb.shape[0]):
        z, mel_dec, _ = jbvrnn.encode_decode(
            bparams, bcfg, mel_mb[i], bits_mb[i], jnp.zeros((M, bcfg.h_dim))
        )
        wav = jvoc.generator_apply(
            vparams, vcfg, jnp.swapaxes(mel_dec, 1, 2),
            T * vcfg.total_upsample, precision=jax.lax.Precision.HIGHEST,
        )
        codes.append(np.asarray(z))
        wavs.append(np.asarray(wav))
    return np.stack(codes), np.stack(wavs)


def test_pp_matches_unpipelined(setup):
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual multi-device harness")
    bparams, bcfg, vparams, vcfg, mel_mb, bits_mb = setup
    z_ref, wav_ref = _reference(bparams, bcfg, vparams, vcfg, mel_mb, bits_mb)
    mesh = make_pp_mesh()
    codes, wav = pipeline_resynth(
        bparams, bcfg, vparams, vcfg, mel_mb, bits_mb, mesh,
        precision=jax.lax.Precision.HIGHEST,
    )
    assert codes.shape == (N_MICRO, M, T, bcfg.z_dim)
    assert wav.shape == (N_MICRO, M, 1, T * vcfg.total_upsample)
    np.testing.assert_array_equal(np.asarray(codes), z_ref)
    np.testing.assert_allclose(np.asarray(wav), wav_ref, atol=1e-6)


def test_pp_jits(setup):
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual multi-device harness")
    bparams, bcfg, vparams, vcfg, mel_mb, bits_mb = setup
    mesh = make_pp_mesh()

    @jax.jit
    def fn(bp, vp, m, b):
        return pipeline_resynth(bp, bcfg, vp, vcfg, m, b, mesh)

    codes, wav = fn(bparams, vparams, mel_mb, bits_mb)
    assert np.isfinite(np.asarray(wav)).all()
    assert set(np.unique(np.asarray(codes))) <= {0.0, 0.5, 1.0}


def test_pp_composes_with_data_parallel(setup):
    """2-D (data x pipe) mesh: each stage replicated over data, every
    microbatch's stream dim sharded — must equal the unpipelined
    composition exactly like the 1-D case."""
    if len(jax.devices()) < 8:
        pytest.skip("needs virtual multi-device harness")
    from bvsc_tpu.parallel.pp import make_dp_pp_mesh

    bparams, bcfg, vparams, vcfg, mel_mb, bits_mb = setup
    z_ref, wav_ref = _reference(bparams, bcfg, vparams, vcfg, mel_mb, bits_mb)
    mesh = make_dp_pp_mesh(2)  # M=2 streams sharded over data=2
    codes, wav = pipeline_resynth(
        bparams, bcfg, vparams, vcfg, mel_mb, bits_mb, mesh,
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_array_equal(np.asarray(codes), z_ref)
    np.testing.assert_allclose(np.asarray(wav), wav_ref, atol=1e-6)


def test_pp_input_validation(setup):
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual multi-device harness")
    bparams, bcfg, vparams, vcfg, mel_mb, bits_mb = setup
    mesh = make_pp_mesh()
    with pytest.raises(ValueError, match="bits_mb required"):
        pipeline_resynth(bparams, bcfg, vparams, vcfg, mel_mb, None, mesh)
    import dataclasses
    bad = jnp.zeros((N_MICRO, M, T, bcfg.x_dim + 1), jnp.float32)
    with pytest.raises(ValueError, match="x_dim"):
        pipeline_resynth(bparams, bcfg, vparams, vcfg, bad, bits_mb, mesh)
