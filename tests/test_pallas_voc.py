"""Equivalence tests for the fused, folded Pallas resblock kernel
(``ops/pallas_voc.py``) against the direct XLA generator path (itself
parity-tested vs the reference torch vocoder in ``test_vocoder.py``).

Runs the kernel in interpret mode on CPU; the compiled path is exercised on
the real chip by ``bench.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bvsc_tpu.config import CodecConfig
from bvsc_tpu.models import vocoder as V
from bvsc_tpu.ops import pallas_voc as PV
from bvsc_tpu.ops.conv import conv1d, pad1d
from bvsc_tpu.ops.fold import fold_time, unfold_time

HIGH = jax.lax.Precision.HIGHEST


@pytest.fixture(scope="module")
def vcfg():
    return CodecConfig().vocoder_config


@pytest.fixture(scope="module")
def gen_params(vcfg):
    return V.init_generator_params(jax.random.key(1), vcfg, weight_norm=False)


def test_fold_weight_blocks_matches_conv1d(rng):
    """y_f[:, t] = sum_delta W[delta] @ x_f[:, t-delta] == causal conv."""
    C, T, B = 8, 256, 2
    for k, d, s in [(3, 1, 2), (11, 5, 16), (7, 3, 8), (1, 1, 4)]:
        w = rng.standard_normal((C, C, k)).astype(np.float32) * 0.2
        b = rng.standard_normal(C).astype(np.float32) * 0.1
        x = rng.standard_normal((B, C, T)).astype(np.float32)
        ref = conv1d(
            pad1d(jnp.asarray(x), (k - 1) * d, 0),
            {"w": jnp.asarray(w), "b": jnp.asarray(b)},
            dilation=d, precision=HIGH,
        )
        wb = PV.fold_weight_blocks(w, d, s)
        xf = np.asarray(fold_time(jnp.asarray(x), s))
        n = T // s
        acc = np.zeros((B, C * s, n), np.float32)
        for delta in range(wb.shape[0]):
            xs = np.concatenate(
                [np.zeros((B, C * s, delta), np.float32), xf[:, :, : n - delta]],
                axis=2,
            )
            acc += np.einsum("oi,bin->bon", wb[delta].astype(np.float32), xs)
        acc += np.tile(b, s)[None, :, None]
        got = unfold_time(jnp.asarray(acc), s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("stage", [0, 3])
def test_resblock_stack_matches_direct(vcfg, gen_params, rng, stage):
    """Fused kernel (interpret) == the direct XLA resblock stack, including
    the sequence-start zero-padding semantics and cross-block halo carry."""
    num_k = len(vcfg.resblock_kernel_sizes)
    kb = PV.prepare_resblock_kernel_params(gen_params, vcfg)
    C = vcfg.upsample_initial_channel // (2 ** (stage + 1))
    T = 700 if stage == 0 else 3000  # force multiple grid blocks
    x = jnp.asarray(rng.standard_normal((2, C, T)) * 0.3, jnp.float32)
    xs = None
    for j, (ksz, dils) in enumerate(
        zip(vcfg.resblock_kernel_sizes, vcfg.resblock_dilation_sizes)
    ):
        out = V._amp_block(
            x, gen_params["resblocks"][stage * num_k + j], vcfg, ksz, dils,
            False, False, precision=HIGH,
        )
        xs = out if xs is None else xs + out
    ref = xs / num_k
    got = PV.resblock_stack_folded(
        x, kb, vcfg, stage, block_len=128, compute_dtype=jnp.float32,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_generator_pallas_matches_direct(vcfg, gen_params, rng):
    """Full generator with the Pallas fast path == generator_apply."""
    T = 40
    mel = jnp.asarray(rng.standard_normal((1, vcfg.num_mels, T)) - 5, jnp.float32)
    L = T * 256
    ref = V.generator_apply(gen_params, vcfg, mel, L, precision=HIGH)
    kb = PV.prepare_resblock_kernel_params(gen_params, vcfg)
    got = V.generator_apply_pallas(
        gen_params, kb, vcfg, mel, L, precision=HIGH,
        block_len=128, compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
