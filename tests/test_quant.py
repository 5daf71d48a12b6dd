"""Weight-only int8 quantization tests (ops.quant)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bvsc_tpu.models import bvrnn as M
from bvsc_tpu.ops.quant import dequant_matmul, quantize_bvrnn_params, quantize_dense


def test_quantize_dense_error_bound(rng):
    w = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32))
    q = quantize_dense(w)
    assert q["q"].dtype == jnp.int8 and q["scale"].shape == (48,)
    w_hat = np.asarray(q["q"], np.float32) * np.asarray(q["scale"])
    err = np.abs(w_hat - np.asarray(w))
    # per-channel symmetric int8: max error <= scale/2 per element
    assert (err <= np.asarray(q["scale"]) / 2 + 1e-7).all()


def test_dequant_matmul_close(rng):
    w = jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    y_ref = np.asarray(x @ w)
    y_q = np.asarray(dequant_matmul(x, quantize_dense(w)))
    rel = np.abs(y_q - y_ref).max() / np.abs(y_ref).max()
    assert rel < 0.05, rel


@pytest.mark.slow
def test_quantized_bvrnn_codes_mostly_agree(rng):
    cfg = M.BVRNNConfig(x_dim=16, h_dim=48, z_dim=12)
    params = M.init_bvrnn_params(jax.random.key(0), cfg)
    qparams = quantize_bvrnn_params(params)
    y = jnp.asarray(rng.standard_normal((2, 40, 16)).astype(np.float32))
    bits = jnp.full((2, 40), 8.0)
    h0 = jnp.zeros((2, 48))
    c_f, _ = M.encode(params, cfg, y, bits, h0)
    c_q, _ = M.encode(qparams, cfg, y, bits, h0)
    agree = (np.asarray(c_f) == np.asarray(c_q)).mean()
    assert agree > 0.97, agree
    # decode output close
    m_f, _ = M.decode(params, cfg, c_f, h0)
    m_q, _ = M.decode(qparams, cfg, c_f, h0)
    rel = np.abs(np.asarray(m_q) - np.asarray(m_f)).max() / (
        np.abs(np.asarray(m_f)).max() + 1e-9
    )
    assert rel < 0.2, rel


@pytest.mark.slow
def test_codec_int8_option(rng):
    from bvsc_tpu.codec import BVRNNCodecModel
    from test_codec import small_conf

    codec = BVRNNCodecModel(config=small_conf(), seed=3, length_bucket=16,
                            quantize="int8")
    x = (rng.standard_normal((1, 5000)) * 0.3).astype(np.float32)
    out = np.asarray(codec(x, 3000))
    assert out.shape == (1, 5000) and np.isfinite(out).all()
    # int8 weights actually stored as int8
    assert codec.bvrnn_params["gru"]["w_ih"]["q"].dtype == jnp.int8


@pytest.mark.slow
def test_mixed_quantization_agreement_ordering(rng):
    """int8_mixed (enc+phi_x bf16, rest int8) must track f32 codes at least
    as well as all-int8 — the measured closed-loop flip sources are the
    pre-round enc probabilities and the phi_x re-embedding of dec_t
    (reference bvrnn.py:191,204-206)."""
    from bvsc_tpu.ops.quant import quantize_bvrnn_params_mixed

    cfg = M.BVRNNConfig(x_dim=16, h_dim=48, z_dim=12)
    params = M.init_bvrnn_params(jax.random.key(0), cfg)
    y = jnp.asarray(rng.standard_normal((4, 80, 16)).astype(np.float32))
    bits = jnp.full((4, 80), 8.0)
    h0 = jnp.zeros((4, 48))
    c_f, _ = M.encode(params, cfg, y, bits, h0)
    c_q, _ = M.encode(quantize_bvrnn_params(params), cfg, y, bits, h0)
    c_m, _ = M.encode(quantize_bvrnn_params_mixed(params), cfg, y, bits, h0)
    a_q = (np.asarray(c_q) == np.asarray(c_f)).mean()
    a_m = (np.asarray(c_m) == np.asarray(c_f)).mean()
    assert a_m >= a_q - 0.005, (a_m, a_q)
    assert a_m > 0.97, a_m
    # bf16 stacks actually stored as bf16, the rest as int8
    qp = quantize_bvrnn_params_mixed(params)
    assert qp["enc"][0]["w"].dtype == jnp.bfloat16
    assert qp["phi_x"][0]["w"].dtype == jnp.bfloat16
    assert qp["dec"][0]["w"]["q"].dtype == jnp.int8


@pytest.mark.slow
def test_codec_int8_mixed_option(rng):
    from bvsc_tpu.codec import BVRNNCodecModel
    from test_codec import small_conf

    codec = BVRNNCodecModel(config=small_conf(), seed=3, length_bucket=16,
                            quantize="int8_mixed")
    x = (rng.standard_normal((1, 5000)) * 0.3).astype(np.float32)
    out = np.asarray(codec(x, 3000))
    assert out.shape == (1, 5000) and np.isfinite(out).all()
