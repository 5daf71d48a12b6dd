"""Parity tests: JAX causal BigVGAN-tiny vs the reference torch generator
(``third_party/BigVGAN/models.py``), with random torch weights converted via
``bvsc_tpu.convert.vocoder_params_from_torch``."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from bvsc_tpu.config import CodecConfig, VocoderConfig
from bvsc_tpu.convert import vocoder_params_from_torch
from bvsc_tpu.models import vocoder as jvoc
from bvsc_tpu.ops import conv as jconv
from bvsc_tpu.ops import snake as jsnake
from torch_ref import import_reference_bigvgan


def tiny_cfg(**overrides) -> VocoderConfig:
    base = dict(
        num_mels=8,
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        layers_sym=(False, False),
        layers_antialias=(False, False),
        pre_sym=False,
        post_sym=False,
        antialias_post=False,
        activation="snakebeta",
        snake_logscale=True,
    )
    base.update(overrides)
    return VocoderConfig(**base)


def build_ref_generator(cfg: VocoderConfig, seed=0):
    models, env = import_reference_bigvgan()
    torch.manual_seed(seed)
    h = env.AttrDict(
        dict(
            num_mels=cfg.num_mels,
            resblock=cfg.resblock,
            upsample_rates=list(cfg.upsample_rates),
            upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
            upsample_initial_channel=cfg.upsample_initial_channel,
            resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
            resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
            layers_sym=list(cfg.layers_sym),
            layers_antialias=list(cfg.layers_antialias),
            pre_sym=cfg.pre_sym,
            post_sym=cfg.post_sym,
            antialias_post=cfg.antialias_post,
            activation=cfg.activation,
            snake_logscale=cfg.snake_logscale,
        )
    )
    gen = models.BigVGAN(h)
    gen.eval()
    return gen


@pytest.mark.parametrize(
    "overrides",
    [
        {},  # shipped causal config shape
        {"layers_sym": (True, True), "pre_sym": True, "post_sym": True},  # symmetric
        {"activation": "snake"},
        {"layers_antialias": (True, True), "antialias_post": True},  # alias-free path
    ],
)
@pytest.mark.slow
def test_generator_parity(overrides):
    cfg = tiny_cfg(**overrides)
    ref = build_ref_generator(cfg)
    params = vocoder_params_from_torch(ref.state_dict(), cfg)
    rng = np.random.default_rng(0)
    T = 17
    mel = rng.standard_normal((2, cfg.num_mels, T)).astype(np.float32)
    length = T * cfg.total_upsample
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(mel), length).numpy()
    y = np.asarray(jvoc.generator_apply(params, cfg, jnp.asarray(mel), length))
    assert y.shape == y_ref.shape == (2, 1, length)
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_full_size_param_count():
    """Shipped config must land on the documented ~0.96 M params
    (reference LFS pointer: 3,859,834 B fp32)."""
    cfg = CodecConfig().vocoder_config
    params = jvoc.init_generator_params(jax.random.key(0), cfg, weight_norm=False)
    n = jvoc.generator_param_count(params)
    assert 0.90e6 < n < 1.0e6, n


@pytest.mark.slow
def test_causality_of_generator():
    """Causal config: output[t] must not depend on mel frames > t//256."""
    cfg = tiny_cfg()
    params = jvoc.init_generator_params(jax.random.key(1), cfg, weight_norm=False)
    rng = np.random.default_rng(1)
    T = 20
    up = cfg.total_upsample
    mel = rng.standard_normal((1, cfg.num_mels, T)).astype(np.float32)
    mel2 = mel.copy()
    mel2[:, :, 12:] += 5.0
    y1 = np.asarray(jvoc.generator_apply(params, cfg, jnp.asarray(mel), T * up))
    y2 = np.asarray(jvoc.generator_apply(params, cfg, jnp.asarray(mel2), T * up))
    # frames < 12 -> samples < 12*up unaffected
    np.testing.assert_array_equal(y1[..., : 12 * up], y2[..., : 12 * up])
    assert np.abs(y1[..., 12 * up :] - y2[..., 12 * up :]).max() > 0


@pytest.mark.slow
def test_weight_norm_training_params_match_folded():
    cfg = tiny_cfg()
    params_wn = jvoc.init_generator_params(jax.random.key(2), cfg, weight_norm=True)
    params_folded = jvoc.fold_generator_params(params_wn)
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((1, cfg.num_mels, 9)).astype(np.float32))
    y1 = jvoc.generator_apply(params_wn, cfg, mel, None)
    y2 = jvoc.generator_apply(params_folded, cfg, mel, None)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_unfold_generator_params_roundtrip():
    """unfold re-parametrizes folded weights as weight norm exactly:
    fold(unfold(w)) == w (trainer warm starts from inference artifacts)."""
    cfg = tiny_cfg()
    folded = jvoc.fold_generator_params(
        jvoc.init_generator_params(jax.random.key(3), cfg, weight_norm=True))
    again = jvoc.fold_generator_params(jvoc.unfold_generator_params(folded))
    for a, b in zip(jax.tree.leaves(folded), jax.tree.leaves(again)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# --- op-level parity ---------------------------------------------------------


def test_conv1d_matches_torch(rng):
    x = rng.standard_normal((2, 6, 40)).astype(np.float32)
    w = rng.standard_normal((10, 6, 5)).astype(np.float32)
    b = rng.standard_normal(10).astype(np.float32)
    for dil in (1, 3):
        ref = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), dilation=dil
        ).numpy()
        got = np.asarray(
            jconv.conv1d(jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)},
                         dilation=dil)
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("stride,k", [(8, 16), (2, 4), (3, 7)])
def test_conv_transpose1d_matches_torch(rng, stride, k):
    x = rng.standard_normal((2, 6, 15)).astype(np.float32)
    w = rng.standard_normal((6, 4, k)).astype(np.float32)  # torch IOK
    b = rng.standard_normal(4).astype(np.float32)
    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=stride
    ).numpy()
    got = np.asarray(
        jconv.conv_transpose1d(
            jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)}, stride=stride
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_snake_matches_torch(rng):
    import sys
    sys.path.insert(0, "/root/reference")
    from third_party.BigVGAN import activations as ref_act

    x = rng.standard_normal((2, 6, 30)).astype(np.float32)
    for logscale in (False, True):
        torch.manual_seed(0)
        m = ref_act.SnakeBeta(6, alpha_logscale=logscale)
        with torch.no_grad():
            m.alpha.copy_(torch.from_numpy(rng.standard_normal(6).astype(np.float32)))
            m.beta.copy_(torch.from_numpy(rng.standard_normal(6).astype(np.float32)))
            ref = m(torch.from_numpy(x)).numpy()
        p = {"alpha": jnp.asarray(m.alpha.detach().numpy()),
             "beta": jnp.asarray(m.beta.detach().numpy())}
        got = np.asarray(jsnake.snake_beta(jnp.asarray(x), p, logscale=logscale))
        # XLA and torch sin/exp implementations differ in the last ulps
        np.testing.assert_allclose(got, ref, atol=1e-4)


def test_alias_free_resample_matches_torch(rng):
    import sys
    sys.path.insert(0, "/root/reference")
    from third_party.BigVGAN.alias_free_torch import resample as ref_rs
    from bvsc_tpu.ops.resample import UpSample1d, DownSample1d

    x = rng.standard_normal((2, 3, 50)).astype(np.float32)
    for ratio in (2,):
        up_ref = ref_rs.UpSample1d(ratio)
        dn_ref = ref_rs.DownSample1d(ratio)
        with torch.no_grad():
            yu_ref = up_ref(torch.from_numpy(x)).numpy()
            yd_ref = dn_ref(torch.from_numpy(x)).numpy()
        yu = np.asarray(UpSample1d(ratio)(jnp.asarray(x)))
        yd = np.asarray(DownSample1d(ratio)(jnp.asarray(x)))
        np.testing.assert_allclose(yu, yu_ref, atol=1e-5)
        np.testing.assert_allclose(yd, yd_ref, atol=1e-5)


@pytest.mark.slow
def test_folded_fast_path_equals_direct(rng):
    """Space-to-depth folded generator (ops.fold) is exactly equivalent."""
    cfg = tiny_cfg()
    params = jvoc.init_generator_params(jax.random.key(5), cfg, weight_norm=False)
    folded = jvoc.prepare_folded_params(params, cfg)
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mels, 19)).astype(np.float32))
    y1 = np.asarray(jvoc.generator_apply(params, cfg, mel, 19 * cfg.total_upsample))
    y2 = np.asarray(jvoc.generator_apply_folded(folded, cfg, mel, 19 * cfg.total_upsample))
    np.testing.assert_allclose(y2, y1, atol=1e-6)


def test_fold_ops_roundtrip_and_conv_equivalence(rng):
    from bvsc_tpu.ops.fold import fold_conv_weight, fold_time, unfold_time
    from bvsc_tpu.ops.conv import conv1d, pad1d

    x = jnp.asarray(rng.standard_normal((2, 6, 48)).astype(np.float32))
    for s in (2, 4):
        np.testing.assert_array_equal(np.asarray(unfold_time(fold_time(x, s), s)),
                                      np.asarray(x))
    # folded causal conv == direct causal conv
    w = rng.standard_normal((5, 6, 3)).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    for d, s in [(1, 4), (3, 4), (5, 2), (2, 8)]:
        direct = conv1d(pad1d(x, (3 - 1) * d, 0), {"w": jnp.asarray(w), "b": jnp.asarray(b)},
                        dilation=d)
        wf, D = fold_conv_weight(w, d, s)
        bf = np.tile(b, s)
        xf = fold_time(x, s)
        yf = conv1d(pad1d(xf, D, 0), {"w": jnp.asarray(wf), "b": jnp.asarray(bf)})
        got = unfold_time(yf, s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(direct), atol=1e-5,
                                   err_msg=f"d={d} s={s}")


def test_sin_sq_approx_accuracy(rng):
    """Polynomial sin^2 (the fast-serving snake) vs f64 ground truth."""
    u = np.concatenate([
        rng.standard_normal(100000).astype(np.float32) * 3,
        rng.standard_normal(10000).astype(np.float32) * 30,
        np.linspace(-300, 300, 10000, dtype=np.float32),
    ])
    ref = np.sin(np.float64(u)) ** 2
    got = np.asarray(jsnake.sin_sq_approx(jnp.asarray(u)), np.float64)
    assert np.abs(got - ref).max() < 2e-4


def test_generator_approx_snake_close(rng):
    """approx_snake output stays within the fast-serving error contract,
    and the knob actually reaches the compute graph (no transcendental sin
    left in the approx program)."""
    cfg = tiny_cfg()
    params = jvoc.init_generator_params(jax.random.key(3), cfg, weight_norm=False)
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mels, 17)), jnp.float32)
    exact = np.asarray(jvoc.generator_apply(params, cfg, mel, 17 * 8))
    approx = np.asarray(
        jvoc.generator_apply(params, cfg, mel, 17 * 8, approx_snake=True)
    )
    assert np.abs(exact - approx).max() < 5e-3  # inside the bf16 serving contract

    def primitives(fn):
        """All primitive names in the jaxpr, recursing into sub-jaxprs
        (robust to pretty-printer changes — advisor r3 finding)."""
        names: set = set()

        def walk(jaxpr):
            for eqn in jaxpr.eqns:
                names.add(eqn.primitive.name)
                for v in eqn.params.values():
                    for item in (v if isinstance(v, (list, tuple)) else (v,)):
                        sub = getattr(item, "jaxpr", item)
                        if hasattr(sub, "eqns"):
                            walk(sub)
        walk(jax.make_jaxpr(fn)(params, mel).jaxpr)
        return names

    prims_exact = primitives(lambda p, m: jvoc.generator_apply(p, cfg, m, 17 * 8))
    prims_approx = primitives(
        lambda p, m: jvoc.generator_apply(p, cfg, m, 17 * 8, approx_snake=True)
    )
    assert "sin" in prims_exact
    assert "sin" not in prims_approx
    assert "round" in prims_approx


def test_codec_approx_snake_knob():
    """Fast-path knob defaults tie to precision: 'default' -> approx snake
    + bf16 vocoder, 'highest' -> exact f32; explicit overrides win."""
    import dataclasses

    from bvsc_tpu.codec import BVRNNCodecModel
    from bvsc_tpu.config import CodecConfig

    conf = dataclasses.replace(
        CodecConfig(h_dim=16, z_dim=8, num_mels=8), vocoder_config=tiny_cfg()
    )
    kw = dict(config=conf)
    parity = BVRNNCodecModel(**kw)
    assert not parity.approx_snake and parity.voc_dtype == "f32"
    fast = BVRNNCodecModel(precision="default", **kw)
    assert fast.approx_snake and fast.voc_dtype == "bf16"
    assert BVRNNCodecModel(precision="default", approx_snake=False, **kw).approx_snake is False
    assert BVRNNCodecModel(approx_snake=True, **kw).approx_snake is True
    assert BVRNNCodecModel(precision="default", voc_dtype="f32", **kw).voc_dtype == "f32"
    with pytest.raises(ValueError):
        BVRNNCodecModel(voc_dtype="fp8", **kw)
