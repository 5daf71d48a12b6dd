"""Causal BigVGAN-tiny vocoder generator — functional JAX re-creation.

Re-creates the reference's causal-modified BigVGAN generator
(``third_party/BigVGAN/models.py:26-248``): mel (B, 80, T) -> waveform
(B, 1, T*256).  Structure (shipped config, ``configs/config_varBitRate.toml:
39-56``): left-pad [6,0] -> conv_pre k7 -> 4x [ConvTranspose1d upsample
(16,16,4,4 kernels; 8,8,2,2 strides), 3 AMP resblocks (k=3,7,11; dilations
1,3,5) averaged] -> SnakeBeta -> left-pad [6,0] -> conv_post k7 -> tanh ->
trim to ``length``.  Channels 128 -> 64 -> 32 -> 16 -> 8.

All convolutions are weight-normed in training (params carry {'g','v'});
inference uses pre-folded {'w'} (the converter folds, reference
``inference.py:53`` remove_weight_norm).  Symmetric-padding and alias-free
variants are supported for capability parity (disabled in shipped configs).

TPU notes: the whole generator is one feed-forward XLA graph of dense 1-D
convs — MXU-bound; no Python control flow depends on data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bvsc_tpu.config import VocoderConfig
from bvsc_tpu.ops.conv import conv1d, conv_transpose1d, init_conv_params, pad1d
from bvsc_tpu.ops.resample import Activation1d
from bvsc_tpu.ops.snake import apply_activation, init_snake_params

Params = dict


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    """Symmetric 'same' padding (reference ``utils.py:51-52``)."""
    return (kernel_size * dilation - dilation) // 2


def get_padding_causal(kernel_size: int, dilation: int = 1) -> int:
    """Full left-only padding (reference ``models.py:19-20``)."""
    return kernel_size * dilation - dilation


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_generator_params(
    key: jax.Array, cfg: VocoderConfig, *, weight_norm: bool = True, dtype=jnp.float32
) -> Params:
    """Fresh generator params (init per reference ``utils.py:39-42`` +
    torch defaults)."""
    keys = iter(jax.random.split(key, 256))
    C0 = cfg.upsample_initial_channel
    num_k = len(cfg.resblock_kernel_sizes)
    beta = cfg.activation == "snakebeta"

    params: Params = {
        "conv_pre": init_conv_params(
            next(keys), C0, cfg.num_mels, 7, weight_norm=weight_norm, dtype=dtype
        ),
        "ups": [],
        "resblocks": [],
    }
    ch = C0
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        out_ch = C0 // (2 ** (i + 1))
        params["ups"].append(
            init_conv_params(
                next(keys), out_ch, ch, k, transpose=True,
                weight_norm=weight_norm, dtype=dtype,
            )
        )
        for ksz in cfg.resblock_kernel_sizes:
            block = {
                "convs1": [
                    init_conv_params(next(keys), out_ch, out_ch, ksz,
                                     weight_norm=weight_norm, dtype=dtype)
                    for _ in range(3)
                ],
                "convs2": [
                    init_conv_params(next(keys), out_ch, out_ch, ksz,
                                     weight_norm=weight_norm, dtype=dtype)
                    for _ in range(3)
                ],
                "acts": [
                    init_snake_params(out_ch, beta=beta,
                                      logscale=cfg.snake_logscale, dtype=dtype)
                    for _ in range(6)
                ],
            }
            params["resblocks"].append(block)
        ch = out_ch
    params["act_post"] = init_snake_params(
        ch, beta=beta, logscale=cfg.snake_logscale, dtype=dtype
    )
    params["conv_post"] = init_conv_params(
        next(keys), 1, ch, 7, weight_norm=weight_norm, dtype=dtype
    )
    return params


def generator_param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _amp_block(
    x: jax.Array,
    block: Params,
    cfg: VocoderConfig,
    kernel_size: int,
    dilations,
    symmetric: bool,
    antialias: bool,
    precision=None,
    approx_snake: bool = False,
) -> jax.Array:
    """AMP residual block (reference ``models.py:103-121``)."""

    def act(xv, p):
        fn = lambda v: apply_activation(v, p, kind=cfg.activation,
                                        logscale=cfg.snake_logscale,
                                        approx=approx_snake)
        if antialias and cfg.activation in ("snake", "snakebeta"):
            return Activation1d(fn)(xv)
        return fn(xv)

    pad_fn = get_padding if symmetric else get_padding_causal
    p2 = pad_fn(kernel_size, 1)
    for j, d in enumerate(dilations):
        p1 = pad_fn(kernel_size, d)
        xt = act(x, block["acts"][2 * j])
        xt = pad1d(xt, p1, p1 if symmetric else 0)
        xt = conv1d(xt, block["convs1"][j], dilation=d, precision=precision)
        xt = act(xt, block["acts"][2 * j + 1])
        xt = pad1d(xt, p2, p2 if symmetric else 0)
        xt = conv1d(xt, block["convs2"][j], precision=precision)
        x = xt + x
    return x


def generator_apply(
    params: Params, cfg: VocoderConfig, x: jax.Array, length: int | None = None,
    precision=None, *, remat: bool = False, approx_snake: bool = False,
) -> jax.Array:
    """Mel (B, num_mels, T) -> waveform (B, 1, length)
    (reference ``models.py:207-238``).

    precision: None -> ops.conv.DEFAULT_PRECISION (HIGHEST, reference
    parity); pass jax.lax.Precision.DEFAULT for bf16 MXU passes
    (~2.5x faster, output differs at ~1e-3 with f32 activations; the full
    fast serving stack — bf16 MXU + approx_snake + bf16 activations, what
    ``BVRNNCodecModel(precision='default')`` runs — is bounded at ~2e-2,
    tests/test_codec.py::test_fast_serving_mode).

    approx_snake: polynomial sin^2 snake (``ops.snake.sin_sq_approx``) —
    snake is ~80% of generator time on this chip; the poly is ~2x (f32) /
    3.3x (bf16) faster at <2e-4 abs activation error.

    remat: rematerialise each residual block under ``jax.grad`` — forward
    math is identical; the backward pass recomputes resblock intermediates
    instead of keeping them live, shrinking grad-program peak memory ~6x
    (keeps the tunneled AOT compile helper under its memory cap)."""
    num_k = len(cfg.resblock_kernel_sizes)

    if cfg.pre_sym:
        x = pad1d(x, 3, 3)
    else:
        x = pad1d(x, 6, 0)
    x = conv1d(x, params["conv_pre"], precision=precision)

    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        sym = cfg.layers_sym[i]
        aa = cfg.layers_antialias[i]
        if cfg.activation == "lrelu":
            x = jax.nn.leaky_relu(x, 0.1)
        # torch ConvTranspose1d(k, u, padding=p): emulate p by trimming p
        # from both ends of the padding=0 output.
        p = (k - u) // 2 if sym else 0
        x = conv_transpose1d(x, params["ups"][i], stride=u, precision=precision)
        if p:
            x = x[..., p:-p]
        xs = None
        for j, (ksz, dil) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            block_fn = functools.partial(
                _amp_block, cfg=cfg, kernel_size=ksz, dilations=dil,
                symmetric=sym, antialias=aa, precision=precision,
                approx_snake=approx_snake,
            )
            if remat:
                block_fn = jax.checkpoint(block_fn)
            out = block_fn(x, params["resblocks"][i * num_k + j])
            xs = out if xs is None else xs + out
        x = xs / num_k

    def post_act(xv):
        fn = lambda v: apply_activation(v, params["act_post"], kind=cfg.activation,
                                        logscale=cfg.snake_logscale,
                                        approx=approx_snake)
        if cfg.antialias_post and cfg.activation in ("snake", "snakebeta"):
            return Activation1d(fn)(xv)
        return fn(xv)

    x = post_act(x)
    if cfg.post_sym:
        x = pad1d(x, 3, 3)
    else:
        x = pad1d(x, 6, 0)
    x = conv1d(x, params["conv_post"], precision=precision)
    x = jnp.tanh(x)
    if length is not None:
        x = x[..., :length]
    return x


# ---------------------------------------------------------------------------
# Pallas fast path: fused, folded resblock kernels (ops/pallas_voc.py)
# ---------------------------------------------------------------------------


def generator_apply_pallas(
    params: Params,
    kernel_blocks: list,
    cfg: VocoderConfig,
    x: jax.Array,
    length: int | None = None,
    precision=None,
    *,
    block_len: int = 1024,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Generator forward with the residual stacks as fused Pallas kernels
    (``ops.pallas_voc.amp_resblock_folded``); conv_pre / upsamples /
    conv_post stay direct XLA convs.  ``kernel_blocks`` from
    ``ops.pallas_voc.prepare_resblock_kernel_params(params, cfg)``.
    Identical math to :func:`generator_apply` (one bf16 MXU pass per dot in
    serving mode; ``compute_dtype=jnp.float32`` for parity testing)."""
    from bvsc_tpu.ops.pallas_voc import resblock_stack_folded

    x = pad1d(x, 6, 0)
    x = conv1d(x, params["conv_pre"], precision=precision)
    for i, u in enumerate(cfg.upsample_rates):
        x = conv_transpose1d(x, params["ups"][i], stride=u, precision=precision)
        x = resblock_stack_folded(
            x, kernel_blocks, cfg, i,
            block_len=block_len, compute_dtype=compute_dtype, interpret=interpret,
        )
    x = apply_activation(x, params["act_post"], kind=cfg.activation,
                         logscale=cfg.snake_logscale)
    x = pad1d(x, 6, 0)
    x = conv1d(x, params["conv_post"], precision=precision)
    x = jnp.tanh(x)
    if length is not None:
        x = x[..., :length]
    return x


# ---------------------------------------------------------------------------
# Fast folded apply (space-to-depth: tiny-channel convs -> MXU-shaped convs)
# ---------------------------------------------------------------------------


def fold_factor(cfg: VocoderConfig, stage: int) -> int:
    """Per-stage space-to-depth factor: fold until ~128 channels."""
    ch = cfg.upsample_initial_channel // (2 ** (stage + 1))
    return max(1, 128 // ch)


def prepare_folded_params(params: Params, cfg: VocoderConfig, dtype=jnp.float32) -> Params:
    """Pre-fold every resblock conv for the space-to-depth fast path
    (see :mod:`bvsc_tpu.ops.fold`).  Only valid for causal, non-antialiased
    configs; per-stage fold factor s = max(1, 128 // channels).

    Input params must be inference params (weight-norm already folded).
    """
    import numpy as np

    from bvsc_tpu.ops.fold import fold_channel_param, fold_conv_weight

    if any(cfg.layers_sym) or any(cfg.layers_antialias):
        raise ValueError("folded fast path requires the causal config")
    num_k = len(cfg.resblock_kernel_sizes)
    C0 = cfg.upsample_initial_channel
    out: Params = {
        "conv_pre": params["conv_pre"],
        "conv_post": params["conv_post"],
        "act_post": params["act_post"],
        "ups": params["ups"],
        "resblocks": [],
    }
    for i in range(len(cfg.upsample_rates)):
        ch = C0 // (2 ** (i + 1))
        s = fold_factor(cfg, i)
        for j, (ksz, dils) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            block = params["resblocks"][i * num_k + j]
            fb = {"convs1": [], "convs2": [], "acts": []}
            for jj, d in enumerate(dils):
                w1, _ = fold_conv_weight(np.asarray(block["convs1"][jj]["w"]), d, s)
                w2, _ = fold_conv_weight(np.asarray(block["convs2"][jj]["w"]), 1, s)
                fb["convs1"].append({
                    "w": jnp.asarray(w1, dtype),
                    "b": jnp.asarray(fold_channel_param(block["convs1"][jj]["b"], s), dtype),
                })
                fb["convs2"].append({
                    "w": jnp.asarray(w2, dtype),
                    "b": jnp.asarray(fold_channel_param(block["convs2"][jj]["b"], s), dtype),
                })
            for a in block["acts"]:
                fb["acts"].append({
                    k: jnp.asarray(fold_channel_param(np.asarray(v), s), dtype)
                    for k, v in a.items()
                })
            out["resblocks"].append(fb)
    return out


def generator_apply_folded(
    params: Params, cfg: VocoderConfig, x: jax.Array, length: int | None = None,
    precision=None, *, approx_snake: bool = False,
) -> jax.Array:
    """Fast-path generator: identical math to :func:`generator_apply` with
    the residual stacks run space-to-depth folded.  ``params`` from
    :func:`prepare_folded_params`."""
    from bvsc_tpu.ops.fold import fold_time, unfold_time

    num_k = len(cfg.resblock_kernel_sizes)
    x = pad1d(x, 6, 0)
    x = conv1d(x, params["conv_pre"], precision=precision)

    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = conv_transpose1d(x, params["ups"][i], stride=u, precision=precision)
        s = fold_factor(cfg, i)
        T = x.shape[-1]
        pad_t = (-T) % s
        if pad_t:  # causal: right zero-pad never leaks into real outputs
            x = pad1d(x, 0, pad_t)
        xf = fold_time(x, s)
        xs = None
        for j in range(num_k):
            fb = params["resblocks"][i * num_k + j]
            ksz = cfg.resblock_kernel_sizes[j]
            dils = cfg.resblock_dilation_sizes[j]
            xb = xf
            for jj in range(len(fb["convs1"])):
                # folded left-context (ops.fold.fold_conv_weight's D)
                D1 = -((-(ksz - 1) * dils[jj]) // s)
                D2 = -((-(ksz - 1)) // s)
                xt = apply_activation(xb, fb["acts"][2 * jj], kind=cfg.activation,
                                      logscale=cfg.snake_logscale,
                                      approx=approx_snake)
                xt = pad1d(xt, D1, 0)
                xt = conv1d(xt, fb["convs1"][jj], precision=precision)
                xt = apply_activation(xt, fb["acts"][2 * jj + 1], kind=cfg.activation,
                                      logscale=cfg.snake_logscale,
                                      approx=approx_snake)
                xt = pad1d(xt, D2, 0)
                xt = conv1d(xt, fb["convs2"][jj], precision=precision)
                xb = xt + xb
            xs = xb if xs is None else xs + xb
        x = unfold_time(xs / num_k, s)
        if pad_t:
            x = x[..., :T]

    x = apply_activation(x, params["act_post"], kind=cfg.activation,
                         logscale=cfg.snake_logscale, approx=approx_snake)
    x = pad1d(x, 6, 0)
    x = conv1d(x, params["conv_post"], precision=precision)
    x = jnp.tanh(x)
    if length is not None:
        x = x[..., :length]
    return x


def fold_generator_params(params: Params) -> Params:
    """Fold all weight-norm (g, v) pairs into plain 'w' for inference
    (reference ``models.py:240-248`` remove_weight_norm)."""
    from bvsc_tpu.ops.conv import fold_weight_norm

    def fold(p):
        if isinstance(p, dict) and "g" in p and "v" in p:
            out = {"w": fold_weight_norm(p["g"], p["v"])}
            if "b" in p:
                out["b"] = p["b"]
            return out
        if isinstance(p, dict):
            return {k: fold(v) for k, v in p.items()}
        if isinstance(p, list):
            return [fold(v) for v in p]
        return p

    return fold(params)


def unfold_generator_params(params: Params) -> Params:
    """Inverse of :func:`fold_generator_params` for trainer warm starts:
    re-parametrize folded 'w' convs as weight norm with g = ||w|| (per
    output channel), v = w — exactly torch's ``weight_norm`` init from
    existing weights, so fold(unfold(w)) == w."""
    import jax.numpy as jnp

    def unfold(p):
        if isinstance(p, dict) and "w" in p and "g" not in p:
            w = p["w"]
            axes = tuple(range(1, w.ndim))
            out = {"g": jnp.sqrt(jnp.sum(w * w, axis=axes, keepdims=True)),
                   "v": w}
            if "b" in p:
                out["b"] = p["b"]
            return out
        if isinstance(p, dict):
            return {k: unfold(v) for k, v in p.items()}
        if isinstance(p, list):
            return [unfold(v) for v in p]
        return p

    return unfold(params)
