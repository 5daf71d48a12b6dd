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
) -> jax.Array:
    """AMP residual block (reference ``models.py:103-121``)."""

    def act(xv, p):
        fn = lambda v: apply_activation(v, p, kind=cfg.activation,
                                        logscale=cfg.snake_logscale)
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
    precision=None,
) -> jax.Array:
    """Mel (B, num_mels, T) -> waveform (B, 1, length)
    (reference ``models.py:207-238``).

    precision: None -> ops.conv.DEFAULT_PRECISION (HIGHEST, reference
    parity); pass jax.lax.Precision.DEFAULT for the fast serving path
    (bf16 MXU passes, ~2.5x faster, output differs at ~1e-3)."""
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
            out = _amp_block(
                x, params["resblocks"][i * num_k + j], cfg, ksz, dil, sym, aa,
                precision=precision,
            )
            xs = out if xs is None else xs + out
        x = xs / num_k

    def post_act(xv):
        fn = lambda v: apply_activation(v, params["act_post"], kind=cfg.activation,
                                        logscale=cfg.snake_logscale)
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
