"""1-D convolution ops with torch-compatible semantics, on XLA.

The reference vocoder is built from ``torch.nn.Conv1d`` /
``ConvTranspose1d`` with *explicit* left-only padding for causality
(reference ``third_party/BigVGAN/models.py:19-20,107-117,209-233``).  These
wrappers keep the torch weight layouts — Conv1d (out, in, k) and
ConvTranspose1d (in, out, k) — so converted checkpoints drop straight in.

Weight-normed layers carry ``{'g', 'v'}`` instead of ``'w'`` (torch
``weight_norm`` dim=0 reparameterisation, reference ``models.py:140,164,200``);
:func:`conv_weight` folds on the fly for training, while inference params
are pre-folded by the converter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_PRECISION = jax.lax.Precision.HIGHEST


def fold_weight_norm(g: jax.Array, v: jax.Array) -> jax.Array:
    """w = g * v / ||v||, norm over all dims except dim 0 (torch dim=0)."""
    axes = tuple(range(1, v.ndim))
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
    return g * v / norm


def conv_weight(p: dict) -> jax.Array:
    """Materialise the conv weight from folded, weight-normed, or
    spectral-normed params."""
    if "w" in p:
        return p["w"]
    if "w_orig" in p:
        return spectral_norm_weight(p)
    return fold_weight_norm(p["g"], p["v"])


# ---------------------------------------------------------------------------
# Spectral normalisation (torch.nn.utils.spectral_norm semantics)
# ---------------------------------------------------------------------------
#
# The reference's discriminators offer ``use_spectral_norm`` /
# ``mrd_use_spectral_norm`` (reference ``models.py:256,329-333``).  torch
# keeps the raw weight as ``weight_orig`` plus two power-iteration buffers
# ``weight_u`` / ``weight_v`` and divides by sigma = u . (W_mat v) each
# forward, updating (v, u) once per training forward.  Functionally here:
# params carry {'w_orig', 'b', 'sn_u', 'sn_v'}; :func:`spectral_norm_weight`
# computes W/sigma treating the buffers as constants (stop_gradient), and
# the trainer calls :func:`spectral_norm_power_iteration` once per
# discriminator step (torch: once per train-mode forward).

_SN_EPS = 1e-12  # torch.nn.functional.normalize default eps


def _l2_normalize(x: jax.Array) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x), _SN_EPS)


def spectral_norm_weight(p: dict) -> jax.Array:
    """w_orig / sigma with sigma = u . (W_mat v) from the stored buffers
    (torch eval-mode compute_weight)."""
    w = p["w_orig"]
    w_mat = w.reshape(w.shape[0], -1)
    u = jax.lax.stop_gradient(p["sn_u"])
    v = jax.lax.stop_gradient(p["sn_v"])
    sigma = u @ (w_mat @ v)
    return w / sigma


def _power_iterate_one(p: dict, n_iterations: int = 1) -> dict:
    w_mat = jax.lax.stop_gradient(p["w_orig"]).reshape(p["w_orig"].shape[0], -1)
    u, v = p["sn_u"], p["sn_v"]
    for _ in range(n_iterations):
        v = _l2_normalize(w_mat.T @ u)
        u = _l2_normalize(w_mat @ v)
    return {**p, "sn_u": u, "sn_v": v}


def spectral_norm_power_iteration(tree, n_iterations: int = 1):
    """Return ``tree`` with one torch-style power-iteration update applied to
    every spectral-normed conv param dict (detected by the 'w_orig' key)."""

    def walk(node):
        if isinstance(node, dict):
            if "w_orig" in node:
                return _power_iterate_one(node, n_iterations)
            return {k: walk(x) for k, x in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(x) for x in node)
        return node

    return walk(tree)


def tree_has_spectral_norm(tree) -> bool:
    found = []

    def walk(node):
        if isinstance(node, dict):
            if "w_orig" in node:
                found.append(True)
            for x in node.values():
                walk(x)
        elif isinstance(node, (list, tuple)):
            for x in node:
                walk(x)

    walk(tree)
    return bool(found)


def spectral_norm_trainable_mask(tree):
    """Bool pytree: False on the 'sn_u'/'sn_v' power-iteration buffers (they
    are torch *buffers*, not parameters — the optimizer must not touch
    them), True everywhere else."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not (
            path
            and isinstance(path[-1], jax.tree_util.DictKey)
            and path[-1].key in ("sn_u", "sn_v")
        ),
        tree,
    )


def pad1d(x: jax.Array, left: int, right: int = 0, mode: str = "constant") -> jax.Array:
    """Explicit (left, right) padding on the time axis of (B, C, T)."""
    if left == 0 and right == 0:
        return x
    if mode == "constant":
        return jnp.pad(x, ((0, 0), (0, 0), (left, right)))
    return jnp.pad(x, ((0, 0), (0, 0), (left, right)), mode=mode)


def conv1d(
    x: jax.Array,
    p: dict,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    precision=None,
) -> jax.Array:
    """torch.nn.functional.conv1d(x, w, b, stride, padding=0, dilation, groups).

    x: (B, C_in, T); weight (C_out, C_in/groups, K); returns (B, C_out, T').
    """
    w = conv_weight(p)
    precision = DEFAULT_PRECISION if precision is None else precision
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(0, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        precision=precision,
    )
    if p.get("b") is not None:
        y = y + p["b"][None, :, None]
    return y


def conv_transpose1d(
    x: jax.Array,
    p: dict,
    *,
    stride: int,
    precision=None,
) -> jax.Array:
    """torch.nn.functional.conv_transpose1d with padding=0.

    x: (B, C_in, T); weight (C_in, C_out, K) [torch IOK layout];
    output length (T-1)*stride + K.

    Implemented as an input-dilated correlation with the flipped,
    in/out-transposed kernel — a single XLA conv that maps onto the MXU.
    """
    w = conv_weight(p)  # (C_in, C_out, K)
    precision = DEFAULT_PRECISION if precision is None else precision
    k = w.shape[-1]
    w_flip = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # -> (C_out, C_in, K)
    y = jax.lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=precision,
    )
    if p.get("b") is not None:
        y = y + p["b"][None, :, None]
    return y


def conv2d(
    x: jax.Array,
    p: dict,
    *,
    stride: tuple[int, int] = (1, 1),
    padding: tuple[int, int] = (0, 0),
    precision=DEFAULT_PRECISION,
) -> jax.Array:
    """torch.nn.functional.conv2d with symmetric (ph, pw) zero padding.

    x: (B, C_in, H, W); weight (C_out, C_in, KH, KW).
    """
    w = conv_weight(p)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision,
    )
    if p.get("b") is not None:
        y = y + p["b"][None, :, None, None]
    return y


def init_conv2d_params(
    key: jax.Array,
    out_ch: int,
    in_ch: int,
    kernel: tuple[int, int],
    *,
    weight_norm: bool = False,
    spectral_norm: bool = False,
    dtype=jnp.float32,
) -> dict:
    """torch Conv2d default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    import numpy as np

    kw, kb, ku, kv = jax.random.split(key, 4)
    fan_in = in_ch * kernel[0] * kernel[1]
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(kw, (out_ch, in_ch, *kernel), dtype, -bound, bound)
    b = jax.random.uniform(kb, (out_ch,), dtype, -bound, bound)
    if spectral_norm:
        # torch spectral_norm init: u/v = normalize(randn) buffers
        u = _l2_normalize(jax.random.normal(ku, (out_ch,), dtype))
        v = _l2_normalize(jax.random.normal(kv, (in_ch * kernel[0] * kernel[1],), dtype))
        return {"w_orig": w, "b": b, "sn_u": u, "sn_v": v}
    if not weight_norm:
        return {"w": w, "b": b}
    axes = tuple(range(1, w.ndim))
    g = jnp.sqrt(jnp.sum(w * w, axis=axes, keepdims=True))
    return {"g": g, "v": w, "b": b}


def init_conv_params(
    key: jax.Array,
    out_ch: int,
    in_ch: int,
    kernel: int,
    *,
    transpose: bool = False,
    weight_norm: bool = False,
    init_std: float = 0.01,
    dtype=jnp.float32,
) -> dict:
    """N(0, 0.01) conv init (reference ``utils.py:39-42`` init_weights) with
    torch's U(-1/sqrt(fan_in·k), ·) bias init."""
    import numpy as np

    kw, kb = jax.random.split(key)
    shape = (in_ch, out_ch, kernel) if transpose else (out_ch, in_ch, kernel)
    w = init_std * jax.random.normal(kw, shape, dtype)
    # torch bias init uses weight.size(1)*k: in_ch*k for Conv1d, out_ch*k for
    # ConvTranspose1d (whose weight is (in_ch, out_ch, k)).
    fan_in = (out_ch if transpose else in_ch) * kernel
    bound = 1.0 / np.sqrt(fan_in)
    b = jax.random.uniform(kb, (out_ch,), dtype, -bound, bound)
    if not weight_norm:
        return {"w": w, "b": b}
    axes = tuple(range(1, w.ndim))
    g = jnp.sqrt(jnp.sum(w * w, axis=axes, keepdims=True))
    return {"g": g, "v": w, "b": b}
