"""Checkpoint converters: torch ``state_dict`` -> bvsc_tpu parameter pytrees.

The reference ships torch checkpoints with key schemas
``{'vrnn': state_dict}`` for the BVRNN and ``{'generator': state_dict}`` for
the vocoder (reference ``bvrnn_codec_model.py:38-42``,
``third_party/BigVGAN/train.py:326-337``).  These converters accept plain
dicts of numpy arrays (or anything with ``.numpy()`` / ``__array__``), so
torch is not a hard dependency of the framework — only of whoever produces
the state_dict.

Conversions performed:
  * Linear weights (out, in) -> (in, out) transposition,
  * GRU ``weight_ih_l0``/``weight_hh_l0`` (3h, in) -> (in, 3h); torch's
    [r|z|n] gate packing is preserved (bvsc_tpu.models.bvrnn.gru_step
    expects the same packing),
  * weight-norm (g, v) folding ``w = g * v / ||v||`` (torch
    ``weight_norm`` dim=0 semantics) for the vocoder's convolutions,
  * conv layout: torch Conv1d (out, in, k) kept as-is (our conv op uses
    OIH numbers); ConvTranspose1d (in, out, k) kept as-is (IOH).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach()
    if hasattr(x, "cpu"):
        x = x.cpu()
    if hasattr(x, "numpy"):
        x = x.numpy()
    return np.asarray(x)


def _dense(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "w": _np(sd[f"{prefix}.weight"]).T.copy(),
        "b": _np(sd[f"{prefix}.bias"]).copy(),
    }


def _mlp(sd: Mapping[str, Any], prefix: str, torch_indices) -> list:
    """nn.Sequential(Linear, ELU, Linear, ...) -> list of dense params."""
    return [_dense(sd, f"{prefix}.{i}") for i in torch_indices]


def bvrnn_params_from_torch(sd: Mapping[str, Any], dtype=np.float32) -> dict:
    """Convert a reference BVRNN ``state_dict`` (``bvrnn.py:30-83`` layout)
    into the :mod:`bvsc_tpu.models.bvrnn` parameter pytree."""
    import jax.numpy as jnp

    def arr(x):
        return jnp.asarray(_np(x), dtype)

    def tree(x):
        import jax

        return jax.tree.map(lambda a: jnp.asarray(a, dtype), x)

    params = {
        "mean_mel": arr(sd["mean_mel"]),
        "std_mel": arr(sd["std_mel"]),
        "log_sigma": arr(sd["log_sigma"]),
        "phi_x": tree(_mlp(sd, "phi_x", [0, 2, 4])),
        "phi_z": tree(_mlp(sd, "phi_z", [0, 2, 4])),
        "enc": tree(_mlp(sd, "enc", [0, 2, 4])),
        "prior": tree(_mlp(sd, "prior", [0, 2, 4])),
        "dec": tree(_mlp(sd, "dec", [0, 2, 4, 6])),
        "gru": {
            "w_ih": jnp.asarray(_np(sd["rnn.weight_ih_l0"]).T.copy(), dtype),
            "w_hh": jnp.asarray(_np(sd["rnn.weight_hh_l0"]).T.copy(), dtype),
            "b_ih": jnp.asarray(_np(sd["rnn.bias_ih_l0"]), dtype),
            "b_hh": jnp.asarray(_np(sd["rnn.bias_hh_l0"]), dtype),
        },
    }
    return params


def bvrnn_params_to_torch_sd(params) -> dict:
    """Inverse of :func:`bvrnn_params_from_torch` (numpy-valued state_dict)."""
    sd: dict[str, np.ndarray] = {
        "mean_mel": _np(params["mean_mel"]),
        "std_mel": _np(params["std_mel"]),
        "log_sigma": _np(params["log_sigma"]),
        "rnn.weight_ih_l0": _np(params["gru"]["w_ih"]).T.copy(),
        "rnn.weight_hh_l0": _np(params["gru"]["w_hh"]).T.copy(),
        "rnn.bias_ih_l0": _np(params["gru"]["b_ih"]),
        "rnn.bias_hh_l0": _np(params["gru"]["b_hh"]),
    }
    for name in ["phi_x", "phi_z", "enc", "prior", "dec"]:
        for j, layer in enumerate(params[name]):
            sd[f"{name}.{2 * j}.weight"] = _np(layer["w"]).T.copy()
            sd[f"{name}.{2 * j}.bias"] = _np(layer["b"])
    return sd


# ---------------------------------------------------------------------------
# Vocoder (causal BigVGAN-tiny)
# ---------------------------------------------------------------------------


def fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """``w = g * v / ||v||`` with the norm over all dims except dim 0
    (torch ``weight_norm`` default)."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=axes, keepdims=True))
    return (g.astype(np.float64) * v.astype(np.float64) / norm).astype(v.dtype)


def _wn_conv(sd: Mapping[str, Any], prefix: str) -> dict:
    """Weight-normed conv -> folded {'w': (as stored by torch), 'b'}."""
    if f"{prefix}.weight_g" in sd:
        w = fold_weight_norm(_np(sd[f"{prefix}.weight_g"]), _np(sd[f"{prefix}.weight_v"]))
    elif f"{prefix}.parametrizations.weight.original0" in sd:  # torch >= 2.1 layout
        w = fold_weight_norm(
            _np(sd[f"{prefix}.parametrizations.weight.original0"]),
            _np(sd[f"{prefix}.parametrizations.weight.original1"]),
        )
    else:
        w = _np(sd[f"{prefix}.weight"])
    return {"w": w.copy(), "b": _np(sd[f"{prefix}.bias"]).copy()}


def vocoder_params_from_torch(sd: Mapping[str, Any], cfg, dtype=np.float32) -> dict:
    """Convert a reference BigVGAN generator ``state_dict``
    (``third_party/BigVGAN/models.py:130-248`` layout) into the
    :mod:`bvsc_tpu.models.vocoder` parameter pytree (weight norm folded).

    cfg: :class:`bvsc_tpu.config.VocoderConfig`.
    """
    import jax
    import jax.numpy as jnp

    num_ups = len(cfg.upsample_rates)
    num_kernels = len(cfg.resblock_kernel_sizes)

    def snake(prefix):
        p = {"alpha": _np(sd[f"{prefix}.alpha"]).copy()}
        if f"{prefix}.beta" in sd:
            p["beta"] = _np(sd[f"{prefix}.beta"]).copy()
        return p

    params: dict = {
        "conv_pre": _wn_conv(sd, "conv_pre"),
        "conv_post": _wn_conv(sd, "conv_post"),
        "ups": [_wn_conv(sd, f"ups.{i}.1") for i in range(num_ups)],
        "resblocks": [],
    }
    n_res_convs = 3  # 3 (conv1, conv2) pairs per AMP block
    for r in range(num_ups * num_kernels):
        pre = f"resblocks.{r}"
        # activations alternate a1, a2 per conv pair; stored flat 0..5;
        # alias-free wrapping adds an `.act` level (Activation1d.act)
        act_prefix = (
            f"{pre}.activations.%d.act"
            if f"{pre}.activations.0.act.alpha" in sd
            else f"{pre}.activations.%d"
        )
        block = {
            "convs1": [_wn_conv(sd, f"{pre}.convs1.{j}") for j in range(n_res_convs)],
            "convs2": [_wn_conv(sd, f"{pre}.convs2.{j}") for j in range(n_res_convs)],
            "acts": [snake(act_prefix % j) for j in range(2 * n_res_convs)],
        }
        params["resblocks"].append(block)
    if "activation_post.alpha" in sd:
        params["act_post"] = snake("activation_post")
    else:
        params["act_post"] = snake("activation_post.act")
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def _wn_conv_unfolded(sd: Mapping[str, Any], prefix: str) -> dict:
    """Weight-normed conv kept as {'g','v','b'} (training parameterisation),
    or a spectral-normed conv as {'w_orig','b','sn_u','sn_v'} (torch
    ``spectral_norm`` buffers, reference models.py:256) — auto-detected."""
    if f"{prefix}.weight_g" in sd:
        g, v = _np(sd[f"{prefix}.weight_g"]), _np(sd[f"{prefix}.weight_v"])
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    elif f"{prefix}.weight_orig" in sd:
        return {
            "w_orig": _np(sd[f"{prefix}.weight_orig"]).copy(),
            "b": _np(sd[f"{prefix}.bias"]).copy(),
            "sn_u": _np(sd[f"{prefix}.weight_u"]).copy(),
            "sn_v": _np(sd[f"{prefix}.weight_v"]).copy(),
        }
    else:
        raise KeyError(f"no weight-norm/spectral-norm params under {prefix}")
    return {"g": g.copy(), "v": v.copy(), "b": _np(sd[f"{prefix}.bias"]).copy()}


def mpd_params_from_torch(sd: Mapping[str, Any], cfg, dtype=np.float32) -> list:
    """Reference MultiPeriodDiscriminator state_dict (models.py:294-316) ->
    bvsc_tpu.models.discriminators MPD param list (weight norm kept)."""
    import jax
    import jax.numpy as jnp

    out = []
    for i in range(len(cfg.mpd_reshapes)):
        pre = f"discriminators.{i}"
        out.append(
            {
                "convs": [_wn_conv_unfolded(sd, f"{pre}.convs.{j}") for j in range(5)],
                "conv_post": _wn_conv_unfolded(sd, f"{pre}.conv_post"),
            }
        )
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), out)


def mrd_params_from_torch(sd: Mapping[str, Any], cfg, dtype=np.float32) -> list:
    """Reference MultiResolutionDiscriminator state_dict (models.py:382-408)
    -> MRD param list."""
    import jax
    import jax.numpy as jnp

    out = []
    for i in range(len(cfg.resolutions)):
        pre = f"discriminators.{i}"
        out.append(
            {
                "convs": [_wn_conv_unfolded(sd, f"{pre}.convs.{j}") for j in range(5)],
                "conv_post": _wn_conv_unfolded(sd, f"{pre}.conv_post"),
            }
        )
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), out)


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch checkpoint file into numpy-valued nested dicts
    (requires torch; reference uses ``torch.load(..., weights_only=True)``,
    ``bvrnn_codec_model.py:38-39``)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    return ckpt
