"""Sequence-parallel vocoder: shard the time axis over a ``seq`` mesh axis.

The reference has no sequence scaling story at all (its only parallelism is
DDP, ``third_party/BigVGAN/train.py:82-85``); long-audio synthesis there is a
single-GPU feed-forward pass.  On TPU the causal generator decomposes over
time exactly: it is the streaming runtime's state-carry design
(``bvsc_tpu/streaming.py``) mapped from time onto space —

  * every causal conv's carried left-context buffer becomes a
    ``lax.ppermute`` halo: each device sends the last ``(k-1)*dilation``
    samples of its layer input to its right neighbor.  Devices without a
    source (shard 0) receive ZEROS from the collective — which is precisely
    the one-shot generator's causal zero-padding boundary condition, so
    exactness at the left edge falls out of ``ppermute``'s semantics;
  * every transposed conv's overlap-add carry becomes a halo of the
    ``k - stride`` unfinalized output samples, added into the right
    neighbor's first samples (bias applied once, after the halo add, as in
    ``streaming._stream_conv_transpose``);
  * activations (Snake/SnakeBeta) are pointwise and stay local.

Per-device output is bit-comparable to the one-shot generator because each
local op sees exactly the samples the global op saw (tested on the virtual
mesh, ``tests/test_sp.py``).  All collectives are (B, C, halo)-sized
``ppermute``s over ICI — tiny next to the conv compute they unlock, giving
near-linear scaling for offline synthesis of long audio.

Composability: the ``seq`` axis is orthogonal to ``data`` (stream batching)
and ``model`` (BVRNN tensor parallelism, ``parallel/tp.py``); a 2-D
(data x seq) mesh shards streams x time.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from bvsc_tpu.parallel._compat import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from bvsc_tpu.config import VocoderConfig
from bvsc_tpu.ops.conv import conv1d, conv_transpose1d, conv_weight
from bvsc_tpu.ops.snake import apply_activation

SEQ_AXIS = "seq"


def make_sp_mesh(n_devices: int | None = None, axis_name: str = SEQ_AXIS) -> Mesh:
    from bvsc_tpu.parallel.tp import _take_devices

    devs = _take_devices(n_devices or len(jax.devices()))
    return Mesh(np.asarray(devs), (axis_name,))


def make_dp_sp_mesh(n_data: int, n_seq: int,
                    data_axis: str = "data",
                    seq_axis: str = SEQ_AXIS) -> Mesh:
    """2-D mesh sharding streams x time: batch over ``data``, frames over
    ``seq`` (the composed offline-synthesis layout)."""
    from bvsc_tpu.parallel.tp import _take_devices

    devs = np.asarray(_take_devices(n_data * n_seq)).reshape(n_data, n_seq)
    return Mesh(devs, (data_axis, seq_axis))


def _shift_right(v: jax.Array, axis_name: str, n_shards: int) -> jax.Array:
    """Each shard receives its LEFT neighbor's tensor; shard 0 receives
    zeros (ppermute's no-source semantics == the causal pad boundary)."""
    if n_shards == 1:
        return jnp.zeros_like(v)
    return lax.ppermute(
        v, axis_name, perm=[(i, i + 1) for i in range(n_shards - 1)]
    )


def _sp_conv(x, p, dilation, axis_name, n_shards, precision):
    """Causal conv with a left halo from the neighbor (streaming
    ``_stream_conv`` with the carried state replaced by a ppermute)."""
    k = conv_weight(p).shape[-1]
    klen = (k - 1) * dilation
    if klen:
        if x.shape[-1] < klen:
            raise ValueError(
                f"sequence shard too short for halo: local T={x.shape[-1]} "
                f"< left context {klen} (kernel {k}, dilation {dilation}); "
                "use fewer shards or more frames"
            )
        halo = _shift_right(x[..., -klen:], axis_name, n_shards)
        x = jnp.concatenate([halo, x], axis=-1)
    return conv1d(x, p, dilation=dilation, precision=precision)


def _sp_conv_transpose(x, p, stride, axis_name, n_shards, precision):
    """Causal transposed conv with the overlap-add carry exchanged between
    neighbors (streaming ``_stream_conv_transpose`` in space: the
    ``k - stride`` unfinalized tail samples are sent right and added into
    the neighbor's head; bias is added once, after the halo add)."""
    bias = p.get("b")
    p_nobias = {kk: v for kk, v in p.items() if kk != "b"}
    y = conv_transpose1d(x, p_nobias, stride=stride, precision=precision)
    k = conv_weight(p).shape[-1]
    overlap = k - stride
    emit_len = stride * x.shape[-1]
    if overlap:
        # (T-1)*stride + k == emit_len + overlap: the send slice is y's tail
        send = y[..., emit_len : emit_len + overlap]
        recv = _shift_right(send, axis_name, n_shards)
        y = y.at[..., :overlap].add(recv)
    y = y[..., :emit_len]
    if bias is not None:
        y = y + bias[None, :, None]
    return y


def _generator_sp_local(params, cfg: VocoderConfig, mel, axis_name, n_shards,
                        precision, approx_snake=False):
    """Per-shard generator body (runs inside shard_map).  Mirrors
    ``streaming.generator_stream_step`` with every state carry replaced by a
    neighbor halo exchange."""
    num_k = len(cfg.resblock_kernel_sizes)
    x = _sp_conv(mel, params["conv_pre"], 1, axis_name, n_shards, precision)
    for i, (u, _k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = _sp_conv_transpose(
            x, params["ups"][i], u, axis_name, n_shards, precision
        )
        xs = None
        for j, (ksz, dils) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            rparams = params["resblocks"][i * num_k + j]
            xb = x
            for jj, d in enumerate(dils):
                xt = apply_activation(
                    xb, rparams["acts"][2 * jj], kind=cfg.activation,
                    logscale=cfg.snake_logscale, approx=approx_snake,
                )
                xt = _sp_conv(
                    xt, rparams["convs1"][jj], d, axis_name, n_shards, precision
                )
                xt = apply_activation(
                    xt, rparams["acts"][2 * jj + 1], kind=cfg.activation,
                    logscale=cfg.snake_logscale, approx=approx_snake,
                )
                xt = _sp_conv(
                    xt, rparams["convs2"][jj], 1, axis_name, n_shards, precision
                )
                xb = xt + xb
            xs = xb if xs is None else xs + xb
        x = xs / num_k
    x = apply_activation(
        x, params["act_post"], kind=cfg.activation, logscale=cfg.snake_logscale,
        approx=approx_snake,
    )
    x = _sp_conv(x, params["conv_post"], 1, axis_name, n_shards, precision)
    return jnp.tanh(x)


def generator_apply_sp(
    params,
    cfg: VocoderConfig,
    mel: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = SEQ_AXIS,
    precision=None,
    approx_snake: bool = False,
) -> jax.Array:
    """Sequence-parallel causal generator: mel (B, num_mels, T) with T
    divisible by the ``seq`` axis size -> waveform (B, 1, T * prod(rates)).

    Requires a fully causal, non-antialiased config (same condition as
    streaming) and enough frames per shard for every conv's left context —
    config-dependent: conv_pre needs 6 at frame rate, and a stage-0
    resblock conv with kernel k, dilation d needs (k-1)*d samples at that
    stage's rate (the default config's k=11, d=5 stage-0 conv ⇒
    T/shards >= 7).  A too-short shard raises the 'sequence shard too
    short for halo' ValueError.  Weight-norm-folded inference params
    (``fold_generator_params``).  ``precision`` / ``approx_snake`` mirror
    ``models.vocoder.generator_apply`` so a fast codec's serving numerics
    carry over when its generator is sequence-sharded.
    """
    if any(cfg.layers_sym) or cfg.pre_sym or cfg.post_sym:
        raise ValueError("sequence parallelism requires a fully causal config")
    if any(cfg.layers_antialias) or cfg.antialias_post:
        raise ValueError(
            "sequence parallelism is incompatible with anti-aliased activations"
        )
    n_shards = mesh.shape[axis_name]
    if mel.shape[-1] % n_shards:
        raise ValueError(
            f"frames {mel.shape[-1]} not divisible by seq shards {n_shards}"
        )

    def local(p, m):
        return _generator_sp_local(p, cfg, m, axis_name, n_shards, precision,
                                   approx_snake)

    # compose with stream batching on a 2-D (data x seq) mesh: shard the
    # batch dim over "data" when the mesh has that axis (cf. tp._batch_spec)
    bdim = "data" if "data" in mesh.axis_names else None
    io_spec = P(bdim, None, axis_name)
    fn = shard_map(local, mesh=mesh, in_specs=(P(), io_spec), out_specs=io_spec)
    return fn(params, mel)
