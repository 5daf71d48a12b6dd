"""Tensor-parallel BVRNN decode: Megatron-style sharding over a "model" axis.

The reference's only parallelism is data-parallel DDP
(``third_party/BigVGAN/train.py:82-85``); batch sharding covers throughput
but does nothing for the latency-critical single-stream scan, whose per-step
cost is reading ~23 M weights (SURVEY §7 hard parts).  Sharding those
weights over a ``Mesh`` "model" axis divides the per-chip weight traffic by
the axis size — the TPU-native answer (shard_map + psum/all_gather over
ICI) to a problem DDP cannot touch.

Layout (H = h_dim, D = model-axis size, each device owns H/D hidden units):

  dec MLP   col → row(psum) → col → row(psum)
  phi_x MLP col → row(psum) → col → all_gather   (GRU input must be full)
  GRU       column-parallel per gate: full (x, h) in, local h-slice out;
            h is all_gathered once at step start

Per scan step: 3 psums + 2 all_gathers on (B, H)-sized tensors.  Math is
identical to :func:`bvsc_tpu.models.bvrnn.decode` up to f32 summation
order (row-parallel psum splits the contraction).

Single-chip (D=1) degenerates to the plain decode; the virtual-mesh test
(``tests/test_tp.py``) pins TP == single-device output.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from bvsc_tpu.parallel._compat import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bvsc_tpu.models import bvrnn as bvrnn_mod

MODEL_AXIS = "model"


def _take_devices(n: int):
    """First n devices, validated — jax.devices()[:n] would silently
    truncate to a smaller mesh than requested."""
    devs = jax.devices()
    if n > len(devs):
        raise ValueError(f"requested {n} devices, only {len(devs)} available")
    return devs[:n]


def make_tp_mesh(n_devices: int | None = None, axis_name: str = MODEL_AXIS) -> Mesh:
    devs = _take_devices(n_devices or len(jax.devices()))
    return Mesh(devs, (axis_name,))


def make_dp_tp_mesh(n_data: int, n_model: int,
                    data_axis: str = "data",
                    model_axis: str = MODEL_AXIS) -> Mesh:
    """2-D mesh: streams sharded over ``data`` x weights over ``model`` —
    the composed serving layout (batch throughput x per-stream latency)."""
    devs = np.asarray(_take_devices(n_data * n_model)).reshape(n_data, n_model)
    return Mesh(devs, (data_axis, model_axis))


# ---------------------------------------------------------------------------
# Parameter layout
# ---------------------------------------------------------------------------


def prepare_tp_params(params) -> dict:
    """Rearrange a BVRNN param pytree for :func:`decode_tp`.

    Splits the packed GRU gate matrices ([r|z|n], reference torch layout)
    into per-gate arrays so each can be column-sharded, and passes the MLP
    stacks through unchanged (their sharding is declared by in_specs).
    """
    gru = params["gru"]
    H = gru["w_hh"].shape[0]

    def gates(w):
        return {"r": w[..., :H], "z": w[..., H : 2 * H], "n": w[..., 2 * H :]}

    return {
        "dec": params["dec"],
        "phi_x": params["phi_x"],
        "phi_z": params["phi_z"],
        "enc": params["enc"],
        "gru_ih": gates(gru["w_ih"]),
        "gru_hh": gates(gru["w_hh"]),
        "gru_bih": gates(gru["b_ih"]),
        "gru_bhh": gates(gru["b_hh"]),
        "mean_mel": params["mean_mel"],
        "std_mel": params["std_mel"],
    }


def tp_param_specs() -> dict:
    """PartitionSpecs matching :func:`prepare_tp_params` output.

    col-parallel weights shard the output dim, row-parallel the input dim;
    row-parallel biases stay replicated (added once after the psum).
    """
    col_w, row_w = P(None, MODEL_AXIS), P(MODEL_AXIS, None)
    col_b, repl = P(MODEL_AXIS), P()
    return {
        # dec: [2H->H col] [H->H row] [H->H col] [H->x row]
        "dec": [
            {"w": col_w, "b": col_b},
            {"w": row_w, "b": repl},
            {"w": col_w, "b": col_b},
            {"w": row_w, "b": repl},
        ],
        # phi_x: [x->H col] [H->H row] [H->H col (+gather)]
        "phi_x": [
            {"w": col_w, "b": col_b},
            {"w": row_w, "b": repl},
            {"w": col_w, "b": col_b},
        ],
        # phi_z is computed replicated (hoisted once per sequence)
        "phi_z": [{"w": repl, "b": repl} for _ in range(3)],
        # enc: [2H->H col] [H->H row] [H->z col (+gather over z)]
        "enc": [
            {"w": col_w, "b": col_b},
            {"w": row_w, "b": repl},
            {"w": col_w, "b": col_b},
        ],
        "gru_ih": {k: col_w for k in ("r", "z", "n")},
        "gru_hh": {k: col_w for k in ("r", "z", "n")},
        "gru_bih": {k: col_b for k in ("r", "z", "n")},
        "gru_bhh": {k: col_b for k in ("r", "z", "n")},
        "mean_mel": repl,
        "std_mel": repl,
    }


def shard_tp_params(mesh: Mesh, tp_params) -> dict:
    """Place prepared params on the mesh with the TP shardings."""
    specs = tp_param_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tp_params, specs,
        is_leaf=lambda x: isinstance(x, jax.Array) or hasattr(x, "shape"),
    )


# ---------------------------------------------------------------------------
# Sharded decode
# ---------------------------------------------------------------------------


def _batch_spec(mesh: Mesh) -> P:
    """Batch-dim PartitionSpec: shard over a "data" axis when the mesh has
    one (2-D DP x TP serving layout), replicate on a pure-model mesh.  The
    scan body is unchanged either way — its collectives name only the
    model axis."""
    return P("data") if "data" in mesh.axis_names else P()


def _col(x, p, precision):
    """Column-parallel Linear: full input, LOCAL output slice."""
    return jnp.matmul(x, p["w"], precision=precision) + p["b"]


def _row(x_loc, p, precision):
    """Row-parallel Linear: LOCAL input slice, psum to the full output."""
    part = jnp.matmul(x_loc, p["w"], precision=precision)
    return jax.lax.psum(part, MODEL_AXIS) + p["b"]


def _dec_and_gru(p, cfg, phi_z_t, h_full_t, h_loc):
    """Shared closed-loop tail: dec MLP -> phi_x(gen) -> GRU.

    Returns (dec_t full, h_next local slice)."""
    prec = cfg.precision
    elu = jax.nn.elu
    # dec: col -> row -> col -> row
    a = elu(_col(jnp.concatenate([phi_z_t, h_full_t], -1), p["dec"][0], prec))
    a = elu(_row(a, p["dec"][1], prec))
    a = elu(_col(a, p["dec"][2], prec))
    dec_t = _row(a, p["dec"][3], prec)
    # phi_x of the re-normalized generation: col -> row -> col+gather
    xn = (dec_t - p["mean_mel"]) / p["std_mel"]
    b_ = elu(_col(xn, p["phi_x"][0], prec))
    b_ = elu(_row(b_, p["phi_x"][1], prec))
    b_ = elu(_col(b_, p["phi_x"][2], prec))
    phi_x_gen = jax.lax.all_gather(b_, MODEL_AXIS, axis=-1, tiled=True)
    # GRU, column-parallel per gate (local hidden slice out)
    x_in = jnp.concatenate([phi_x_gen, phi_z_t], -1)
    gates = {}
    for g in ("r", "z", "n"):
        gi = jnp.matmul(x_in, p["gru_ih"][g], precision=prec) + p["gru_bih"][g]
        gh = jnp.matmul(h_full_t, p["gru_hh"][g], precision=prec) + p["gru_bhh"][g]
        gates[g] = (gi, gh)
    r = jax.nn.sigmoid(gates["r"][0] + gates["r"][1])
    zg = jax.nn.sigmoid(gates["z"][0] + gates["z"][1])
    n = jnp.tanh(gates["n"][0] + r * gates["n"][1])
    return dec_t, (1.0 - zg) * n + zg * h_loc


def _local_h_slice(h_full):
    D = jax.lax.axis_size(MODEL_AXIS)
    idx = jax.lax.axis_index(MODEL_AXIS)
    Hd = h_full.shape[-1] // D
    return jax.lax.dynamic_slice_in_dim(h_full, idx * Hd, Hd, axis=-1)


def decode_tp(
    tp_params, cfg, z: jax.Array, h0: jax.Array, mesh: Mesh
) -> tuple[jax.Array, jax.Array]:
    """Tensor-parallel closed-loop decode (semantics of ``bvrnn.decode``).

    z: (B, T, z_dim) codes, h0: (B, h_dim); returns (mel (B, T, x_dim),
    final h (B, h_dim)), both replicated.
    """
    prec = cfg.precision
    specs = tp_param_specs()
    batch = _batch_spec(mesh)

    def body(p, z_full, h_full):
        # hoisted phi_z, replicated (small: z_dim -> H once per sequence)
        phi_z = bvrnn_mod._mlp_elu(
            p["phi_z"], z_full.astype(cfg.dtype), prec, jax.nn.elu
        )

        def step(h_loc, phi_z_t):
            h_full_t = jax.lax.all_gather(h_loc, MODEL_AXIS, axis=-1, tiled=True)
            dec_t, h_next_loc = _dec_and_gru(p, cfg, phi_z_t, h_full_t, h_loc)
            return h_next_loc, dec_t

        h_loc, dec_seq = jax.lax.scan(
            step, _local_h_slice(h_full).astype(cfg.dtype),
            jnp.swapaxes(phi_z, 0, 1),
        )
        h_final = jax.lax.all_gather(h_loc, MODEL_AXIS, axis=-1, tiled=True)
        return jnp.swapaxes(dec_seq, 0, 1), h_final

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(specs, batch, batch),
        out_specs=(batch, batch),
        check_rep=False,
    )
    return fn(tp_params, z, h0)


def encode_tp(
    tp_params, cfg, y: jax.Array, var_bitrate: jax.Array, h0: jax.Array,
    mesh: Mesh,
) -> tuple[jax.Array, jax.Array]:
    """Tensor-parallel greedy encode (semantics of
    ``bvrnn.encode_with_state``): enc MLP col -> row -> col(+gather over
    the z axis), then the shared closed-loop tail.

    y: (B, T, x_dim) mels; var_bitrate: (B, T) bits/frame; h0: (B, h_dim).
    Returns (codes (B, T, z_dim), final h), both replicated.  Requires
    z_dim and h_dim divisible by the model-axis size.
    """
    prec = cfg.precision
    specs = tp_param_specs()
    batch = _batch_spec(mesh)

    def body(p, y_full, bits_full, h_full):
        elu = jax.nn.elu
        ynorm = (y_full.astype(cfg.dtype) - p["mean_mel"]) / p["std_mel"]
        # hoisted phi_x of the input, TP-sharded: col -> row -> col+gather
        a = elu(_col(ynorm, p["phi_x"][0], prec))
        a = elu(_row(a, p["phi_x"][1], prec))
        a = elu(_col(a, p["phi_x"][2], prec))
        phi_x = jax.lax.all_gather(a, MODEL_AXIS, axis=-1, tiled=True)
        # match bvrnn.encode_with_state: a fixed-rate model (var_bit=False)
        # ignores the bitrate argument and transmits all z_dim bits — a
        # placeholder bits array must not 0.5-mask the codes
        if cfg.var_bit:
            mask = bvrnn_mod.bit_mask_from_bitrate(
                bits_full, cfg.z_dim
            ).astype(cfg.dtype)
        else:
            mask = jnp.ones(bits_full.shape + (cfg.z_dim,), cfg.dtype)

        def step(h_loc, xs):
            phi_x_t, mask_t = xs
            h_full_t = jax.lax.all_gather(h_loc, MODEL_AXIS, axis=-1, tiled=True)
            e = elu(_col(jnp.concatenate([phi_x_t, h_full_t], -1), p["enc"][0], prec))
            e = elu(_row(e, p["enc"][1], prec))
            e = _col(e, p["enc"][2], prec)  # local z slice, pre-sigmoid
            enc_t = jax.nn.sigmoid(
                jax.lax.all_gather(e, MODEL_AXIS, axis=-1, tiled=True)
            )
            z_t = bvrnn_mod._apply_bit_mask(jnp.round(enc_t), mask_t)
            phi_z_t = bvrnn_mod._mlp_elu(p["phi_z"], z_t, prec, elu)
            _, h_next_loc = _dec_and_gru(p, cfg, phi_z_t, h_full_t, h_loc)
            return h_next_loc, z_t

        xs = (jnp.swapaxes(phi_x, 0, 1), jnp.swapaxes(mask, 0, 1))
        h_loc, z_seq = jax.lax.scan(
            step, _local_h_slice(h_full).astype(cfg.dtype), xs
        )
        h_final = jax.lax.all_gather(h_loc, MODEL_AXIS, axis=-1, tiled=True)
        return jnp.swapaxes(z_seq, 0, 1), h_final

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(specs, batch, batch, batch),
        out_specs=(batch, batch),
        check_rep=False,
    )
    return fn(tp_params, y, var_bitrate, h0)
