"""Bernoulli-valued Variational RNN (BVRNN) — TPU-native scan formulation.

Re-creation of the reference codec core (``bvrnn.py:13-229``) as pure
functions over an explicit parameter pytree, with the per-frame recurrence
expressed as ``jax.lax.scan`` so XLA compiles one fused step:

  * training forward with scheduled sampling + Bernoulli KL
    (reference ``bvrnn.py:86-160``),
  * greedy streaming ``encode`` (``bvrnn.py:163-209``),
  * streaming ``decode`` (``bvrnn.py:211-229``).

Key invariant (the closed-loop state sync, reference ``bvrnn.py:204-206`` /
``:226-227``): both encode and decode advance the shared GRU only with
*generated* features, so their hidden states evolve identically given the
binary codes alone — nothing but codes needs transmitting.

TPU-first design: the frame loop is a ``lax.scan`` whose body is a handful
of (B, 1024)x(1024, 1024) matmuls — MXU-shaped; ``phi_x`` over the whole
sequence is hoisted out of the scan as one large batched matmul.  All
randomness is explicit (`jax.random`), threaded as per-step scan inputs.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = Any  # nested dict/list pytree of jnp arrays


@dataclasses.dataclass(frozen=True)
class BVRNNConfig:
    x_dim: int = 80
    h_dim: int = 1024
    z_dim: int = 64
    var_bit: bool = True
    # jnp dtype for parameters/compute. float32 gives reference parity;
    # bfloat16 roughly halves HBM traffic of the weight-bound scan.
    dtype: Any = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST
    # fused_cell: run the scan bodies with weight-concatenated matmuls
    # (13 dots/step instead of 15 dots + 3 concats + 2 GRU dots) — the
    # per-op-sequencing-bound scan's throughput lever (VERDICT r4 #2b).
    # Measured full-size (benchmarks/probe_scan_cell.py, r5): 3.69x at
    # B=1 (117.5 -> 31.8 us/step — small batches are op-count-bound), but
    # 0.95x at B=128 (compute-bound there; the dec_l4 fold trades the
    # 80-dim bottleneck for an extra 1024^2 matmul).  Hence the "auto"
    # policy: fused iff the traced batch < FUSED_AUTO_MAX_B.  True/False
    # force one cell for every batch.  Changes float reassociation, so it
    # is a fast-serving knob (BVRNNCodecModel precision='default'), never
    # a parity-mode one; all fused paths share the same sub-step helpers
    # so encode_decode / decode / decode_plc stay bitwise state-synced
    # WITH EACH OTHER at a given batch size (tests/test_bvrnn_fused.py).
    # NOTE "auto" makes numerics a function of batch size: paths compared
    # bitwise across batch sizes must pin the cell (the serving tests all
    # run B <= 8, below the threshold).  Unsupported with
    # weight-only-int8 dict weights (codec keeps the standard cell when
    # quantize= is set).
    fused_cell: bool | str = False
    # lax.scan unroll factor for the frame loops (amortizes per-iteration
    # loop overhead; >1 only changes scheduling, not numerics)
    unroll: int = 1


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------


def _dense_init(key, fan_in, fan_out, dtype):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), dtype, -bound, bound),
    }


def _mlp_init(key, dims, dtype):
    keys = jax.random.split(key, len(dims) - 1)
    return [
        _dense_init(k, dims[i], dims[i + 1], dtype) for i, k in enumerate(keys)
    ]


def init_bvrnn_params(
    key: jax.Array,
    cfg: BVRNNConfig,
    mean_std_mel: tuple[np.ndarray, np.ndarray] | None = None,
    log_sigma_init: float = -1.0,
) -> Params:
    """Build a fresh parameter pytree (layer dims: reference ``bvrnn.py:44-83``)."""
    x, h, z = cfg.x_dim, cfg.h_dim, cfg.z_dim
    k = jax.random.split(key, 7)
    if mean_std_mel is None:
        mean_std_mel = (np.zeros(x), np.ones(x))
    bound = 1.0 / np.sqrt(h)
    kih, khh, bih, bhh = jax.random.split(k[6], 4)
    return {
        # frozen mel statistics + trainable KLD/reconstruction balance
        # (reference bvrnn.py:30-33)
        "mean_mel": jnp.asarray(mean_std_mel[0], cfg.dtype),
        "std_mel": jnp.asarray(mean_std_mel[1], cfg.dtype),
        "log_sigma": jnp.asarray([log_sigma_init], cfg.dtype),
        "phi_x": _mlp_init(k[0], [x, h, h, h], cfg.dtype),
        "phi_z": _mlp_init(k[1], [z, h, h, h], cfg.dtype),
        "enc": _mlp_init(k[2], [2 * h, h, h, z], cfg.dtype),
        "prior": _mlp_init(k[3], [h, h, h, z], cfg.dtype),
        "dec": _mlp_init(k[4], [2 * h, h, h, h, x], cfg.dtype),
        # single-layer GRU, input 2h, hidden h; weights stored transposed
        # (in, 3h) with gates packed [r|z|n] like torch (bvrnn.py:83)
        "gru": {
            "w_ih": jax.random.uniform(kih, (2 * h, 3 * h), cfg.dtype, -bound, bound),
            "w_hh": jax.random.uniform(khh, (h, 3 * h), cfg.dtype, -bound, bound),
            "b_ih": jax.random.uniform(bih, (3 * h,), cfg.dtype, -bound, bound),
            "b_hh": jax.random.uniform(bhh, (3 * h,), cfg.dtype, -bound, bound),
        },
    }


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Functional pieces
# ---------------------------------------------------------------------------


def _matmul(x, w, precision):
    """Matmul supporting plain f32/bf16 weights or weight-only-int8 dicts
    ({'q', 'scale'}, see ops.quant) — the int8 convert fuses into the MXU
    pass so weights stay int8 in HBM (4x less traffic in the HBM-bound
    single-stream scan)."""
    if isinstance(w, dict):
        from bvsc_tpu.ops.quant import dequant_matmul

        return dequant_matmul(x, w, precision=precision)
    return jnp.matmul(x, w, precision=precision)


def _dense(p, x, precision):
    return _matmul(x, p["w"], precision) + p["b"]


def _mlp_elu(layers, x, precision, final_activation=None):
    """Linear+ELU stack; last layer gets ``final_activation`` (None/sigmoid/elu)."""
    for p in layers[:-1]:
        x = jax.nn.elu(_dense(p, x, precision))
    x = _dense(layers[-1], x, precision)
    if final_activation is not None:
        x = final_activation(x)
    return x


def phi_x_apply(params, y, precision):
    """3x(Linear+ELU) feature net (reference bvrnn.py:44-50)."""
    return _mlp_elu(params["phi_x"], y, precision, jax.nn.elu)


def phi_z_apply(params, z, precision):
    return _mlp_elu(params["phi_z"], z, precision, jax.nn.elu)


def enc_apply(params, x, precision):
    return _mlp_elu(params["enc"], x, precision, jax.nn.sigmoid)


def prior_apply(params, h, precision):
    return _mlp_elu(params["prior"], h, precision, jax.nn.sigmoid)


def dec_apply(params, x, precision):
    return _mlp_elu(params["dec"], x, precision, None)


def gru_step(gru: Params, x: jax.Array, h: jax.Array, precision) -> jax.Array:
    """One torch-semantics GRU step (gates packed [r|z|n]).

    r = sig(Wir x + bir + Whr h + bhr); z likewise;
    n = tanh(Win x + bin + r*(Whn h + bhn)); h' = (1-z)n + z h.
    """
    gi = _matmul(x, gru["w_ih"], precision) + gru["b_ih"]
    gh = _matmul(h, gru["w_hh"], precision) + gru["b_hh"]
    H = h.shape[-1]
    i_r, i_z, i_n = gi[..., :H], gi[..., H : 2 * H], gi[..., 2 * H :]
    h_r, h_z, h_n = gh[..., :H], gh[..., H : 2 * H], gh[..., 2 * H :]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def bit_mask_from_bitrate(var_bitrate: jax.Array, z_dim: int) -> jax.Array:
    """First-k bit-priority mask: (B, T) bits/frame -> (B, T, z_dim) float
    (reference bvrnn.py:104-106)."""
    bit_idx = jnp.arange(z_dim)
    return (var_bitrate[..., None] > bit_idx).astype(jnp.float32)


def _apply_bit_mask(z, mask):
    """Masked-out bits are set to the uninformative midpoint 0.5
    (reference bvrnn.py:129,193-194)."""
    return z * mask + 0.5 * (1.0 - mask)


def _normalize(params, y):
    return (y - params["mean_mel"]) / params["std_mel"]


# ---------------------------------------------------------------------------
# Fused scan cell (cfg.fused_cell) — fewer, larger ops per sequential step
# ---------------------------------------------------------------------------
#
# The inference scans are bound by per-op sequencing overhead, not FLOPs or
# bytes (benchmarks/README.md "Single-stream floor probes": ~4 us/op at any
# batch; bench.py's encode_decomposition probe makes it auditable per run).
# The fused cell reduces the ops on the sequential critical path by weight
# concatenation, legal because every reference Linear that consumes
# concat([a, b]) (reference bvrnn.py:118-145) distributes as
# a @ W[:k] + b @ W[k:]:
#
#   * w_h_combo  (h, 5h):  [enc_l1(h-part) | dec_l1(h-part) | gru w_hh] —
#     everything that reads ONLY the carried h happens in one matmul at
#     step start;
#   * w_pz_combo (h, 4h):  [dec_l1(phi_z-part) | gru w_ih(phi_z-part)];
#   * w_ih_top   (h, 3h):  gru w_ih(phi_x_gen-part), applied to the
#     generated features;
#   * enc_l1's phi_x-part is hoisted OUT of the scan entirely (phi_x is
#     precomputed for the whole sequence, so its enc_l1 projection is one
#     big (B, T, h) matmul);
#   * dec_l4 -> normalize -> phi_x_l1 folds into ONE (h, h) matmul
#     (w_fold below): the mel-dim round trip h->x->h is affine, so the
#     scan emits the pre-projection activation a3 and the (B, T, x) mel
#     is produced AFTER the scan by a single hoisted dec_l4 matmul.
#
# Net: 13 dots/step vs 15 dots + 3 concats + 2 separate GRU dots, and two
# sequence-sized matmuls leave the sequential path.  Reassociation differs
# from the standard cell (~1e-7 f32), so codes can flip in rare near-0.5
# cases — the same contract as every other fast-serving knob.  All fused
# variants below share _fused_h_combo/_fused_tail so their per-step
# numerics are IDENTICAL given the same (h, z_t): the closed-loop state
# sync (reference bvrnn.py:204-206 == :226-227) holds bitwise between
# fused encode_decode, fused decode, and fused decode_plc.


def is_quantized(params: Params) -> bool:
    """True for weight-only-int8 parameter pytrees (ops.quant dicts)."""
    return isinstance(params["gru"]["w_ih"], dict)


# "auto" threshold: fused wins while the scan step is op-count-bound; by
# B=32 the (B, 1024) matmul tiles make it compute-bound and standard wins
# slightly (probe_scan_cell.py: fused 3.69x at B=1, 0.95x at B=128)
FUSED_AUTO_MAX_B = 32


def _use_fused(cfg: BVRNNConfig, batch: int) -> bool:
    """Resolve the fused_cell policy for a traced batch size."""
    if cfg.fused_cell == "auto":
        return batch < FUSED_AUTO_MAX_B
    return bool(cfg.fused_cell)


def _fuse_inference_params(params: Params, cfg: BVRNNConfig) -> Params:
    """Recombine the per-step weights (see module comment above).  Runs
    inside the traced program: the concatenations are one-time, scan-free
    ops (~36 MB of weight movement per dispatch at full size — noise next
    to a single scan step).  Rejects quantized dict weights."""
    if is_quantized(params):
        raise TypeError("fused_cell does not support quantized weights")
    h = params["gru"]["w_hh"].shape[0]
    enc1, enc2, enc3 = params["enc"]
    dec = params["dec"]
    dec1, dec2, dec3, dec4 = dec
    px1, px2, px3 = params["phi_x"]
    gru = params["gru"]
    inv_std = 1.0 / params["std_mel"]
    return {
        "w_h_combo": jnp.concatenate(
            [enc1["w"][h:], dec1["w"][h:], gru["w_hh"]], axis=1),
        "w_pz_combo": jnp.concatenate(
            [dec1["w"][:h], gru["w_ih"][h:]], axis=1),
        "w_ih_top": gru["w_ih"][:h],
        "w_enc1_x": enc1["w"][:h],
        "b_enc1": enc1["b"],
        "enc2": enc2,
        "enc3": enc3,
        "b_dec1": dec1["b"],
        "dec2": dec2,
        "dec3": dec3,
        "dec4": dec4,
        # dec_l4 -> normalize -> phi_x_l1 fold (exact affine identity):
        # norm(a3 @ W4 + b4) @ Wpx1 + bpx1
        #   == a3 @ (W4 @ (Wpx1 * inv_std[:, None]))
        #      + ((b4 - mean) * inv_std) @ Wpx1 + bpx1
        "w_fold": jnp.matmul(dec4["w"], px1["w"] * inv_std[:, None],
                             precision=jax.lax.Precision.HIGHEST),
        "b_fold": jnp.matmul((dec4["b"] - params["mean_mel"]) * inv_std,
                             px1["w"],
                             precision=jax.lax.Precision.HIGHEST) + px1["b"],
        "px2": px2,
        "px3": px3,
        "phi_z": params["phi_z"],
        "b_ih": gru["b_ih"],
        "b_hh": gru["b_hh"],
    }


def _fused_h_combo(fp, h, prec):
    """Everything that reads only the carried h: one (B,h)x(h,5h) matmul.
    Returns (enc_l1 h-part, dec_l1 h-part, GRU hidden gates pre-bias)."""
    H = h.shape[-1]
    combo = jnp.matmul(h, fp["w_h_combo"], precision=prec)
    return combo[..., :H], combo[..., H : 2 * H], combo[..., 2 * H :]


def _fused_tail(fp, h, z_t, d1h, gh, prec):
    """phi_z -> dec stack -> folded generated-feature stack -> GRU update.
    Returns (h_next, a3) where a3 is dec's last hidden activation; the mel
    output is a3 @ dec4 AFTER the scan (hoisted)."""
    H = h.shape[-1]
    p = z_t
    for lyr in fp["phi_z"]:
        p = jax.nn.elu(_dense(lyr, p, prec))
    pzc = jnp.matmul(p, fp["w_pz_combo"], precision=prec)
    d1z, gi_bot = pzc[..., :H], pzc[..., H:]
    d = jax.nn.elu(d1z + d1h + fp["b_dec1"])
    d = jax.nn.elu(_dense(fp["dec2"], d, prec))
    a3 = jax.nn.elu(_dense(fp["dec3"], d, prec))
    u = jax.nn.elu(jnp.matmul(a3, fp["w_fold"], precision=prec) + fp["b_fold"])
    u = jax.nn.elu(_dense(fp["px2"], u, prec))
    xg = jax.nn.elu(_dense(fp["px3"], u, prec))
    gi = jnp.matmul(xg, fp["w_ih_top"], precision=prec) + gi_bot + fp["b_ih"]
    ghb = gh + fp["b_hh"]
    r = jax.nn.sigmoid(gi[..., :H] + ghb[..., :H])
    zz = jax.nn.sigmoid(gi[..., H : 2 * H] + ghb[..., H : 2 * H])
    n = jnp.tanh(gi[..., 2 * H :] + r * ghb[..., 2 * H :])
    h_next = (1.0 - zz) * n + zz * h
    return h_next, a3


def _fused_enc(fp, encx_t, e1h, mask_t, prec):
    """enc stack from the hoisted phi_x projection + the combo h-part."""
    a = jax.nn.elu(encx_t + e1h + fp["b_enc1"])
    a = jax.nn.elu(_dense(fp["enc2"], a, prec))
    enc_t = jax.nn.sigmoid(_dense(fp["enc3"], a, prec))
    return _apply_bit_mask(jnp.round(enc_t), mask_t)


def _fused_prepare_encode(params, cfg, y, var_bitrate):
    """Shared hoisted work for the fused encode-side scans."""
    prec = cfg.precision
    fp = _fuse_inference_params(params, cfg)
    ynorm = _normalize(params, y.astype(cfg.dtype))
    phi_x = phi_x_apply(params, ynorm, prec)
    encx = jnp.matmul(phi_x, fp["w_enc1_x"], precision=prec)
    if cfg.var_bit:
        assert var_bitrate is not None
        mask = bit_mask_from_bitrate(var_bitrate, cfg.z_dim).astype(cfg.dtype)
    else:
        mask = jnp.ones((y.shape[0], y.shape[1], cfg.z_dim), cfg.dtype)
    return fp, encx, mask


def _fused_dec_seq(fp, a3_seq, prec):
    """Hoisted dec_l4: (T, B, h) activations -> (B, T, x) mel."""
    dec_seq = _dense(fp["dec4"], a3_seq, prec)
    return jnp.swapaxes(dec_seq, 0, 1)


# ---------------------------------------------------------------------------
# Inference: encode / decode scans
# ---------------------------------------------------------------------------


def encode(
    params: Params,
    cfg: BVRNNConfig,
    y: jax.Array,
    var_bitrate: jax.Array | None,
    h: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Greedy encode (reference ``bvrnn.py:163-209``).

    y: (B, T, x_dim) log-mel frames; var_bitrate: (B, T) bits/frame or None;
    h: (B, h_dim) initial hidden state.
    Returns (codes (B, T, z_dim), h_seq (B, T, h_dim)) where ``h_seq[t]`` is
    the hidden state *before* consuming frame t (matches reference).
    """
    prec = cfg.precision
    if _use_fused(cfg, y.shape[0]):
        fp, encx, mask = _fused_prepare_encode(params, cfg, y, var_bitrate)

        def fstep(h, xs):
            encx_t, mask_t = xs
            e1h, d1h, gh = _fused_h_combo(fp, h, prec)
            z_t = _fused_enc(fp, encx_t, e1h, mask_t, prec)
            h_next, _ = _fused_tail(fp, h, z_t, d1h, gh, prec)
            return h_next, (z_t, h)

        xs = (jnp.swapaxes(encx, 0, 1), jnp.swapaxes(mask, 0, 1))
        _, (z_seq, h_seq) = jax.lax.scan(
            fstep, h.astype(cfg.dtype), xs, unroll=cfg.unroll)
        return jnp.swapaxes(z_seq, 0, 1), jnp.swapaxes(h_seq, 0, 1)
    ynorm = _normalize(params, y.astype(cfg.dtype))
    phi_x = phi_x_apply(params, ynorm, prec)  # (B, T, h) — hoisted matmul
    if cfg.var_bit:
        assert var_bitrate is not None
        mask = bit_mask_from_bitrate(var_bitrate, cfg.z_dim).astype(cfg.dtype)
    else:
        mask = jnp.ones((y.shape[0], y.shape[1], cfg.z_dim), cfg.dtype)

    def step(h, xs):
        phi_x_t, mask_t = xs
        enc_t = enc_apply(params, jnp.concatenate([phi_x_t, h], -1), prec)
        z_t = _apply_bit_mask(jnp.round(enc_t), mask_t)
        phi_z_t = phi_z_apply(params, z_t, prec)
        dec_t = dec_apply(params, jnp.concatenate([phi_z_t, h], -1), prec)
        phi_x_gen = phi_x_apply(params, _normalize(params, dec_t), prec)
        h_next = gru_step(
            params["gru"], jnp.concatenate([phi_x_gen, phi_z_t], -1), h, prec
        )
        return h_next, (z_t, h)

    # scan over time: move T to the leading axis
    xs = (jnp.swapaxes(phi_x, 0, 1), jnp.swapaxes(mask, 0, 1))
    h_final, (z_seq, h_seq) = jax.lax.scan(
        step, h.astype(cfg.dtype), xs, unroll=cfg.unroll)
    return jnp.swapaxes(z_seq, 0, 1), jnp.swapaxes(h_seq, 0, 1)


def encode_with_state(
    params: Params, cfg: BVRNNConfig, y, var_bitrate, h
) -> tuple[jax.Array, jax.Array]:
    """Like :func:`encode` but returns the *final* hidden state — the hook
    for chunked streaming (reference encode's carried ``h``)."""
    prec = cfg.precision
    if _use_fused(cfg, y.shape[0]):
        fp, encx, mask = _fused_prepare_encode(params, cfg, y, var_bitrate)

        def fstep(h, xs):
            encx_t, mask_t = xs
            e1h, d1h, gh = _fused_h_combo(fp, h, prec)
            z_t = _fused_enc(fp, encx_t, e1h, mask_t, prec)
            h_next, _ = _fused_tail(fp, h, z_t, d1h, gh, prec)
            return h_next, z_t

        xs = (jnp.swapaxes(encx, 0, 1), jnp.swapaxes(mask, 0, 1))
        h_final, z_seq = jax.lax.scan(
            fstep, h.astype(cfg.dtype), xs, unroll=cfg.unroll)
        return jnp.swapaxes(z_seq, 0, 1), h_final
    ynorm = _normalize(params, y.astype(cfg.dtype))
    phi_x = phi_x_apply(params, ynorm, prec)
    if cfg.var_bit:
        assert var_bitrate is not None
        mask = bit_mask_from_bitrate(var_bitrate, cfg.z_dim).astype(cfg.dtype)
    else:
        mask = jnp.ones((y.shape[0], y.shape[1], cfg.z_dim), cfg.dtype)

    def step(h, xs):
        phi_x_t, mask_t = xs
        enc_t = enc_apply(params, jnp.concatenate([phi_x_t, h], -1), prec)
        z_t = _apply_bit_mask(jnp.round(enc_t), mask_t)
        phi_z_t = phi_z_apply(params, z_t, prec)
        dec_t = dec_apply(params, jnp.concatenate([phi_z_t, h], -1), prec)
        phi_x_gen = phi_x_apply(params, _normalize(params, dec_t), prec)
        h_next = gru_step(
            params["gru"], jnp.concatenate([phi_x_gen, phi_z_t], -1), h, prec
        )
        return h_next, z_t

    xs = (jnp.swapaxes(phi_x, 0, 1), jnp.swapaxes(mask, 0, 1))
    h_final, z_seq = jax.lax.scan(
        step, h.astype(cfg.dtype), xs, unroll=cfg.unroll)
    return jnp.swapaxes(z_seq, 0, 1), h_final


def encode_decode(
    params: Params,
    cfg: BVRNNConfig,
    y: jax.Array,
    var_bitrate: jax.Array | None,
    h: jax.Array,
    frame_valid: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused encode+decode in ONE scan: (codes, decoded mel, final h).

    The closed-loop state-sync invariant makes this exact, not approximate:
    ``encode`` already advances its GRU with the *generated* features of its
    own ``dec_t`` (reference ``bvrnn.py:204-206``), which is precisely what
    ``decode`` does (``:226-227``) — so the ``dec_t`` computed inside the
    encoder scan IS ``decode()``'s output for the emitted codes, bit for bit
    (asserted by ``tests/test_bvrnn.py::test_encode_decode_state_sync``).  A
    resynthesis call (``BVRNNCodecModel.__call__``) therefore never needs to
    re-run the decode scan.

    frame_valid: optional (B, T) 0/1 mask; invalid frames have their codes
    forced to the uninformative 0.5 midpoint *inside* the scan, so the
    decoded trajectory matches a separate ``decode`` call on codes that were
    trimmed to the valid frames and re-padded with 0.5 (the padded-bucket
    convention of the codec front door).
    """
    prec = cfg.precision
    if _use_fused(cfg, y.shape[0]):
        fp, encx, mask = _fused_prepare_encode(params, cfg, y, var_bitrate)
        if frame_valid is not None:
            mask = mask * frame_valid.astype(cfg.dtype)[:, :, None]

        def fstep(h, xs):
            encx_t, mask_t = xs
            e1h, d1h, gh = _fused_h_combo(fp, h, prec)
            z_t = _fused_enc(fp, encx_t, e1h, mask_t, prec)
            h_next, a3 = _fused_tail(fp, h, z_t, d1h, gh, prec)
            return h_next, (z_t, a3)

        xs = (jnp.swapaxes(encx, 0, 1), jnp.swapaxes(mask, 0, 1))
        h_final, (z_seq, a3_seq) = jax.lax.scan(
            fstep, h.astype(cfg.dtype), xs, unroll=cfg.unroll)
        return (jnp.swapaxes(z_seq, 0, 1),
                _fused_dec_seq(fp, a3_seq, prec), h_final)
    ynorm = _normalize(params, y.astype(cfg.dtype))
    phi_x = phi_x_apply(params, ynorm, prec)
    if cfg.var_bit:
        assert var_bitrate is not None
        mask = bit_mask_from_bitrate(var_bitrate, cfg.z_dim).astype(cfg.dtype)
    else:
        mask = jnp.ones((y.shape[0], y.shape[1], cfg.z_dim), cfg.dtype)
    if frame_valid is not None:
        mask = mask * frame_valid.astype(cfg.dtype)[:, :, None]

    def step(h, xs):
        phi_x_t, mask_t = xs
        enc_t = enc_apply(params, jnp.concatenate([phi_x_t, h], -1), prec)
        z_t = _apply_bit_mask(jnp.round(enc_t), mask_t)
        phi_z_t = phi_z_apply(params, z_t, prec)
        dec_t = dec_apply(params, jnp.concatenate([phi_z_t, h], -1), prec)
        phi_x_gen = phi_x_apply(params, _normalize(params, dec_t), prec)
        h_next = gru_step(
            params["gru"], jnp.concatenate([phi_x_gen, phi_z_t], -1), h, prec
        )
        return h_next, (z_t, dec_t)

    xs = (jnp.swapaxes(phi_x, 0, 1), jnp.swapaxes(mask, 0, 1))
    h_final, (z_seq, dec_seq) = jax.lax.scan(
        step, h.astype(cfg.dtype), xs, unroll=cfg.unroll)
    return jnp.swapaxes(z_seq, 0, 1), jnp.swapaxes(dec_seq, 0, 1), h_final


def decode(
    params: Params, cfg: BVRNNConfig, z: jax.Array, h: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Decode codes to mel frames (reference ``bvrnn.py:211-229``).

    z: (B, T, z_dim); h: (B, h_dim). Returns (mel (B, T, x_dim), final h).

    phi_z is computed PER STEP, not hoisted across the sequence, on purpose:
    the decoder's hidden trajectory must stay bitwise-identical to the
    encoder's closed-loop state sync (the per-step ``encode``/
    ``encode_decode`` bodies and the reference's per-step decode loop,
    reference ``bvrnn.py:222-227``).  A hoisted (B, T, z) phi_z matmul
    reassociates differently from the per-step (B, z) one (~1e-7), and a
    TRAINED model's closed-loop dynamics amplify that noise ~15 %/frame —
    measured on the demo checkpoint, a hoisted decode diverged from the
    fused resynthesis to 1.3 dB SNR within 172 frames despite bit-identical
    codes.  Per-step phi_z keeps split encode/decode deployments (serving:
    encode on one host, decode on another) exactly synchronized.
    """
    prec = cfg.precision
    if _use_fused(cfg, z.shape[0]):
        # same _fused_h_combo/_fused_tail as the fused encode_decode — the
        # combo's enc columns go unused here, but sharing the exact (h, 5h)
        # matmul keeps the decoder's hidden trajectory bitwise identical to
        # the encoder's closed-loop state sync in fused mode
        fp = _fuse_inference_params(params, cfg)

        def fstep(h, z_t):
            _, d1h, gh = _fused_h_combo(fp, h, prec)
            h_next, a3 = _fused_tail(fp, h, z_t, d1h, gh, prec)
            return h_next, a3

        h_final, a3_seq = jax.lax.scan(
            fstep, h.astype(cfg.dtype),
            jnp.swapaxes(z.astype(cfg.dtype), 0, 1), unroll=cfg.unroll)
        return _fused_dec_seq(fp, a3_seq, prec), h_final

    def step(h, z_t):
        phi_z_t = phi_z_apply(params, z_t, prec)
        dec_t = dec_apply(params, jnp.concatenate([phi_z_t, h], -1), prec)
        phi_x_gen = phi_x_apply(params, _normalize(params, dec_t), prec)
        h_next = gru_step(
            params["gru"], jnp.concatenate([phi_x_gen, phi_z_t], -1), h, prec
        )
        return h_next, dec_t

    h_final, dec_seq = jax.lax.scan(
        step, h.astype(cfg.dtype), jnp.swapaxes(z.astype(cfg.dtype), 0, 1),
        unroll=cfg.unroll
    )
    return jnp.swapaxes(dec_seq, 0, 1), h_final


def decode_plc(
    params: Params,
    cfg: BVRNNConfig,
    z: jax.Array,
    lost: jax.Array,
    h: jax.Array,
    conceal_bits: jax.Array | None = None,
    mode: str = "expect",
) -> tuple[jax.Array, jax.Array]:
    """Decode with packet-loss concealment from the BVRNN's own prior.

    Like :func:`decode`, but frames flagged in ``lost`` (B, T) ignore their
    ``z`` entries and substitute codes derived from the prior
    ``P(z_t | h_t)`` — the decoder-side estimate of what the encoder sent.
    The reference trains exactly this prior network for its Bernoulli KL
    (``bvrnn.py:148-156``) but never uses it at inference; here it doubles
    as the concealment model, so a lost 11.6 ms packet degrades toward the
    model's own continuation instead of a dropout.

    mode: ``'expect'`` (default) substitutes the prior *probabilities*
    (the expected code vector) — measured better on real speech than both
    the rounded MAP codes and neutral 0.5-fill (10% loss, demo ckpt:
    mel-L1 vs clean decode 0.234 expect / 0.257 zero-fill / 3.92 map), and
    numerically stable: ``'map'`` (``round(P)``) sits on a knife edge, so
    an epsilon difference in ``h`` (e.g. from a different chunking of the
    same stream) can flip a concealed bit and macroscopically change the
    continuation.  Even in 'expect' mode concealment is a function of
    ``h``, so different chunkings of the same lossy stream agree only
    approximately (~1e-2 waveform after ~30 losses) — unlike the lossless
    paths, free-running frames lack the common code forcing that squashes
    float-reassociation noise.

    conceal_bits: optional (B, T) bits/frame for concealed frames (the
    receiver knows the stream's allocation, e.g. from the .bvsc table);
    None uses all ``z_dim`` bits.  After a loss the encoder/decoder hidden
    states diverge (the encoder advanced on the true codes); the GRU's
    forgetting re-converges them over subsequent received frames — measured
    in ``tests/test_plc.py``.

    Returns (mel (B, T, x_dim), final h).
    """
    if mode not in ("expect", "map"):
        raise ValueError(f"unknown concealment mode {mode!r}")
    prec = cfg.precision
    z = z.astype(cfg.dtype)
    lost_f = lost.astype(cfg.dtype)
    if conceal_bits is not None:
        cmask = bit_mask_from_bitrate(conceal_bits, cfg.z_dim).astype(cfg.dtype)
    else:
        cmask = jnp.ones(z.shape[:2] + (cfg.z_dim,), cfg.dtype)
    # phi_z per step on the selected codes (received or concealed): received
    # frames stay bitwise identical to a plain decode, which itself matches
    # the encoder's per-step state sync (see :func:`decode` — a hoisted
    # phi_z would desync trained models)
    if _use_fused(cfg, z.shape[0]):
        # shares _fused_h_combo/_fused_tail with fused decode, so received
        # frames stay bitwise identical to a fused clean decode; the prior
        # stays a standard per-step MLP (it only shapes concealed codes)
        fp = _fuse_inference_params(params, cfg)

        def fstep(h, xs):
            z_rx_t, lost_t, cmask_t = xs
            prior_t = prior_apply(params, h, prec)
            z_hat = jnp.round(prior_t) if mode == "map" else prior_t
            z_conceal = _apply_bit_mask(z_hat, cmask_t)
            z_t = jnp.where(lost_t[:, None] > 0, z_conceal, z_rx_t)
            _, d1h, gh = _fused_h_combo(fp, h, prec)
            h_next, a3 = _fused_tail(fp, h, z_t, d1h, gh, prec)
            return h_next, a3

        xs = (
            jnp.swapaxes(z, 0, 1),
            jnp.swapaxes(lost_f, 0, 1),
            jnp.swapaxes(cmask, 0, 1),
        )
        h_final, a3_seq = jax.lax.scan(
            fstep, h.astype(cfg.dtype), xs, unroll=cfg.unroll)
        return _fused_dec_seq(fp, a3_seq, prec), h_final

    def step(h, xs):
        z_rx_t, lost_t, cmask_t = xs
        prior_t = prior_apply(params, h, prec)
        z_hat = jnp.round(prior_t) if mode == "map" else prior_t
        z_conceal = _apply_bit_mask(z_hat, cmask_t)
        z_t = jnp.where(lost_t[:, None] > 0, z_conceal, z_rx_t)
        phi_z_t = phi_z_apply(params, z_t, prec)
        dec_t = dec_apply(params, jnp.concatenate([phi_z_t, h], -1), prec)
        phi_x_gen = phi_x_apply(params, _normalize(params, dec_t), prec)
        h_next = gru_step(
            params["gru"], jnp.concatenate([phi_x_gen, phi_z_t], -1), h, prec
        )
        return h_next, dec_t

    xs = (
        jnp.swapaxes(z, 0, 1),
        jnp.swapaxes(lost_f, 0, 1),
        jnp.swapaxes(cmask, 0, 1),
    )
    h_final, dec_seq = jax.lax.scan(
        step, h.astype(cfg.dtype), xs, unroll=cfg.unroll)
    return jnp.swapaxes(dec_seq, 0, 1), h_final


# ---------------------------------------------------------------------------
# Training forward (scheduled sampling + Bernoulli KL)
# ---------------------------------------------------------------------------


def forward_train(
    params: Params,
    cfg: BVRNNConfig,
    y: jax.Array,
    p_use_gen: jax.Array | float,
    greedy: bool,
    var_bitrate: jax.Array | None,
    rng: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Training-style forward (reference ``bvrnn.py:86-160``).

    Per timestep a single scalar draw chooses between the teacher-forced
    hidden state ``h`` and the closed-loop ``h2`` (scheduled sampling); the
    binary bottleneck uses a straight-through estimator (greedy rounding or
    Bernoulli sampling); the Bernoulli KL(enc || prior) is clamped at 1e-3
    and bit-masked under variable bitrate.

    Returns (mel_hat (B, T, x_dim), scalar KLD).
    """
    prec = cfg.precision
    B, T, _ = y.shape
    # a bf16-compute cfg may be driven with f32 master params (the trainer
    # casts inside loss_fn, but validation helpers call this directly) —
    # cast here so the scan carries stay dtype-consistent either way
    if not is_quantized(params) and params["gru"]["w_hh"].dtype != cfg.dtype:
        params = jax.tree.map(lambda a: a.astype(cfg.dtype), params)
    if _use_fused(cfg, B):
        return _forward_train_fused(params, cfg, y, p_use_gen, greedy,
                                    var_bitrate, rng)
    ynorm = _normalize(params, y.astype(cfg.dtype))
    phi_x = phi_x_apply(params, ynorm, prec)
    if cfg.var_bit:
        assert var_bitrate is not None
        mask = bit_mask_from_bitrate(var_bitrate, cfg.z_dim).astype(cfg.dtype)
    else:
        mask = jnp.ones((B, T, cfg.z_dim), cfg.dtype)

    k_sched, k_bin = jax.random.split(rng)
    # one scalar per timestep, shared across the batch (reference bvrnn.py:111)
    use_gen = jax.random.uniform(k_sched, (T,)) < p_use_gen
    bin_noise = jax.random.uniform(k_bin, (T, B, cfg.z_dim), cfg.dtype)

    def step(carry, xs):
        h, h2 = carry
        phi_x_t, mask_t, use_gen_t, noise_t = xs
        h_sel = jnp.where(use_gen_t, h2, h)

        enc_t = enc_apply(params, jnp.concatenate([phi_x_t, h_sel], -1), prec)
        prior_t = prior_apply(params, h_sel, prec)

        # straight-through binarization (reference bvrnn.py:123-126)
        if greedy:
            z_hard = jnp.round(enc_t)
        else:
            z_hard = jnp.round(noise_t - 0.5 + enc_t)
        z_t = enc_t + jax.lax.stop_gradient(z_hard - enc_t)
        z_t = _apply_bit_mask(z_t, mask_t)

        phi_z_t = phi_z_apply(params, z_t, prec)
        dec_t = dec_apply(params, jnp.concatenate([phi_z_t, h_sel], -1), prec)
        phi_x_gen = phi_x_apply(params, _normalize(params, dec_t), prec)

        # dual recurrence through the one shared GRU (reference bvrnn.py:142-145)
        h_next = gru_step(
            params["gru"], jnp.concatenate([phi_x_t, phi_z_t], -1), h, prec
        )
        h2_next = gru_step(
            params["gru"], jnp.concatenate([phi_x_gen, phi_z_t], -1), h2, prec
        )

        # Bernoulli KL(enc || prior), clamped (reference bvrnn.py:148-149)
        c = 1e-3
        kld_elem = enc_t * (
            jnp.log(jnp.clip(enc_t, min=c)) - jnp.log(jnp.clip(prior_t, min=c))
        ) + (1.0 - enc_t) * (
            jnp.log(jnp.clip(1.0 - enc_t, min=c))
            - jnp.log(jnp.clip(1.0 - prior_t, min=c))
        )
        kld_t = jnp.mean(jnp.sum(kld_elem * mask_t, -1))
        return (h_next, h2_next), (dec_t, kld_t)

    h0 = jnp.zeros((B, cfg.h_dim), cfg.dtype)
    xs = (
        jnp.swapaxes(phi_x, 0, 1),
        jnp.swapaxes(mask, 0, 1),
        use_gen,
        bin_noise,
    )
    _, (dec_seq, kld_seq) = jax.lax.scan(step, (h0, h0), xs,
                                         unroll=cfg.unroll)
    return jnp.swapaxes(dec_seq, 0, 1), jnp.mean(kld_seq)


def _forward_train_fused(
    params: Params,
    cfg: BVRNNConfig,
    y: jax.Array,
    p_use_gen: jax.Array | float,
    greedy: bool,
    var_bitrate: jax.Array | None,
    rng: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Fused-cell training forward (VERDICT r4 #3) — same math as
    :func:`forward_train` up to float reassociation, with the sequential
    step reduced from 20 dots + 4 concats to 16 dots:

      * ``w_hsel_combo`` (h, 3h): enc_l1/prior_l1/dec_l1 h-parts in one
        matmul on the scheduled-sampling-selected hidden state;
      * BOTH GRU hidden projections (teacher h and closed-loop h2) as ONE
        stacked (2B, h) x (h, 3h) matmul;
      * enc_l1's phi_x part AND the teacher GRU input gates
        (phi_x @ w_ih(top)) hoisted out of the scan over the whole
        sequence;
      * dec_l4 -> normalize -> phi_x_l1 folded (w_fold), mel produced by
        one hoisted dec_l4 matmul after the scan.

    The Bernoulli KL is always accumulated in f32 (with ``dtype=bfloat16``
    compute, log(1e-3-clamped) probabilities would lose ~2 decimal digits).
    Gradients flow through the same reassociated ops (autodiff of a
    linear re-grouping), so this is a training-throughput knob, not a new
    objective."""
    prec = cfg.precision
    B, T, _ = y.shape
    fp = _fuse_inference_params(params, cfg)
    gru = params["gru"]
    enc1 = params["enc"][0]
    prior1, prior2, prior3 = params["prior"]
    dec1 = params["dec"][0]
    h_dim = cfg.h_dim
    w_hsel_combo = jnp.concatenate(
        [enc1["w"][h_dim:], prior1["w"], dec1["w"][h_dim:]], axis=1)

    ynorm = _normalize(params, y.astype(cfg.dtype))
    phi_x = phi_x_apply(params, ynorm, prec)
    encx = jnp.matmul(phi_x, fp["w_enc1_x"], precision=prec)
    gi_teach_top = jnp.matmul(phi_x, fp["w_ih_top"], precision=prec)
    if cfg.var_bit:
        assert var_bitrate is not None
        mask = bit_mask_from_bitrate(var_bitrate, cfg.z_dim).astype(cfg.dtype)
    else:
        mask = jnp.ones((B, T, cfg.z_dim), cfg.dtype)

    k_sched, k_bin = jax.random.split(rng)
    use_gen = jax.random.uniform(k_sched, (T,)) < p_use_gen
    bin_noise = jax.random.uniform(k_bin, (T, B, cfg.z_dim), cfg.dtype)

    def _gates(gi, gh, h):
        r = jax.nn.sigmoid(gi[..., :h_dim] + gh[..., :h_dim])
        z = jax.nn.sigmoid(gi[..., h_dim : 2 * h_dim]
                           + gh[..., h_dim : 2 * h_dim])
        n = jnp.tanh(gi[..., 2 * h_dim :] + r * gh[..., 2 * h_dim :])
        return (1.0 - z) * n + z * h

    def step(carry, xs):
        h, h2 = carry
        encx_t, gi_top_t, mask_t, use_gen_t, noise_t = xs
        h_sel = jnp.where(use_gen_t, h2, h)

        combo = jnp.matmul(h_sel, w_hsel_combo, precision=prec)
        e1h = combo[..., :h_dim]
        p1h = combo[..., h_dim : 2 * h_dim]
        d1h = combo[..., 2 * h_dim :]

        a = jax.nn.elu(encx_t + e1h + fp["b_enc1"])
        a = jax.nn.elu(_dense(fp["enc2"], a, prec))
        enc_t = jax.nn.sigmoid(_dense(fp["enc3"], a, prec))

        p = jax.nn.elu(p1h + prior1["b"])
        p = jax.nn.elu(_dense(prior2, p, prec))
        prior_t = jax.nn.sigmoid(_dense(prior3, p, prec))

        if greedy:
            z_hard = jnp.round(enc_t)
        else:
            z_hard = jnp.round(noise_t - 0.5 + enc_t)
        z_t = enc_t + jax.lax.stop_gradient(z_hard - enc_t)
        z_t = _apply_bit_mask(z_t, mask_t)

        pz = z_t
        for lyr in fp["phi_z"]:
            pz = jax.nn.elu(_dense(lyr, pz, prec))
        pzc = jnp.matmul(pz, fp["w_pz_combo"], precision=prec)
        d1z, gi_bot = pzc[..., :h_dim], pzc[..., h_dim:]

        d = jax.nn.elu(d1z + d1h + fp["b_dec1"])
        d = jax.nn.elu(_dense(fp["dec2"], d, prec))
        a3 = jax.nn.elu(_dense(fp["dec3"], d, prec))
        u = jax.nn.elu(
            jnp.matmul(a3, fp["w_fold"], precision=prec) + fp["b_fold"])
        u = jax.nn.elu(_dense(fp["px2"], u, prec))
        xg = jax.nn.elu(_dense(fp["px3"], u, prec))
        gi_gen_top = jnp.matmul(xg, fp["w_ih_top"], precision=prec)

        # both GRU hidden projections in one stacked matmul
        gh_pair = jnp.matmul(
            jnp.concatenate([h, h2], axis=0), gru["w_hh"], precision=prec
        ) + fp["b_hh"]
        gh_h, gh_h2 = gh_pair[:B], gh_pair[B:]
        h_next = _gates(gi_top_t + gi_bot + fp["b_ih"], gh_h, h)
        h2_next = _gates(gi_gen_top + gi_bot + fp["b_ih"], gh_h2, h2)

        # Bernoulli KL(enc || prior), clamped — in f32 always
        c = 1e-3
        e32 = enc_t.astype(jnp.float32)
        p32 = prior_t.astype(jnp.float32)
        kld_elem = e32 * (
            jnp.log(jnp.clip(e32, min=c)) - jnp.log(jnp.clip(p32, min=c))
        ) + (1.0 - e32) * (
            jnp.log(jnp.clip(1.0 - e32, min=c))
            - jnp.log(jnp.clip(1.0 - p32, min=c))
        )
        kld_t = jnp.mean(jnp.sum(kld_elem * mask_t.astype(jnp.float32), -1))
        return (h_next, h2_next), (a3, kld_t)

    h0 = jnp.zeros((B, cfg.h_dim), cfg.dtype)
    xs = (
        jnp.swapaxes(encx, 0, 1),
        jnp.swapaxes(gi_teach_top, 0, 1),
        jnp.swapaxes(mask, 0, 1),
        use_gen,
        bin_noise,
    )
    _, (a3_seq, kld_seq) = jax.lax.scan(step, (h0, h0), xs,
                                        unroll=cfg.unroll)
    return _fused_dec_seq(fp, a3_seq, prec), jnp.mean(kld_seq)
