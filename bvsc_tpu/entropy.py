"""Prior-adaptive entropy coding of BVRNN codes (wire-format v2).

The BVRNN trains its Bernoulli-KL against a learned prior P(z_t | h_t)
(reference ``bvrnn.py:148-156``) — i.e. the rate the paper reports is the
*cross-entropy* of the codes under that prior, yet the reference transmits
the codes raw at k bits/frame.  This layer closes that gap: it range-codes
the transmitted first-k bits against the prior with a binary rANS coder
(``ops/rans.py`` + native ``native/rans.c``), giving a smaller payload at
bit-identical reconstruction.  The decoded audio path is unchanged (the
fast device scan still consumes the exact same codes).

Determinism contract: the prior depends on the hidden state h_t, which
both ends advance from the decoded bits alone (the closed-loop state-sync
invariant, reference ``bvrnn.py:204-206`` == ``:226-227``).  Encoder and
decoder therefore compute probabilities with the SAME two jitted CPU
programs (:func:`_prior_impl`, :func:`_advance_impl`) on the SAME machine
semantics — identical compiled programs on identical inputs give
bit-identical probabilities, which is all rANS needs.  The pass runs on
the host CPU backend (committed-device placement) so payloads do not
depend on which accelerator produced the codes.

Throughput note: the per-frame host loop exists because P(z_t) is
computable only after z_{<t} — this is an offline/file-format path
(~real-time on CPU), not the serving path, which keeps raw first-k packing
(``ops/bitpack.py``) at zero model cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .models import bvrnn as bvrnn_mod
from .ops import rans


def _prior_impl(params, h):
    """P(bit==1) for the next frame's bits: (1, h) -> (1, z)."""
    return bvrnn_mod.prior_apply(params, h, jax.lax.Precision.HIGHEST)


def _advance_impl(params, h, z_t):
    """One closed-loop state advance from the (midpoint-filled) frame codes
    — the decode-scan step body (reference ``bvrnn.py:222-227``)."""
    prec = jax.lax.Precision.HIGHEST
    phi_z_t = bvrnn_mod.phi_z_apply(params, z_t, prec)
    dec_t = bvrnn_mod.dec_apply(
        params, jnp.concatenate([phi_z_t, h], -1), prec
    )
    phi_x_gen = bvrnn_mod.phi_x_apply(
        params, bvrnn_mod._normalize(params, dec_t), prec
    )
    return bvrnn_mod.gru_step(
        params["gru"], jnp.concatenate([phi_x_gen, phi_z_t], -1), h, prec
    )


def _as_bits_per_frame(bits_per_frame, frames: int, z_dim: int) -> np.ndarray:
    # ceil, NOT truncate: the model's bit-priority mask transmits every bit
    # index strictly below the (possibly fractional) allocation
    # (bvrnn.bit_mask_from_bitrate uses ``>``), so 34.8 bits/frame means 35
    # transmitted bits — an int() cast would silently drop the top bit and
    # desync the closed-loop hidden states
    k = np.ceil(np.asarray(bits_per_frame, np.float64)).astype(np.int64)
    if k.ndim == 0:
        k = np.full(frames, int(k))
    if k.shape != (frames,):
        raise ValueError(f"bits_per_frame shape {k.shape} != ({frames},)")
    return np.clip(k, 0, z_dim)


class PriorEntropyCoder:
    """Entropy encode/decode BVRNN codes against the model's own prior.

    params/cfg: the float BVRNN parameters and config (int8-quantised
    serving params are rejected — the entropy model must be the float
    prior both ends can reproduce exactly).
    """

    def __init__(self, params, cfg: "bvrnn_mod.BVRNNConfig"):
        if "prior" not in params:
            raise ValueError("params has no 'prior' MLP — not BVRNN params")
        # inspect the WEIGHTS specifically: quantized layers store
        # w = {'q': int8, 'scale': f32} (ops/quant.py) whose float 'scale'
        # and the always-float bias would pass a first-leaf dtype check
        for layer in params["prior"]:
            w = layer["w"] if isinstance(layer, dict) else layer
            if isinstance(w, dict) or not np.issubdtype(
                np.asarray(w).dtype, np.floating
            ):
                raise ValueError(
                    "entropy coding needs float BVRNN params (got quantised); "
                    "load the codec with quantize=None"
                )
        self.cfg = cfg
        cpu = jax.devices("cpu")[0]
        self._params = jax.device_put(
            jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params), cpu
        )
        self._h0 = jax.device_put(jnp.zeros((1, cfg.h_dim), jnp.float32), cpu)
        self._cpu = cpu
        self._prior = jax.jit(_prior_impl)
        self._advance = jax.jit(_advance_impl)

    # -- shared per-frame machinery -------------------------------------
    def _frame_probs(self, h) -> np.ndarray:
        return np.asarray(self._prior(self._params, h))[0]

    def _frame_advance(self, h, z_row: np.ndarray):
        z_t = jax.device_put(
            jnp.asarray(z_row[None, :], jnp.float32), self._cpu
        )
        return self._advance(self._params, h, z_t)

    @staticmethod
    def _fill_midpoint(bits: np.ndarray, k: int, z_dim: int) -> np.ndarray:
        row = np.full(z_dim, 0.5, np.float32)
        row[:k] = bits[:k]
        return row

    # -- public API ------------------------------------------------------
    def encode(self, codes: np.ndarray, bits_per_frame) -> bytes:
        """codes: (frames, z_dim) {0,1} with 0.5 in masked positions (one
        stream's output of ``BVRNNCodecModel.encode``); returns the rANS
        payload for the first-k bits of every frame."""
        codes = np.asarray(codes, np.float32)
        frames, z_dim = codes.shape
        ks = _as_bits_per_frame(bits_per_frame, frames, z_dim)
        hard = (codes > 0.5 + 1e-6).astype(np.uint8)
        h = self._h0
        flat_bits, flat_probs = [], []
        for t in range(frames):
            k = int(ks[t])
            if k:  # zero-bit (DTX) frames need no prior dispatch
                probs = self._frame_probs(h)
                flat_bits.append(hard[t, :k])
                flat_probs.append(rans.quantize_probs(probs[:k]))
            h = self._frame_advance(h, self._fill_midpoint(hard[t], k, z_dim))
        if not flat_bits:
            return b""
        return rans.rans_encode(
            np.concatenate(flat_bits), np.concatenate(flat_probs)
        )

    def decode(self, payload: bytes, bits_per_frame, frames: int) -> np.ndarray:
        """Inverse of :meth:`encode`: returns (frames, z_dim) float32 codes
        with 0.5 midpoints in untransmitted positions — the exact input
        ``BVRNNCodecModel.decode`` expects.  Raises ``ValueError`` on a
        truncated or corrupt payload (rANS state-unwind check)."""
        z_dim = self.cfg.z_dim
        ks = _as_bits_per_frame(bits_per_frame, frames, z_dim)
        out = np.full((frames, z_dim), 0.5, np.float32)
        if int(ks.sum()) == 0:
            if payload:
                raise ValueError("nonempty payload for zero transmitted bits")
            return out
        dec = rans.RansDecoder(payload)
        h = self._h0
        for t in range(frames):
            k = int(ks[t])
            if k:  # zero-bit (DTX) frames need no prior dispatch
                probs = self._frame_probs(h)
                bits = dec.decode_bits(rans.quantize_probs(probs[:k]))
                out[t, :k] = bits
            h = self._frame_advance(h, out[t])
        dec.finish()
        return out

    def measure(self, codes: np.ndarray, bits_per_frame) -> dict:
        """Payload-size diagnostics: raw first-k bytes vs entropy-coded."""
        codes = np.asarray(codes, np.float32)
        frames, z_dim = codes.shape
        ks = _as_bits_per_frame(bits_per_frame, frames, z_dim)
        payload = self.encode(codes, bits_per_frame)
        raw_bits = int(ks.sum())
        coded_bits = 8 * len(payload)
        return {
            "frames": frames,
            "raw_bytes": (raw_bits + 7) // 8,
            "coded_bytes": len(payload),
            "saving_pct": 100.0 * (1.0 - coded_bits / raw_bits) if raw_bits else 0.0,
        }
