"""Pallas TPU kernel: fused, space-to-depth-folded AMP residual blocks.

The vocoder's residual stacks (reference ``third_party/BigVGAN/models.py:
26-127`` AMPBlock1) run at 8-64 channels over very long time axes — on the
MXU an 8-channel conv uses <7% of the systolic array, and XLA's direct
lowering leaves the whole stack at ~10% MFU (measured: 191 ms of the 236 ms
B=128 generator).  This kernel makes the resblocks MXU-shaped:

  * activations are space-to-depth folded (``ops.fold.fold_time`` layout:
    row j*C + c holds channel c, sub-step j; fold factor s = 128//C), so
    every tensor is (128, T/s),
  * a causal dilated conv becomes a sum over block-shifts delta of DENSE
    (128, 128) x (128, L) matmuls: y[:, t] = sum_delta W_delta @ x[:, t-delta]
    — full MXU tiles, no im2col materialisation (the shifted views are
    lane-aligned VMEM slices),
  * one kernel fuses a WHOLE resblock (3 units of snake -> dilated conv ->
    snake -> conv -> residual): intermediates never touch HBM,
  * the left context (halo) is carried across the sequential grid in VMEM
    scratch, so each input block is read from HBM exactly once.

The folded-weight FLOP multiplier is s*(D+1)/k per conv (D = ceil((k-1)d/s))
— a 2-7x dense-FLOP increase that buys 128/C x better MXU utilisation and,
on paper, a whole-resblock reduction from ~13 HBM passes to 2.

MEASURED RESULT (axon-virtualized v5e, B=128): the kernel LOSES to XLA's
direct convs (~70 vs ~48 ms per residual stage; re-confirmed r4 under the
corrected dispatch-amortized methodology, benchmarks/README.md).  Micro-
probes put Mosaic dot throughput on this stack at 1.4-5.7 TFLOP/s with
~30 us per grid step, vs ~29 TFLOP/s f32 / ~140 TFLOP/s bf16 for XLA on
the MXU — the serial in-kernel dot chain never amortizes.  Kept as an
equivalence-tested opt-in
(``BVRNNCodecModel(use_pallas=True)``) for non-virtualized TPU runtimes.

Numerics: identical math to ``models.vocoder.generator_apply`` up to f32
summation order ('highest') or one bf16 MXU pass ('default', serving mode).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bvsc_tpu.config import VocoderConfig
from bvsc_tpu.ops.fold import fold_channel_param, fold_time, unfold_time

LANE = 128


# ---------------------------------------------------------------------------
# Weight folding: w (O, I, k) dilation d -> (D+1, O*s, I*s) block-shift stack
# ---------------------------------------------------------------------------


def fold_weight_blocks(w: np.ndarray, dilation: int, s: int) -> np.ndarray:
    """Causal conv weight (O, I, k) with dilation d -> stack (D+1, O*s, I*s)
    such that  y_f[:, t] = sum_delta  W[delta] @ x_f[:, t - delta]
    reproduces the causal conv in ``ops.fold.fold_time`` layout (row j*C+c).
    """
    w = np.asarray(w, np.float64)
    O, I, k = w.shape
    D = int(np.ceil((k - 1) * dilation / s)) if k > 1 else 0
    wb = np.zeros((D + 1, O * s, I * s), np.float64)
    for f in range(s):  # output sub-step
        for tap in range(k):
            e = f - (k - 1 - tap) * dilation  # input time offset from tb*s
            jj = e % s
            delta = (jj - e) // s  # blocks back in time, >= 0
            assert 0 <= delta <= D, (f, tap, e, delta, D)
            wb[delta, f * O : f * O + O, jj * I : jj * I + I] += w[:, :, tap]
    return wb


# ---------------------------------------------------------------------------
# Parameter preparation
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class ResblockKernel:
    """Folded weights for one resblock.  A pytree whose array leaves are the
    weights and whose STATIC aux data are the layout ints (fold factor ``s``,
    per-unit halo depths ``D1``/``D2``) — so instances can be passed straight
    through ``jax.jit`` without the ints becoming tracers."""

    def __init__(self, w1, b1, w2, b2, alpha, beta, *, s, D1, D2):
        self.w1, self.b1, self.w2, self.b2 = w1, b1, w2, b2
        self.alpha, self.beta = alpha, beta
        self.s, self.D1, self.D2 = s, tuple(D1), tuple(D2)

    def tree_flatten(self):
        return (
            (self.w1, self.b1, self.w2, self.b2, self.alpha, self.beta),
            (self.s, self.D1, self.D2),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        s, D1, D2 = aux
        return cls(*children, s=s, D1=D1, D2=D2)


def prepare_resblock_kernel_params(
    params: dict, cfg: VocoderConfig, dtype=jnp.float32
) -> list[ResblockKernel]:
    """Per-resblock folded weights for :func:`amp_resblock_folded`.

    ``params`` must be inference generator params (weight norm folded, plain
    'w').  Returns a list over resblocks (stage-major, kernel-size-minor,
    same order as ``params['resblocks']``) of :class:`ResblockKernel` with
    w1 tuple[(D+1, CS, CS)], b1 tuple[(CS, 1)], w2, b2, alpha/beta
    tuple[(CS, 1)] (2 per unit).
    """
    num_k = len(cfg.resblock_kernel_sizes)
    C0 = cfg.upsample_initial_channel
    out = []
    for i in range(len(cfg.upsample_rates)):
        ch = C0 // (2 ** (i + 1))
        s = max(1, LANE // ch)
        for j, (ksz, dils) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            block = params["resblocks"][i * num_k + j]
            e = {"w1": [], "b1": [], "w2": [], "b2": [],
                 "alpha": [], "beta": [], "D1": [], "D2": []}
            for jj, d in enumerate(dils):
                w1 = fold_weight_blocks(np.asarray(block["convs1"][jj]["w"]), d, s)
                w2 = fold_weight_blocks(np.asarray(block["convs2"][jj]["w"]), 1, s)
                e["w1"].append(jnp.asarray(w1, dtype))
                e["w2"].append(jnp.asarray(w2, dtype))
                e["D1"].append(w1.shape[0] - 1)
                e["D2"].append(w2.shape[0] - 1)
                e["b1"].append(jnp.asarray(
                    fold_channel_param(np.asarray(block["convs1"][jj]["b"]), s)[:, None], dtype))
                e["b2"].append(jnp.asarray(
                    fold_channel_param(np.asarray(block["convs2"][jj]["b"]), s)[:, None], dtype))
            for a in block["acts"]:
                e["alpha"].append(jnp.asarray(
                    fold_channel_param(np.asarray(a["alpha"]), s)[:, None], dtype))
                e["beta"].append(jnp.asarray(
                    fold_channel_param(np.asarray(a.get("beta", a["alpha"])), s)[:, None], dtype))
            out.append(ResblockKernel(
                tuple(e["w1"]), tuple(e["b1"]), tuple(e["w2"]), tuple(e["b2"]),
                tuple(e["alpha"]), tuple(e["beta"]),
                s=s, D1=e["D1"], D2=e["D2"],
            ))
    return out


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _snake_beta_log(x, alpha, beta):
    """SnakeBeta with log-scale params (reference ``activations.py:107-120``):
    x + 1/(exp(beta)+eps) * sin(exp(alpha) x)^2."""
    a = jnp.exp(alpha)
    b = jnp.exp(beta)
    sin = jnp.sin(a * x)
    return x + (1.0 / (b + 1e-9)) * (sin * sin)


def _amp_kernel(
    x_ref, *rest, H, Lb, D1, D2, n_units, compute_dtype, out_dtype
):
    """One grid step: (CS, Lb) block through the whole residual block.

    rest = [w1_0, b1_0, w2_0, b2_0, ..., a_0, bta_0, a_1, bta_1, ...,
            out_ref, halo_scratch]
    """
    n_w = 4 * n_units
    w_refs = rest[:n_w]
    act_refs = rest[n_w : n_w + 2 * 2 * n_units]
    out_ref = rest[-2]
    halo = rest[-1]

    i = pl.program_id(1)
    cur = x_ref[0]  # (CS, Lb)
    prev = jnp.where(i == 0, jnp.zeros_like(halo[:, :]), halo[:, :])
    x = jnp.concatenate([prev, cur], axis=1)  # (CS, H + Lb)
    # stash the halo for the next block BEFORE overwriting anything
    halo[:, :] = cur[:, Lb - H :]

    L = H + Lb

    # Sequence-start mask: the reference zero-pads EVERY conv's input, so at
    # t < 0 each intermediate is exactly zero — in block 0 the halo region
    # must be re-zeroed after each conv (bias/snake would otherwise leak a
    # nonzero pre-history into later units).
    col = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    start_mask = jnp.where((i == 0) & (col < H), 0.0, 1.0)

    # Precision pinned for f32 compute (parity mode / interpret on TPU): a
    # defaulted f32 dot would take bf16 MXU passes (~3e-4 error).  For bf16
    # operands Mosaic rejects an fp32 contract precision, so use DEFAULT
    # (the single MXU pass bf16 gets anyway).
    prec = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def fconv(xv, w_ref, b_ref, D):
        xc = xv.astype(compute_dtype)
        acc = jax.lax.dot(
            w_ref[0].astype(compute_dtype), xc,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        for delta in range(1, D + 1):
            shifted = jnp.concatenate(
                [jnp.zeros((xv.shape[0], delta), compute_dtype), xc[:, : L - delta]],
                axis=1,
            )
            acc += jax.lax.dot(
                w_ref[delta].astype(compute_dtype), shifted,
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        return (acc + b_ref[:, :].astype(jnp.float32)) * start_mask

    xb = x.astype(jnp.float32)
    for jj in range(n_units):
        w1, b1, w2, b2 = w_refs[4 * jj : 4 * jj + 4]
        a1, bt1, a2, bt2 = act_refs[4 * jj : 4 * jj + 4]
        xt = _snake_beta_log(xb, a1[:, :].astype(jnp.float32), bt1[:, :].astype(jnp.float32))
        xt = fconv(xt, w1, b1, D1[jj])
        xt = _snake_beta_log(xt, a2[:, :].astype(jnp.float32), bt2[:, :].astype(jnp.float32))
        xt = fconv(xt, w2, b2, D2[jj])
        xb = xt + xb
    out_ref[0] = xb[:, H:].astype(out_dtype)


def amp_resblock_folded(
    x_f: jax.Array,
    rb: ResblockKernel,
    *,
    block_len: int = 1024,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Apply one fused AMP residual block to folded activations.

    x_f: (B, CS, n) in ``fold_time`` layout; rb from
    :func:`prepare_resblock_kernel_params`.  n must be a multiple of
    ``block_len``.  Returns (B, CS, n).
    """
    B, CS, n = x_f.shape
    assert n % block_len == 0, (n, block_len)
    n_units = len(rb.w1)
    # halo >= total folded left-context of the unit chain, rounded to 8
    ctx = sum(rb.D1) + sum(rb.D2)
    H = max(8, int(math.ceil(ctx / 8)) * 8)
    if H > block_len:
        raise ValueError(f"halo {H} exceeds block_len {block_len}")

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(
            arr.shape, lambda b, i, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM
        )

    weights, act_params = [], []
    w_specs, a_specs = [], []
    for jj in range(n_units):
        for arr in (rb.w1[jj], rb.b1[jj], rb.w2[jj], rb.b2[jj]):
            weights.append(arr)
            w_specs.append(const_spec(arr))
    for jj in range(2 * n_units):
        for arr in (rb.alpha[jj], rb.beta[jj]):
            act_params.append(arr)
            a_specs.append(const_spec(arr))

    kernel = functools.partial(
        _amp_kernel,
        H=H,
        Lb=block_len,
        D1=tuple(rb.D1),
        D2=tuple(rb.D2),
        n_units=n_units,
        compute_dtype=compute_dtype,
        out_dtype=x_f.dtype,
    )
    grid = (B, n // block_len)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, CS, block_len), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            *w_specs,
            *a_specs,
        ],
        out_specs=pl.BlockSpec((1, CS, block_len), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, CS, n), x_f.dtype),
        scratch_shapes=[pltpu.VMEM((CS, H), x_f.dtype)],
        interpret=interpret,
    )(x_f, *weights, *act_params)


# ---------------------------------------------------------------------------
# Full-generator fast path
# ---------------------------------------------------------------------------


def resblock_stack_folded(
    x: jax.Array,
    kernel_blocks: list[ResblockKernel],
    cfg: VocoderConfig,
    stage: int,
    *,
    block_len: int = 1024,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """The per-stage '3 resblocks averaged' on unfolded (B, C, T) input;
    folds once, runs the fused kernels, unfolds once."""
    num_k = len(cfg.resblock_kernel_sizes)
    s = kernel_blocks[stage * num_k].s
    B, C, T = x.shape
    pad = (-T) % (s * block_len)
    if pad:  # causal: right zero-pad never changes earlier outputs
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    xf = fold_time(x, s)
    xs = None
    for j in range(num_k):
        out = amp_resblock_folded(
            xf, kernel_blocks[stage * num_k + j],
            block_len=block_len, compute_dtype=compute_dtype,
            interpret=interpret,
        )
        xs = out if xs is None else xs + out
    y = unfold_time(xs / num_k, s)
    return y[..., :T] if pad else y


def pallas_stack_supported(cfg: VocoderConfig) -> bool:
    """The fused kernel covers the shipped config family: causal,
    non-antialiased, snakebeta+logscale."""
    return (
        not any(cfg.layers_sym)
        and not any(cfg.layers_antialias)
        and not cfg.antialias_post
        and cfg.activation == "snakebeta"
        and cfg.snake_logscale
    )
