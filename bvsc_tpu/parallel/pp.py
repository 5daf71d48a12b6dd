"""Pipeline parallelism: the two-stage codec pipeline over a ``pipe`` axis.

The reference's only parallelism is DDP (``third_party/BigVGAN/train.py:82-85``);
it has no model-partitioning story.  This module completes the bvsc_tpu
parallelism matrix (DP ``parallel/mesh.py``, TP ``parallel/tp.py``, SP
``parallel/sp.py``) with GPipe-style pipeline parallelism, instantiated on
the one natural stage boundary this model family has:

  stage 0  mel -> BVRNN ``encode_decode`` scan -> (codes, decoded mel)
  stage 1  decoded mel -> causal BigVGAN generator -> waveform

The resynthesis chain (reference ``bvrnn_codec_model.py:73-76``) is a
heterogeneous sequential composition — a latency-bound recurrent scan
followed by a throughput-bound conv stack — which is exactly the shape
pipeline parallelism wants: with microbatched streams flowing through, the
BVRNN scan of microbatch *t* overlaps the vocoder pass of microbatch
*t−1*, hiding the scan entirely behind the conv stack after a one-step
bubble.

Mechanics (idiomatic TPU, no point-to-point sends): every device runs the
same ``shard_map``-ed program; ``lax.axis_index('pipe')`` selects its stage
body via ``lax.switch``; the inter-stage activation (the decoded mel
microbatch, shape-preserved by the BVRNN) moves one hop right per step with
a single ``lax.ppermute`` over ICI.  A ``lax.scan`` over
``n_micro + n_stages − 1`` steps drives the schedule; stage 0's codes and
stage 1's waveforms accumulate into per-device output buffers that the
``out_specs`` stack along the pipe axis.

Honest scaling note (recorded in STATUS.md): with the measured phase split
(encode scan ≈ 32 ms vs vocoder ≈ 207 ms at B=128, `bench.py`), two-stage
PP tops out at ~1.15x per device pair, so DP remains the serving-throughput
choice and TP the single-stream-latency choice; PP's value here is
capability (pipelined heterogeneous stages, the pattern that generalizes to
deeper model families) and freeing stage-0 devices' HBM of vocoder weights
and activations.

Composability: a 2-D (data x pipe) mesh (``make_dp_pp_mesh``) shards every
microbatch's stream dim over ``data`` while each stage replicates across
it — pipelined == unpipelined exactly there too (``tests/test_pp.py``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from bvsc_tpu.config import VocoderConfig
from bvsc_tpu.models import bvrnn as jbvrnn
from bvsc_tpu.models import vocoder as jvoc
from bvsc_tpu.parallel._compat import shard_map

PIPE_AXIS = "pipe"
N_STAGES = 2


def make_pp_mesh(axis_name: str = PIPE_AXIS) -> Mesh:
    """A 2-device mesh, one device per pipeline stage."""
    devs = jax.devices()[:N_STAGES]
    if len(devs) < N_STAGES:
        raise ValueError(f"pipeline needs {N_STAGES} devices, have {len(devs)}")
    return Mesh(np.asarray(devs), (axis_name,))


def make_dp_pp_mesh(n_data: int, data_axis: str = "data",
                    pipe_axis: str = PIPE_AXIS) -> Mesh:
    """2-D mesh composing stream batching with the pipeline: each stage is
    replicated ``n_data`` ways and every microbatch's stream dim is sharded
    over ``data`` (cf. ``sp.make_dp_sp_mesh``)."""
    devs = np.asarray(jax.devices()[: n_data * N_STAGES]).reshape(
        n_data, N_STAGES
    )
    return Mesh(devs, (data_axis, pipe_axis))


def _recv_left(v: jax.Array, axis_name: str) -> jax.Array:
    """Each stage receives the previous stage's payload; stage 0 receives
    zeros (ppermute's no-source semantics)."""
    return lax.ppermute(
        v, axis_name, perm=[(i, i + 1) for i in range(N_STAGES - 1)]
    )


def pipeline_resynth(
    bvrnn_params,
    bcfg: jbvrnn.BVRNNConfig,
    voc_params,
    vcfg: VocoderConfig,
    mel_mb: jax.Array,
    bits_mb: jax.Array | None,
    mesh: Mesh,
    *,
    axis_name: str = PIPE_AXIS,
    precision=None,
    approx_snake: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Microbatched, pipelined resynthesis (codes + waveform).

    mel_mb:  (n_micro, M, T, x_dim) log-mel microbatches (model domain —
             already −10 dB-scaled/normalized as ``codec.py`` feeds them);
    bits_mb: (n_micro, M, T) bits/frame, or None for ``var_bit=False``;
    mesh:    a mesh with a size-2 ``axis_name`` axis (``make_pp_mesh``).

    Returns (codes (n_micro, M, T, z_dim), wav (n_micro, M, 1, T*up)),
    numerically identical to running each microbatch through
    ``encode_decode`` + ``generator_apply`` on one device
    (``tests/test_pp.py``).  Vocoder params must be inference-folded.
    """
    if mesh.shape[axis_name] != N_STAGES:
        raise ValueError(
            f"pipeline mesh axis '{axis_name}' must have size {N_STAGES}, "
            f"got {mesh.shape[axis_name]}"
        )
    n_micro, m_sz, t_frames, x_dim = mel_mb.shape
    if x_dim != bcfg.x_dim:
        raise ValueError(f"mel feature dim {x_dim} != BVRNNConfig.x_dim {bcfg.x_dim}")
    up = vcfg.total_upsample
    if bits_mb is None:
        if bcfg.var_bit:
            raise ValueError("bits_mb required for a var_bit BVRNN")
        bits_mb = jnp.zeros((n_micro, m_sz, t_frames), jnp.float32)

    # compose with stream batching on a 2-D (data x pipe) mesh: shard each
    # microbatch's stream dim over "data" when the mesh has that axis
    bdim = "data" if "data" in mesh.axis_names else None
    if bdim and m_sz % mesh.shape[bdim]:
        raise ValueError(
            f"microbatch streams {m_sz} not divisible by data axis "
            f"{mesh.shape[bdim]}"
        )
    m_sz = m_sz // (mesh.shape[bdim] if bdim else 1)  # per-shard streams

    def local(bparams, vparams, mel_all, bits_all):
        stage = lax.axis_index(axis_name)
        payload0 = jnp.zeros((m_sz, t_frames, x_dim), mel_all.dtype)
        z_buf = jnp.zeros((n_micro, m_sz, t_frames, bcfg.z_dim), jnp.float32)
        wav_buf = jnp.zeros((n_micro, m_sz, 1, t_frames * up), jnp.float32)

        def run_stage0(t):
            mb_idx = jnp.clip(t, 0, n_micro - 1)
            mb = lax.dynamic_index_in_dim(mel_all, mb_idx, 0, keepdims=False)
            bits = lax.dynamic_index_in_dim(bits_all, mb_idx, 0, keepdims=False)
            z, mel_dec, _ = jbvrnn.encode_decode(
                bparams, bcfg, mb, bits if bcfg.var_bit else None,
                jnp.zeros((m_sz, bcfg.h_dim)),
            )
            return (
                mel_dec.astype(mel_all.dtype),
                z.astype(jnp.float32),
                jnp.zeros((m_sz, 1, t_frames * up), jnp.float32),
            )

        def run_stage1(recv):
            wav = jvoc.generator_apply(
                vparams, vcfg, jnp.swapaxes(recv, 1, 2), t_frames * up,
                precision=precision, approx_snake=approx_snake,
            )
            return (
                jnp.zeros((m_sz, t_frames, x_dim), mel_all.dtype),
                jnp.zeros((m_sz, t_frames, bcfg.z_dim), jnp.float32),
                wav.astype(jnp.float32),
            )

        def step(carry, t):
            payload, z_buf, wav_buf = carry
            recv = _recv_left(payload, axis_name)
            payload_out, z_t, wav_t = lax.switch(
                stage,
                [lambda _: run_stage0(t), run_stage1],
                recv,
            )
            # stage s works on microbatch t - s; gate the buffer writes to
            # the schedule's valid window
            mb_idx = t - stage
            valid = (mb_idx >= 0) & (mb_idx < n_micro)
            slot = jnp.clip(mb_idx, 0, n_micro - 1)
            z_new = lax.dynamic_update_index_in_dim(z_buf, z_t, slot, 0)
            wav_new = lax.dynamic_update_index_in_dim(wav_buf, wav_t, slot, 0)
            z_buf = jnp.where(valid, z_new, z_buf)
            wav_buf = jnp.where(valid, wav_new, wav_buf)
            return (payload_out, z_buf, wav_buf), None

        n_steps = n_micro + N_STAGES - 1
        (_, z_buf, wav_buf), _ = lax.scan(
            step, (payload0, z_buf, wav_buf), jnp.arange(n_steps)
        )
        # stack both buffers along the pipe axis; the wrapper slices each
        # stage's real half out
        return z_buf, wav_buf

    in_spec = P(None, bdim)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), in_spec, in_spec),
        out_specs=(P(axis_name, bdim), P(axis_name, bdim)),
        check_rep=False,
    )
    z_stack, wav_stack = fn(bvrnn_params, voc_params, mel_mb, bits_mb)
    codes = z_stack[:n_micro]        # stage 0's buffer
    wav = wav_stack[n_micro:]        # stage 1's buffer
    return codes, wav
