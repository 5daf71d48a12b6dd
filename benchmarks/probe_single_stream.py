"""Where does single-stream (batch=1) time actually go?

probe_persistent_gru.py showed the GRU scan alone runs at ~83 k steps/s
with bf16 dots (the loop-invariant f32->bf16 weight cast is hoisted and
the 18.9 MB bf16 weights stay VMEM-resident) — ~960x realtime, nowhere
near the ~100-156x full-chain single-stream RTF.  This probe times the
REAL components at batch 1 on the real chip to find the floor:

  1. BVRNN decode scan (phi_z + dec + phi_x + GRU per frame, the real
     ``models.bvrnn.decode``), f32 ('highest') vs bf16 ('default')
  2. vocoder generator on T frames (``models.vocoder.generator_apply``)
  3. fused encode_decode scan (the resynthesis path)

Run: python benchmarks/probe_single_stream.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bvsc_tpu.config import CodecConfig
from bvsc_tpu.models import bvrnn as M
from bvsc_tpu.models import vocoder as V

T = 512  # frames (~5.9 s at 86 fps)


def timeit(f, *a, n=10):
    r = f(*a)
    _ = float(jax.tree.leaves(r)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    _ = float(jax.tree.leaves(r)[0].sum())
    return (time.perf_counter() - t0) / n


def main():
    print("device:", jax.devices()[0], flush=True)
    conf = CodecConfig.from_toml(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs/varbitrate.toml"))
    rng = np.random.default_rng(0)
    audio_s = T * 256 / 22050.0

    import jax.lax as lax
    PREC = {"highest": lax.Precision.HIGHEST, "default": lax.Precision.DEFAULT}
    for prec in ("highest", "default"):
        cfg = M.BVRNNConfig(x_dim=conf.num_mels, h_dim=conf.h_dim,
                            z_dim=conf.z_dim, precision=PREC[prec])
        params = jax.device_put(M.init_bvrnn_params(jax.random.key(0), cfg))
        z = jax.device_put(
            (rng.random((1, T, cfg.z_dim)) > 0.5).astype(np.float32))
        h = jax.device_put(np.zeros((1, cfg.h_dim), np.float32))
        f = jax.jit(lambda p, z, h, cfg=cfg: M.decode(p, cfg, z, h))
        t = timeit(f, params, z, h)
        print(f"bvrnn.decode[{prec}]: {t*1e3:8.2f} ms for {T} frames -> "
              f"{T/t:7.0f} frames/s = RTF {audio_s/t:6.1f}x", flush=True)

    vcfg = conf.vocoder_config
    vparams = jax.device_put(
        V.init_generator_params(jax.random.key(1), vcfg, weight_norm=False))
    mel = jax.device_put(rng.standard_normal((1, vcfg.num_mels, T)).astype(np.float32))
    f = jax.jit(lambda p, m: V.generator_apply(p, vcfg, m, T * 256))
    t = timeit(f, vparams, mel)
    print(f"vocoder[{T}fr]: {t*1e3:8.2f} ms -> RTF {audio_s/t:6.1f}x", flush=True)

    # fused resynthesis scan (encode+decode one-scan; serving fast path)
    cfg = M.BVRNNConfig(x_dim=conf.num_mels, h_dim=conf.h_dim,
                        z_dim=conf.z_dim, precision=PREC["default"])
    params = jax.device_put(M.init_bvrnn_params(jax.random.key(0), cfg))
    x = jax.device_put(rng.standard_normal((1, T, cfg.x_dim)).astype(np.float32))
    bits = jax.device_put(np.full((1, T), 38.0, np.float32))
    f = jax.jit(lambda p, x, b, h, cfg=cfg: M.encode_decode(p, cfg, x, b, h))
    h = jax.device_put(np.zeros((1, cfg.h_dim), np.float32))
    t = timeit(f, params, x, bits, h)
    print(f"bvrnn.encode_decode[default]: {t*1e3:8.2f} ms -> "
          f"RTF {audio_s/t:6.1f}x", flush=True)

    # r5: the fused cell (the codec's B<32 auto path) — the op-count-bound
    # single-stream fix (probe_scan_cell.py)
    import dataclasses
    fcfg = dataclasses.replace(cfg, fused_cell=True)
    f = jax.jit(lambda p, x, b, h, cfg=fcfg: M.encode_decode(p, cfg, x, b, h))
    t = timeit(f, params, x, bits, h)
    print(f"bvrnn.encode_decode[default, fused_cell]: {t*1e3:8.2f} ms -> "
          f"RTF {audio_s/t:6.1f}x", flush=True)
    f = jax.jit(lambda p, z, h, cfg=fcfg: M.decode(p, cfg, z, h))
    z = jax.device_put((rng.random((1, T, cfg.z_dim)) > 0.5).astype(np.float32))
    t = timeit(f, params, z, h)
    print(f"bvrnn.decode[default, fused_cell]: {t*1e3:8.2f} ms -> "
          f"RTF {audio_s/t:6.1f}x", flush=True)


if __name__ == "__main__":
    main()
