"""Fused scan cell vs standard cell, on the real chip (VERDICT r4 #2b/#3).

Times the full-size (h=1024, z=64, x=80) BVRNN encode_decode scan — the
sequential hot loop of serving encode AND the VAE trainer — across:

  * standard cell (15 dots + 3 concats + 2 GRU dots per step),
  * fused cell (13 dots, weight-concatenated, models/bvrnn.py),
  * each at lax.scan unroll 1/2/4 (separates per-iteration loop overhead
    from per-op sequencing overhead),
  * batch 128 (serving) and batch 1 (single-stream floor).

Run: python benchmarks/probe_scan_cell.py
"""

import dataclasses
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    from bvsc_tpu.models import bvrnn

    print("devices:", jax.devices(), flush=True)

    base = bvrnn.BVRNNConfig(x_dim=80, h_dim=1024, z_dim=64,
                             precision=jax.lax.Precision.DEFAULT)
    params = bvrnn.init_bvrnn_params(jax.random.key(0), base)
    T = 344  # ~4 s at 22.05 kHz / hop 256 (the bench geometry)

    def sync(v):
        return float(jax.tree.leaves(v)[0].sum())

    def time_fn(fn, *args, iters=5):
        sync(fn(*args))
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        sync(outs[-1])
        return (time.perf_counter() - t0) / iters

    rng = np.random.default_rng(0)
    for B in (128, 1):
        y = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))
        vb = jnp.full((B, T), 35.0)
        h0 = jnp.zeros((B, 1024))
        y, vb, h0 = jax.device_put((y, vb, h0))
        base_t = None
        for fused in (False, True):
            for unroll in (1, 2, 4):
                cfg = dataclasses.replace(base, fused_cell=fused,
                                          unroll=unroll)

                @jax.jit
                def run(p, y, vb, h0, cfg=cfg):
                    z, mel, hf = bvrnn.encode_decode(p, cfg, y, vb, h0)
                    return z.sum() + mel.sum()

                t = time_fn(run, params, y, vb, h0)
                us = t / T * 1e6
                if base_t is None:
                    base_t = t
                print(f"B={B:3d} fused={int(fused)} unroll={unroll}: "
                      f"{t * 1e3:8.2f} ms  {us:7.1f} us/step  "
                      f"{base_t / t:5.2f}x vs standard-u1", flush=True)


if __name__ == "__main__":
    sys.exit(main())
