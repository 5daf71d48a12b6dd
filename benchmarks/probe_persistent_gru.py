"""Single-stream BVRNN decode floor: is a persistent Pallas GRU step faster
than the jitted XLA ``lax.scan`` when the weights stay VMEM-resident?

Motivation (VERDICT r2 #9): single-stream RTF is 102x f32 / 156x int8 —
per-frame weight traffic dominates at batch 1 (int8 weights give 1.5x, so
the scan is re-reading weights from HBM every frame).  A Pallas kernel that
loads the GRU weights into VMEM ONCE and loops over frames inside the
kernel pays the HBM read a single time; if the virtualized chip's Mosaic
matvec throughput is not pathologically low, that should beat the scan.

This probes the GRU step only (9.44 M params — the largest single
component of the 18.1 M-param decode path).  The input x_t is
concat(h_t, const) — the same feedback dependence the real decode cell has
(phi_x of the generated frame feeds the GRU, reference ``bvrnn.py:222-227``),
which also keeps the x-matmul from being hoisted out of the loop.  The
arithmetic and shapes are the real ones: GRU(2*h_dim -> h_dim), h_dim=1024
(configs/varbitrate.toml).

Variants:
  A. XLA lax.scan, f32 weights                   (the parity path)
  B. XLA lax.scan, f32-stored bf16-dot           (the serving default)
  C. XLA lax.scan, int8 weights, dequant in dot  (the int8 serving path)
  D. Pallas persistent loop, bf16 resident       (18.9 MB — may exceed VMEM)
  E. Pallas persistent loop, int8 resident, dequantized once into VMEM regs

Run on the real chip: ``python benchmarks/probe_persistent_gru.py``.
Numbers land in benchmarks/README.md; the decision (ship or document the
negative result) follows the measure-then-decide rule used for use_pallas.
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

H = 1024          # h_dim (configs/varbitrate.toml)
T = 512           # frames per timed call (~5.9 s of audio at 86 fps)
LANES = 8         # pad batch to one sublane tile so the MXU sees >=8 rows


def timeit(f, *a, n=10):
    r = f(*a)
    _ = float(jax.tree.leaves(r)[0].sum())  # sync (block_until_ready lies on axon)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    _ = float(jax.tree.leaves(r)[0].sum())
    return (time.perf_counter() - t0) / n


rng = np.random.default_rng(0)
w_ih = (rng.standard_normal((2 * H, 3 * H)) * 0.02).astype(np.float32)
w_hh = (rng.standard_normal((H, 3 * H)) * 0.02).astype(np.float32)
b_ih = (rng.standard_normal((1, 3 * H)) * 0.01).astype(np.float32)
b_hh = (rng.standard_normal((1, 3 * H)) * 0.01).astype(np.float32)
xc = (rng.standard_normal((LANES, H)) * 0.5).astype(np.float32)  # "phi_z" half
h0 = rng.standard_normal((LANES, H)).astype(np.float32)


def gru_math(gi, gh, h):
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


# ---- XLA scan baselines ------------------------------------------------------

def scan_fn(wi, wh, bi, bh, xconst, h0, dot_dtype):
    def step(h, _):
        x = jnp.concatenate([h, xconst], axis=-1)
        gi = jnp.dot(x.astype(dot_dtype), wi.astype(dot_dtype),
                     preferred_element_type=jnp.float32) + bi
        gh = jnp.dot(h.astype(dot_dtype), wh.astype(dot_dtype),
                     preferred_element_type=jnp.float32) + bh
        return gru_math(gi, gh, h), ()
    h, _ = jax.lax.scan(step, h0, None, length=T)
    return h


def quantize(w):
    s = np.abs(w).max(axis=0, keepdims=True) / 127.0
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s.astype(np.float32))


def scan_int8(wi_q, wi_s, wh_q, wh_s, bi, bh, xconst, h0):
    def step(h, _):
        x = jnp.concatenate([h, xconst], axis=-1)
        gi = jnp.dot(x.astype(jnp.bfloat16), wi_q.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) * wi_s + bi
        gh = jnp.dot(h.astype(jnp.bfloat16), wh_q.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) * wh_s + bh
        return gru_math(gi, gh, h), ()
    h, _ = jax.lax.scan(step, h0, None, length=T)
    return h


# ---- Pallas persistent loop --------------------------------------------------

def persistent_kernel(wi_ref, wh_ref, bi_ref, bh_ref, xc_ref, h0_ref, out_ref,
                      *, dequant):
    """Weights live in VMEM for the whole call; fori_loop over frames."""
    if dequant:  # int8-stored: widen once, outside the loop
        wi = wi_ref[:, :].astype(jnp.bfloat16)
        wh = wh_ref[:, :].astype(jnp.bfloat16)
    else:
        wi = wi_ref[:, :]
        wh = wh_ref[:, :]
    bi = bi_ref[:, :]
    bh = bh_ref[:, :]
    xconst = xc_ref[:, :].astype(jnp.bfloat16)

    def body(t, h):
        x = jnp.concatenate([h.astype(jnp.bfloat16), xconst], axis=-1)
        gi = jax.lax.dot(x, wi, preferred_element_type=jnp.float32) + bi
        gh = jax.lax.dot(h.astype(jnp.bfloat16), wh,
                         preferred_element_type=jnp.float32) + bh
        return gru_math(gi, gh, h)

    out_ref[:, :] = jax.lax.fori_loop(0, T, body, h0_ref[:, :])


def pallas_persistent(wi, wh, bi, bh, xc, h0, dequant=False):
    kern = functools.partial(persistent_kernel, dequant=dequant)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((LANES, H), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(wi, wh, bi, bh, xc, h0)


def main():
    print("device:", jax.devices()[0], flush=True)
    put = lambda *a: [jax.device_put(np.asarray(x)) for x in a]
    results = {}

    for name, dt in (("A_scan_f32", jnp.float32), ("B_scan_bf16dot", jnp.bfloat16)):
        args = put(w_ih, w_hh, b_ih, b_hh, xc[:1], h0[:1])
        f = jax.jit(functools.partial(scan_fn, dot_dtype=dt))
        t = timeit(f, *args)
        results[name] = t
        print(f"{name}: {t*1e3:8.2f} ms for {T} steps -> {T/t:8.0f} steps/s",
              flush=True)

    wi_q, wi_s = quantize(w_ih)
    wh_q, wh_s = quantize(w_hh)
    args = put(wi_q, wi_s, wh_q, wh_s, b_ih, b_hh, xc[:1], h0[:1])
    t = timeit(jax.jit(scan_int8), *args)
    results["C_scan_int8"] = t
    print(f"C_scan_int8: {t*1e3:8.2f} ms -> {T/t:8.0f} steps/s", flush=True)

    for name, dequant in (("D_pallas_bf16", False), ("E_pallas_int8", True)):
        try:
            if dequant:
                wi_p, wh_p = np.asarray(wi_q), np.asarray(wh_q)
            else:
                wi_p = w_ih.astype(jnp.bfloat16)
                wh_p = w_hh.astype(jnp.bfloat16)
            args = put(wi_p, wh_p, b_ih, b_hh, xc, h0)
            f = jax.jit(functools.partial(pallas_persistent, dequant=dequant))
            t = timeit(f, *args)
            results[name] = t
            print(f"{name}: {t*1e3:8.2f} ms -> {T/t:8.0f} steps/s", flush=True)
        except Exception as e:  # VMEM overflow is an expected, reportable outcome
            print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:300]})",
                  flush=True)

    base = results.get("B_scan_bf16dot")
    for k, v in results.items():
        print(f"{k}: {base/v:5.2f}x vs B", flush=True)


if __name__ == "__main__":
    main()
