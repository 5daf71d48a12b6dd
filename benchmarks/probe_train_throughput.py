"""Training-throughput probe (VERDICT r3 #7): step time + achieved TFLOP/s.

Measures, on the real chip with dispatch-amortized timing:
  * BVRNN VAE trainer step at the REFERENCE geometry (batch 32 x 4 s,
    ``configs/config_varBitRate.toml:3-5``) — achieved TFLOP/s from the
    compiled program's own cost_analysis, vs the measured matmul ceiling,
  * vocoder GAN trainer step (D step + G step, split programs, remat on) at
    the geometry the docs/TRAINING.md lineages ran (batch 16 x 8192) —
    wall step time; FLOPs from a CPU-side cost_analysis of the monolithic
    d/g programs (arithmetic is backend-independent; pass --flops_cpu to
    emit them, the TPU pass reads the cached file),
  * remat on/off: the off-variant generator-grad program is compiled with a
    bounded timeout; round-1 measured it SIGKILLing the AOT helper — if it
    still does, that IS the delta (remat enables compilation at all).

Writes docs/artifacts/train_bench.json.

Run:  python benchmarks/probe_train_throughput.py --flops_cpu   (CPU, once)
      python benchmarks/probe_train_throughput.py               (real TPU)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "docs", "artifacts", "train_bench.json")
GAN_BATCH, GAN_SEG = 16, 8192
VAE_BATCH, VAE_SECONDS = 32, 4.0


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--flops_cpu", action="store_true",
                   help="CPU pass: compile the monolithic GAN d/g step "
                        "programs on CPU and record their cost_analysis "
                        "FLOPs (backend-independent arithmetic counts)")
    p.add_argument("--skip_remat_off", action="store_true")
    p.add_argument("--skip_variants", action="store_true",
                   help="skip the VAE-trainer knob variants + batch curve")
    p.add_argument("--skip_gan", action="store_true",
                   help="skip the GAN-trainer section")
    p.add_argument("--iters", type=int, default=10)
    return p.parse_args()


def _report(path=OUT):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _save(rep):
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(rep, f, indent=1, sort_keys=True)
    print("->", OUT)


def flops_cpu_pass():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")
    import jax.numpy as jnp

    from bvsc_tpu.config import CodecConfig
    from bvsc_tpu.train.vocoder_train import (
        GANTrainConfig, VocoderGANTrainer,
    )

    conf = CodecConfig.from_toml(os.path.join(REPO, "configs/varbitrate.toml"))
    tcfg = GANTrainConfig(batch_size=GAN_BATCH, segment_size=GAN_SEG)
    tr = VocoderGANTrainer(conf.vocoder_config, tcfg, seed=0)
    y = jnp.zeros((GAN_BATCH, GAN_SEG), jnp.float32)
    mel, mel_loss = tr._mels(y)
    T = GAN_SEG // tcfg.hop_size
    mel, mel_loss = mel[..., :T], mel_loss[..., :T]

    def ca_flops(jitted, *args):
        c = jitted.lower(*args).compile()
        d = c.cost_analysis()
        d = d[0] if isinstance(d, (list, tuple)) else d
        return float(d.get("flops", 0.0))

    y3 = y[:, None, :]  # (B, 1, T) — the layout step_on_audio feeds
    f_d = ca_flops(tr._d_step, tr.state, mel, y3)
    f_g = ca_flops(tr._g_step, tr.state, mel, y3, mel_loss)
    rep = _report()
    rep["gan_flops_per_step"] = {
        "d_step": f_d, "g_step": f_g, "total": f_d + f_g,
        "geometry": {"batch": GAN_BATCH, "segment": GAN_SEG},
        "note": "cost_analysis of the monolithic jitted d/g programs, "
                "compiled on CPU (arithmetic counts are backend-"
                "independent; the TPU runs the split-program set)",
    }
    _save(rep)
    print(f"GAN flops/step: D {f_d:.3e} + G {f_g:.3e} = {f_d + f_g:.3e}")


def main():
    args = parse_args()
    if args.flops_cpu:
        return flops_cpu_pass()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    from bench import measure_ceilings
    from bvsc_tpu.config import CodecConfig

    print("devices:", jax.devices(), flush=True)
    rep = _report()

    def sync(v):
        return float(jax.tree.leaves(v)[0].sum())

    def time_fn(fn, *a, iters=5):
        sync(fn(*a))
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(iters)]
        sync(outs[-1])
        return (time.perf_counter() - t0) / iters

    ceil = measure_ceilings(time_fn)
    rep["ceilings"] = ceil
    print("ceilings:", ceil, flush=True)

    conf = CodecConfig.from_toml(os.path.join(REPO, "configs/varbitrate.toml"))

    # --- BVRNN VAE trainer at reference geometry (batch 32 x 4 s) ----------
    from bvsc_tpu.train.bvrnn_train import BVRNNTrainer

    T = int(VAE_SECONDS * conf.fs) // conf.hopsize
    trainer = BVRNNTrainer(conf, seed=0)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (VAE_BATCH, T, conf.num_mels)).astype(np.float32))
    rng = jax.random.key(1)

    # step must be timed through the trainer's jitted program; donation means
    # we time sequential steps (state is consumed each call)
    sync(trainer.step(mel, rng)["loss"])  # warm/compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        m = trainer.step(mel, rng)
    sync(m["loss"])
    t_vae = (time.perf_counter() - t0) / args.iters

    comp = trainer._step.lower(trainer.state, mel, rng).compile()
    d = comp.cost_analysis()
    d = d[0] if isinstance(d, (list, tuple)) else d
    vae_flops = float(d.get("flops", 0.0))
    vae_tf = vae_flops / t_vae / 1e12
    # the trainer runs HIGHEST-precision f32 matmuls -> f32 ceiling binds
    vae_util = vae_tf / ceil["f32_matmul_tflops"]
    print(f"BVRNN trainer (B={VAE_BATCH}, {VAE_SECONDS}s): "
          f"{t_vae * 1e3:.0f} ms/step, {vae_tf:.2f} TFLOP/s "
          f"({vae_util:.2f}x f32 matmul ceiling)", flush=True)
    rep["bvrnn_trainer"] = {
        "geometry": {"batch": VAE_BATCH, "seconds": VAE_SECONDS, "frames": T},
        "step_ms": round(t_vae * 1e3, 1),
        "flops_per_step": vae_flops,
        "achieved_tflops": round(vae_tf, 2),
        "util_vs_f32_matmul": round(vae_util, 3),
    }
    assert 0.0 <= vae_util <= 1.0, vae_util
    del trainer
    _save(rep)

    # --- VAE trainer throughput knobs (VERDICT r4 #3) -----------------------
    # fused scan cell / bf16-compute-f32-master / scan unroll, plus a batch
    # -scaling curve at the best variant.  Utilization binds against the
    # matmul ceiling matching the variant's compute dtype.
    if not args.skip_variants:
        variants = {
            "fused": dict(fused_cell=True),
            "bf16": dict(compute_dtype="bf16"),
            "fused_bf16": dict(fused_cell=True, compute_dtype="bf16"),
            "fused_bf16_u4": dict(fused_cell=True, compute_dtype="bf16",
                                  unroll=4),
        }
        out = {}
        best_name, best_t = "baseline", t_vae
        for name, kw in variants.items():
            tr = BVRNNTrainer(conf, seed=0, **kw)
            sync(tr.step(mel, rng)["loss"])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                m = tr.step(mel, rng)
            sync(m["loss"])
            t_v = (time.perf_counter() - t0) / args.iters
            comp = tr._step.lower(tr.state, mel, rng).compile()
            d = comp.cost_analysis()
            d = d[0] if isinstance(d, (list, tuple)) else d
            fl = float(d.get("flops", 0.0))
            tf = fl / t_v / 1e12
            ck = ("bf16_matmul_tflops" if kw.get("compute_dtype") == "bf16"
                  else "f32_matmul_tflops")
            util = tf / ceil[ck]
            out[name] = {
                "step_ms": round(t_v * 1e3, 1),
                "achieved_tflops": round(tf, 2),
                "util_vs_matmul_ceiling": round(util, 3),
                "ceiling": ck,
                "speedup_vs_baseline": round(t_vae / t_v, 2),
            }
            print(f"BVRNN trainer [{name}]: {t_v * 1e3:.0f} ms/step "
                  f"({t_vae / t_v:.2f}x baseline), {tf:.2f} TFLOP/s "
                  f"({util:.2f}x {ck})", flush=True)
            assert 0.0 <= util <= 1.0, (name, util)
            if t_v < best_t:
                best_name, best_t = name, t_v
            del tr
            _save({**rep, "bvrnn_trainer_variants": out})
        rep["bvrnn_trainer_variants"] = out
        rep["bvrnn_trainer_variants_note"] = (
            "step_ms and speedup_vs_baseline are the load-bearing numbers; "
            "the tflops/util fields use XLA cost_analysis, which counts a "
            "while body ONCE (not x trip count), so scan-program flops are "
            "undercounted ~T-fold and differ across variants only by "
            "program structure (see bench.py encode_flops_analytic)")
        rep["bvrnn_trainer_best"] = {
            "variant": best_name, "step_ms": round(best_t * 1e3, 1),
            "speedup_vs_baseline": round(t_vae / best_t, 2)}

        # batch-scaling curve at the best variant (amortizes the per-step
        # sequential floor over more streams, like serving batching)
        curve = {}
        bkw = variants.get(best_name, {})
        for B in (32, 64, 128):
            tr = BVRNNTrainer(conf, seed=0, **bkw)
            mel_b = jnp.asarray(np.random.default_rng(0).standard_normal(
                (B, T, conf.num_mels)).astype(np.float32))
            sync(tr.step(mel_b, rng)["loss"])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                m = tr.step(mel_b, rng)
            sync(m["loss"])
            t_b = (time.perf_counter() - t0) / args.iters
            curve[str(B)] = {
                "step_ms": round(t_b * 1e3, 1),
                "audio_s_per_s": round(B * VAE_SECONDS / t_b, 1),
            }
            print(f"BVRNN trainer batch curve [{best_name}] B={B}: "
                  f"{t_b * 1e3:.0f} ms/step = "
                  f"{B * VAE_SECONDS / t_b:.1f} audio-s/s", flush=True)
            del tr
        rep["bvrnn_trainer_batch_curve"] = {
            "variant": best_name, **curve}
        _save(rep)

    # --- GAN trainer (split programs, remat on; docs/TRAINING.md geometry) --
    if args.skip_gan:
        return
    from bvsc_tpu.train.vocoder_train import (
        GANTrainConfig, VocoderGANTrainer,
    )

    y = jnp.asarray(np.random.default_rng(1).standard_normal(
        (GAN_BATCH, GAN_SEG)).astype(np.float32) * 0.1)

    def run_gan(remat: bool, label: str):
        tcfg = GANTrainConfig(batch_size=GAN_BATCH, segment_size=GAN_SEG,
                              remat=remat)
        tr = VocoderGANTrainer(conf.vocoder_config, tcfg, seed=0,
                               split_programs=True)
        m = tr.step_on_audio(y)  # compile (cached from the r3 lineage)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            m = tr.step_on_audio(y)
        # step_on_audio returns host floats — already synced
        t = (time.perf_counter() - t0) / args.iters
        print(f"GAN trainer {label} (B={GAN_BATCH} x {GAN_SEG}): "
              f"{t * 1e3:.0f} ms/step", flush=True)
        return t

    t_gan = run_gan(True, "remat=on")
    gan = {
        "geometry": {"batch": GAN_BATCH, "segment": GAN_SEG},
        "step_ms_remat_on": round(t_gan * 1e3, 1),
    }
    fl = rep.get("gan_flops_per_step", {}).get("total")
    if fl:
        tf = fl / t_gan / 1e12
        gan["achieved_tflops"] = round(tf, 2)
        gan["util_vs_f32_matmul"] = round(tf / ceil["f32_matmul_tflops"], 3)
        assert 0.0 <= gan["util_vs_f32_matmul"] <= 1.0
        print(f"  -> {tf:.2f} TFLOP/s "
              f"({gan['util_vs_f32_matmul']:.2f}x f32 matmul ceiling)",
              flush=True)
    if not args.skip_remat_off:
        try:
            t_off = run_gan(False, "remat=off")
            gan["step_ms_remat_off"] = round(t_off * 1e3, 1)
        except Exception as e:  # helper SIGKILL / OOM — that IS the delta
            gan["remat_off"] = f"compile failed: {type(e).__name__}: {e}"[:300]
            print("remat=off compile failed (documented):", e, flush=True)
    rep["gan_trainer"] = gan
    _save(rep)


if __name__ == "__main__":
    sys.exit(main())
