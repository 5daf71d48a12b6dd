"""Full-size code-parity gate: bvsc_tpu vs the torch reference on real speech.

The framework's north-star claim (BASELINE.json) is that its codes match the
reference codec's on the full MUSHRA stimulus set — at the FULL model size
(h_dim=1024, z_dim=64, 80 mels; 23.45 M params), not the toy dims the unit
parity tests use.  This script measures that on every stimulus with
IDENTICAL weights on both sides, from two sources: a torch-initialised
random model converted jax-ward via ``bvsc_tpu.convert``, and the shipped
trained demo checkpoint converted torch-ward via
``bvrnn_params_to_torch_sd``.  Oracle = the reference imported in place
(reference ``bvrnn.py:163-209`` encode, ``bvrnn_codec_model.py:44-62``
mel + bps->bits rounding).  Writes ``docs/artifacts/parity_fullsize.json``.

Three measurements, because full-size parity has a subtlety the toy tests
don't: the TRAINED closed-loop encoder is chaotic.  Its state update
amplifies float rounding noise by ~15 %/frame, so over hundreds of frames
ANY two non-bitwise-identical implementations diverge — the torch reference
itself agrees with itself only ~97-99.9 % when run in f32 vs f64.  Hence:

1. **Free-running agreement** per stimulus, per codec mode (parity / fast /
   int8 / int8_mixed), with the torch f32-vs-f64 SELF-agreement recorded as
   the noise floor of the comparison.  Asserted == 100 % for the random-init
   weights (contractive dynamics — no chaos) and >= the self-agreement noise
   floor (aggregate, small slack) for trained weights.
2. **Per-step state-synchronized gate**: every frame of every stimulus is
   encoded from the reference's own f64 hidden-state trajectory, so chaos
   cannot amplify differences; this isolates "do both implementations
   compute the same per-frame function?".  Asserted bit-exact in f64 (any
   flip must sit within 1e-9 of the 0.5 rounding threshold); f32 parity
   mode is recorded with its flip margins.
3. **Rounding margins** |sigmoid(enc)-0.5| of the reference trajectory —
   context for how close to the knife edge the trained code bits live.

Usage (CPU is fine — both sides are seconds per stimulus):
  python scripts/parity_fullsize.py --platform cpu
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _cli_common

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=os.path.join(REPO, "configs/varbitrate.toml"))
    p.add_argument("--wavs", default=os.path.join(REPO, "data_local/wavs"),
                   help="22050 Hz stimulus wavs (scripts/prepare_demo_data.py)")
    p.add_argument("--bitrate", type=float, default=3000.0)
    p.add_argument("--checkpoint",
                   # the SHIPPED demo pair's BVRNN (chkpts/README.md) — the
                   # artifact must attest the weights users actually load
                   # (VERDICT r4 #5)
                   default=os.path.join(
                       REPO, "chkpts/bvsc_bvrnn_demo_augfull_step1800_f16.npz"),
                   help="trained BVRNN npz for the trained-weights pass "
                        "('' to skip)")
    p.add_argument("--stimuli", type=int, default=0,
                   help="limit to the first N stimuli (0 = all)")
    p.add_argument("--skip_quant", action="store_true",
                   help="skip the int8/int8_mixed agreement passes")
    p.add_argument("--out", default=os.path.join(REPO, "docs/artifacts/parity_fullsize.json"))
    _cli_common.add_platform_arg(p)
    return p.parse_args(argv)


def reference_mel_torch(conf, x: np.ndarray):
    """The reference mel pipeline in torch (reference ``meldataset.py:60-95``
    via ``bvrnn_codec_model.py:44-49``: −10 dB scaling, reflect pad, STFT,
    Slaney filterbank, log-clamp) -> (B, T, M) for BVRNN consumption."""
    import torch

    from bvsc_tpu.codec import SCALING
    from bvsc_tpu.ops.mel import slaney_mel_filterbank

    y = torch.from_numpy(x * SCALING).float()
    pl = conf.mel_pad_left
    pr = conf.winsize - pl - conf.hopsize
    y = torch.nn.functional.pad(y.unsqueeze(1), (pl, pr), mode="reflect").squeeze(1)
    stft = torch.stft(
        y, conf.winsize, hop_length=conf.hopsize, win_length=conf.winsize,
        window=torch.hann_window(conf.winsize), center=False, onesided=True,
        return_complex=True,
    )
    spec = torch.view_as_real(stft)
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    fb = torch.from_numpy(slaney_mel_filterbank(
        conf.fs, conf.winsize, conf.num_mels, conf.fmin, conf.fmax))
    return torch.log(torch.clamp(fb @ spec, min=1e-5)).permute(0, 2, 1)


def reference_encode(ref_bvrnn, conf, mel, bits: float):
    """Reference free-running codes + per-frame hidden states.

    Returns (codes (T, z), h_seq (T, h)) where ``h_seq[t]`` is the state
    BEFORE frame t (reference ``bvrnn.py:205`` appends pre-update)."""
    import torch

    bits_t = bits * torch.ones(mel.shape[:2], dtype=mel.dtype)
    h = torch.zeros(1, mel.shape[0], conf.h_dim, dtype=mel.dtype)
    with torch.no_grad():
        codes, h_seq = ref_bvrnn.encode(mel, bits_t, h)
    return codes.numpy()[0], h_seq.numpy()[0]


def reference_margins(ref_bvrnn, mel, h_seq, bits: float, z_dim: int):
    """Per-frame enc sigmoid margins |enc_t - 0.5| on the reference's own
    state trajectory, batched over frames (one torch call)."""
    import torch

    with torch.no_grad():
        y = (mel[0] - ref_bvrnn.mean_mel[None, :]) / ref_bvrnn.std_mel[None, :]
        phi_x = ref_bvrnn.phi_x(y)  # (T, h)
        enc = ref_bvrnn.enc(torch.cat([phi_x, torch.from_numpy(h_seq)], 1))
    k = int(bits)
    margins = (enc.numpy() - 0.5)[:, :k]  # active bits only
    codes_sync = np.round(enc.numpy() + 0.0)
    codes_sync[:, k:] = 0.5
    return margins, codes_sync


def jax_per_step_codes(params, bcfg, mel_np, h_seq, bits: float):
    """Encode every frame from the reference's state trajectory: one batched
    (B=T, T=1) encode — chaos cannot amplify differences across frames."""
    import jax.numpy as jnp

    from bvsc_tpu.models import bvrnn as bvrnn_mod

    T = mel_np.shape[0]
    y = jnp.asarray(mel_np[:, None, :], bcfg.dtype)  # (T, 1, M)
    h0 = jnp.asarray(h_seq, bcfg.dtype)  # (T, h)
    bits_a = jnp.full((T, 1), bits, bcfg.dtype)
    codes, _ = bvrnn_mod.encode_with_state(params, bcfg, y, bits_a, h0)
    return np.asarray(codes[:, 0, :], np.float64)


def build_models(args, conf):
    """(ref_bvrnn, jax_params, weights_label) for each weight source."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from torch_ref import import_reference_bvrnn

    from bvsc_tpu.convert import bvrnn_params_from_torch, bvrnn_params_to_torch_sd

    ref_mod = import_reference_bvrnn()
    pairs = []

    torch.manual_seed(0)
    mean_std = [np.zeros(conf.num_mels), np.ones(conf.num_mels)]
    ref_rand = ref_mod.BVRNN(conf.num_mels, conf.h_dim, conf.z_dim,
                             mean_std, conf.log_sigma_init, conf.var_bit)
    ref_rand.eval()
    pairs.append((ref_rand, bvrnn_params_from_torch(ref_rand.state_dict()),
                  "random_init"))

    if args.checkpoint:
        import jax.numpy as jnp

        from bvsc_tpu.codec import _load_bvrnn_checkpoint

        params = _load_bvrnn_checkpoint(args.checkpoint, jnp.float32)
        sd = bvrnn_params_to_torch_sd(params)
        ref_ckpt = ref_mod.BVRNN(conf.num_mels, conf.h_dim, conf.z_dim,
                                 mean_std, conf.log_sigma_init, conf.var_bit)
        ref_ckpt.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                                  for k, v in sd.items()})
        ref_ckpt.eval()
        pairs.append((ref_ckpt, params, os.path.basename(args.checkpoint)))
    return pairs


def main(argv=None):
    args = parse_args(argv)
    _cli_common.setup_runtime(args)

    import jax

    jax.config.update("jax_enable_x64", True)  # per-step f64 gate
    import jax.numpy as jnp
    import torch

    from bvsc_tpu.codec import BVRNNCodecModel
    from bvsc_tpu.config import CodecConfig
    from bvsc_tpu.data.audio import load_wav
    from bvsc_tpu.models import bvrnn as bvrnn_mod

    conf = CodecConfig.from_toml(args.config)
    wavs = sorted(glob.glob(os.path.join(args.wavs, "*.wav")))
    if args.stimuli:
        wavs = wavs[: args.stimuli]
    if not wavs:
        raise SystemExit(f"no wavs under {args.wavs} "
                         "(run scripts/prepare_demo_data.py)")
    bits = float(np.round(args.bitrate * conf.hopsize / conf.fs))

    report = {
        "config": os.path.relpath(args.config, REPO),
        "h_dim": conf.h_dim, "z_dim": conf.z_dim, "num_mels": conf.num_mels,
        "bitrate_bps": args.bitrate, "bits_per_frame": bits,
        "weight_sources": {},
    }
    failures = []
    for ref_bvrnn, params, label in build_models(args, conf):
        trained = label != "random_init"
        modes = {"parity": dict(precision="highest"),
                 "fast": dict(precision="default")}
        if trained and not args.skip_quant:
            modes["int8"] = dict(precision="default", quantize="int8")
            modes["int8_mixed"] = dict(precision="default",
                                       quantize="int8_mixed")
        codecs = {m: BVRNNCodecModel(config=conf, bvrnn_params=params,
                                     vocoder_params={}, **kw)
                  for m, kw in modes.items()}
        params64 = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
        bcfg64 = bvrnn_mod.BVRNNConfig(
            x_dim=conf.num_mels, h_dim=conf.h_dim, z_dim=conf.z_dim,
            var_bit=conf.var_bit, dtype=jnp.float64,
            precision=jax.lax.Precision.HIGHEST)
        bcfg32 = bvrnn_mod.BVRNNConfig(
            x_dim=conf.num_mels, h_dim=conf.h_dim, z_dim=conf.z_dim,
            var_bit=conf.var_bit, dtype=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        # per-step state-synchronized passes for the quantized modes: encode
        # every frame from the reference's f64 trajectory with the QUANTIZED
        # weights — the chaos-free measurement of the quantization flip rate
        # (free-running agreement is chaos-dominated on trained weights, so
        # it cannot rank int8 vs int8_mixed; this can).
        step_quant: dict[str, tuple] = {}
        if trained and not args.skip_quant:
            from bvsc_tpu.ops.quant import (
                quantize_bvrnn_params,
                quantize_bvrnn_params_mixed,
            )

            bcfg_fast = bvrnn_mod.BVRNNConfig(
                x_dim=conf.num_mels, h_dim=conf.h_dim, z_dim=conf.z_dim,
                var_bit=conf.var_bit, dtype=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            step_quant = {
                "step_int8": (quantize_bvrnn_params(params), bcfg_fast),
                "step_int8_mixed": (quantize_bvrnn_params_mixed(params),
                                    bcfg_fast),
            }

        per_stim = {}
        totals: dict = {m: [0, 0] for m in modes}
        totals.update({m: [0, 0] for m in step_quant})
        totals.update(self_floor=[0, 0], step64=[0, 0], step32=[0, 0])
        worst_step64_margin = np.inf  # margin of the worst f64 per-step flip
        step32_flip_margins = []
        min_margin = np.inf
        for path in wavs:
            name = os.path.splitext(os.path.basename(path))[0]
            x = np.asarray(load_wav(path, conf.fs)[0], np.float32)[None, :]
            mel32 = reference_mel_torch(conf, x)
            mel64 = mel32.double()

            # free-running torch oracle (f32 = the reference's own precision)
            codes_ref, _ = reference_encode(ref_bvrnn, conf, mel32, bits)
            # f64 self-control + the state trajectory for the per-step gate
            ref_bvrnn.double()
            codes_ref64, h_seq64 = reference_encode(ref_bvrnn, conf, mel64, bits)
            margins, codes_sync = reference_margins(
                ref_bvrnn, mel64, h_seq64, bits, conf.z_dim)
            ref_bvrnn.float()
            min_margin = min(min_margin, float(np.abs(margins).min()))

            row = {"frames": int(codes_ref.shape[0]),
                   "min_abs_margin": float(np.abs(margins).min()),
                   "torch_f32_vs_f64_self": float(
                       (codes_ref == codes_ref64).mean())}
            totals["self_floor"][0] += int((codes_ref == codes_ref64).sum())
            totals["self_floor"][1] += int(codes_ref.size)

            # 1) free-running agreement, per codec mode
            for m, codec in codecs.items():
                codes = np.asarray(codec.encode(x, args.bitrate))
                totals[m][0] += int((codes == codes_ref).sum())
                totals[m][1] += int(codes_ref.size)
                row[m + "_agreement"] = float((codes == codes_ref).mean())

            # 2) per-step state-synchronized gate (f64 asserted, f32 recorded)
            mel_np = mel64.numpy()[0]
            for tag, p, c in (("step64", params64, bcfg64),
                              ("step32", params, bcfg32)):
                codes_step = jax_per_step_codes(p, c, mel_np, h_seq64, bits)
                eq = codes_step == codes_sync
                totals[tag][0] += int(eq.sum())
                totals[tag][1] += int(eq.size)
                row[tag + "_agreement"] = float(eq.mean())
                flip_t, flip_z = np.nonzero(~eq)
                active = flip_z < int(bits)
                if tag == "step64" and active.any():
                    worst_step64_margin = min(
                        worst_step64_margin,
                        float(np.abs(margins[flip_t[active],
                                             flip_z[active]]).min()))
                if tag == "step32" and active.any():
                    step32_flip_margins.extend(
                        np.abs(margins[flip_t[active], flip_z[active]]).tolist())

            # per-step flip rate of the quantized weight sets
            for tag, (p_q, c_q) in step_quant.items():
                codes_step = jax_per_step_codes(p_q, c_q, mel_np, h_seq64, bits)
                eq = codes_step == codes_sync
                totals[tag][0] += int(eq.sum())
                totals[tag][1] += int(eq.size)
                row[tag + "_agreement"] = float(eq.mean())

            per_stim[name] = row
            print(f"[{label}] {name}: frames={row['frames']} " +
                  " ".join(f"{m}={row[m + '_agreement'] * 100:.3f}%"
                           for m in modes) +
                  f" self_floor={row['torch_f32_vs_f64_self'] * 100:.3f}%"
                  f" step64={row['step64_agreement'] * 100:.4f}%"
                  f" step32={row['step32_agreement'] * 100:.4f}%", flush=True)

        agg = {k: v[0] / v[1] for k, v in totals.items()}
        src = {
            "stimuli": per_stim,
            "aggregate": agg,
            "total_code_bits": totals["parity"][1],
            "min_abs_margin": min_margin,
            "step32_flip_margins_max": (max(step32_flip_margins)
                                        if step32_flip_margins else 0.0),
            "step32_flip_count": len(step32_flip_margins),
        }
        report["weight_sources"][label] = src
        print(f"[{label}] aggregate over {len(wavs)} stimuli "
              f"({src['total_code_bits']} code bits): " +
              " ".join(f"{k}={v * 100:.4f}%" for k, v in agg.items()),
              flush=True)

        # --- gates ----------------------------------------------------------
        if agg["step64"] < 1.0 and worst_step64_margin > 1e-9:
            failures.append(
                f"{label}: f64 per-step codes differ at margin "
                f"{worst_step64_margin:.2e} (> 1e-9) — implementations do "
                "not compute the same per-frame function")
        if not trained and agg["parity"] < 1.0:
            # random-init dynamics are (weakly) contractive, so flips are
            # only legitimate on stimuli that drive some enc output into
            # genuine f32 rounding ambiguity (|sigmoid - 0.5| < 1e-4)
            if agg["parity"] < 0.9999:
                failures.append(
                    f"{label}: free-running parity-mode agreement "
                    f"{agg['parity']:.6f} < 99.99%")
            for name, r in per_stim.items():
                if r["parity_agreement"] < 1.0 and r["min_abs_margin"] > 1e-4:
                    failures.append(
                        f"{label}/{name}: parity flip without a knife-edge "
                        f"margin (min |margin| {r['min_abs_margin']:.2e})")
        if trained and agg["parity"] < agg["self_floor"] - 0.01:
            failures.append(
                f"{label}: cross-implementation agreement {agg['parity']:.4f}"
                f" below the torch f32-vs-f64 self-agreement noise floor "
                f"{agg['self_floor']:.4f} - 1%")
        # quantized-mode floors (VERDICT r3 #4, re-derived r5): the binding
        # gates are the CHAOS-FREE per-step flip rates below — the
        # self_floor bounds only float-reassociation divergence, so it
        # cannot bound quantized free-running agreement on a CONTRACTIVE
        # checkpoint: the shipped augfull ckpt self-agrees 100.000%
        # (f32 vs f64), while int8's real ~0.08%/step quantization flips
        # necessarily accumulate a few % of free-running mismatch however
        # well-behaved the dynamics (each flip perturbs the state for its
        # re-convergence window).  Free-running agreement for quantized
        # modes is therefore gated at an absolute sanity floor and
        # recorded; the per-step rates carry the precision claim.
        for m in ("int8", "int8_mixed"):
            if m in agg and agg[m] < 0.90:
                failures.append(
                    f"{label}: {m} free-running agreement {agg[m]:.4f} < 90% "
                    "sanity floor")
        if "step_int8" in agg and "step_int8_mixed" in agg:
            if agg["step_int8_mixed"] < agg["step_int8"] - 1e-4:
                failures.append(
                    f"{label}: int8_mixed per-step agreement "
                    f"{agg['step_int8_mixed']:.5f} WORSE than plain int8 "
                    f"{agg['step_int8']:.5f} — mixed mode is broken")
            for m in ("step_int8", "step_int8_mixed"):
                if agg[m] < 0.99:
                    failures.append(
                        f"{label}: {m} per-step agreement {agg[m]:.4f} < 99% "
                        "— quantization flips far beyond serving tolerance")
        if step32_flip_margins and max(step32_flip_margins) > 1e-3:
            failures.append(
                f"{label}: a per-step f32 flip at margin "
                f"{max(step32_flip_margins):.2e} (> 1e-3) — beyond f32 "
                "rounding noise")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    for msg in failures:
        print("FAIL:", msg)
    if not failures:
        print(f"PASS: full-size per-step function parity exact (f64); "
              f"free-running agreement at/above the float-chaos noise "
              f"floor; artifact -> {args.out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
