"""Benchmark: full codec chain (encode + decode + vocode) at 3 kbps.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_sec_per_sec", "vs_baseline": N}

value   = aggregate audio-seconds coded per wall-second per chip at the
          best point of the measured batch-scaling curve (B=64..512; the
          BASELINE.json 128-stream config is kept as ``value_128streams``)
          through the full chain: mel -> BVRNN encode @3 kbps ->
          BVRNN decode -> causal BigVGAN-tiny vocoder, in the production
          serving configuration (single-pass bf16 MXU matmuls + polynomial
          snake + bf16 vocoder segment — the precision='default' stack; the
          fused one-program __call__, whose encode scan emits the decoded
          mel via the closed-loop state-sync invariant — no second decode
          scan).
vs_baseline = value / 100 — the reference publishes no RTF figure ("real
          time" claim only, reference README.md:19); the north-star target
          from BASELINE.json is >100x real time per chip.

Methodology notes:
  * inputs are pre-placed on device and completion is synced by scalar
    readback (on this platform ``block_until_ready`` returns early, and the
    host<->device tunnel would otherwise dominate the measurement);
    end-to-end numbers including host transfers go to stderr,
  * a persistent XLA compilation cache keeps warm-start costs out,
  * fast-mode codes are cross-checked against reference-parity (HIGHEST
    precision) codes on real speech and the agreement rate is reported
    (NOTE: all agreement figures here are vs this same implementation's
    parity mode on the bench's random-init model; trained-checkpoint
    agreement vs the torch reference — including the chaos-free per-step
    int8 flip rates — is gated separately in
    docs/artifacts/parity_fullsize.json),
  * roofline utilizations use MEASURED denominators: XLA cost_analysis
    FLOPs / bytes-accessed of the executed programs vs ceilings measured
    on this chip in the same run; every utilization is asserted into
    [0, 1] (VERDICT r3 #2).
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_speech(seconds: float, n_streams: int) -> np.ndarray:
    """Real MUSHRA speech tiled to shape (falls back to noise)."""
    try:
        import scipy.signal
        from scipy.io import wavfile

        fs, data = wavfile.read(
            "/root/reference/mushra_results_dataset/audio/stim_01/ref.wav"
        )
        speech = data[:, 0].astype(np.float64) / 32768.0
        speech = scipy.signal.resample_poly(speech, 22050, fs)
        speech = speech / np.max(np.abs(speech))
    except Exception as e:  # pragma: no cover
        log("falling back to noise input:", e)
        speech = np.random.default_rng(0).standard_normal(22050 * 4) * 0.1
    n = int(seconds * 22050)
    reps = int(np.ceil(n / speech.shape[0]))
    speech = np.tile(speech, reps)[:n]
    rng = np.random.default_rng(1)
    batch = np.tile(speech[None, :], (n_streams, 1))
    batch += 1e-4 * rng.standard_normal(batch.shape)
    return batch.astype(np.float32)


def measure_ceilings(time_fn, samples=None):
    """Self-calibrated chip ceilings, measured at bench time (the honest
    denominators for the roofline-utilization fields; stale constants from
    benchmarks/README.md would silently rot if the virtualized chip
    changes).  Returns {bf16_matmul_tflops, f32_matmul_tflops,
    stream_f32_gbps, stream_bf16_gbps, stream_copy_gbps, hbm_read_gbps}.

    Each probe chains ``reps`` dependent iterations of its kernel inside ONE
    XLA program (``lax.fori_loop``): a single 4096-matmul or 256 MB tanh is
    only a few ms of device work, so the per-dispatch tunnel RTT in this
    environment (~5-10 ms, worse under host load) would dominate a
    one-kernel-per-dispatch measurement and understate every ceiling several
    fold — which then inflates the phase "utilizations" above 1 and makes
    the roofline fields unauditable (observed: a loaded-host bench run
    measured the stream ceiling at 54 GB/s vs the true ~475 GB/s).

    Each probe additionally takes the BEST of several timing attempts: a
    ceiling is a capability bound, and under additive tunnel/host noise
    the max-rate (min-time) attempt is its consistent estimator — the
    mean is biased low by RTT weather (observed run-to-run spread
    330-479 GB/s on the stream probe), which would understate
    denominators and spuriously push phase utilizations above 1.

    ``samples``: optional dict; per-try times for the f32/bf16 stream
    probes are appended under 'stream_f32_times'/'stream_bf16_times' so
    the caller can report element rates WITH their min/max spread
    (VERDICT r4 #4 — the bf16-vs-f32 element-rate claim must be auditable
    from the artifact, not from one collapsed best-of number)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = 4096
    reps = 32

    def tmin(fn, *args, tries=3, record=None):
        ts = [time_fn(fn, *args, iters=3) for _ in range(tries)]
        if record is not None and samples is not None:
            samples.setdefault(record, []).extend(ts)
        return min(ts)

    def chain_matmul(precision):
        inv = jnp.float32(1.0 / n)  # keeps the chained product at ~1.0

        def fn(a, b):
            def body(_, c):
                return jnp.matmul(a, c, precision=precision) * inv.astype(a.dtype)

            return lax.fori_loop(0, reps, body, b).sum()

        return jax.jit(fn)

    a16 = jnp.ones((n, n), jnp.bfloat16)
    t = tmin(chain_matmul(None), a16, a16)
    bf16_tflops = reps * 2 * n ** 3 / t / 1e12
    a32 = jnp.ones((n, n), jnp.float32)
    t = tmin(chain_matmul(jax.lax.Precision.HIGHEST), a32, a32)
    f32_tflops = reps * 2 * n ** 3 / t / 1e12

    big = jnp.ones((64 * 1024 * 1024,), jnp.float32)  # 256 MB: HBM-resident

    @jax.jit
    def chain_tanh(x):
        return lax.fori_loop(0, reps, lambda _, v: jnp.tanh(v), x).sum()

    t = tmin(chain_tanh, big, record="stream_f32_times")
    stream_gbps = reps * 2 * big.size * 4 / t / 1e9  # read + write per rep

    @jax.jit
    def chain_axpy(x):
        # near-pure DMA: one fused multiply-add per element per rep — the
        # cheapest loop-variant read+write kernel XLA will not hoist.  This
        # is the binding ceiling for elementwise-bound phases (tanh pays
        # transcendental cost on top, so it slightly understates the DMA
        # rate a conv program can reach).
        def body(i, v):
            return v * 0.9999999 + 1e-7

        return lax.fori_loop(0, reps, body, x).sum()

    t = tmin(chain_axpy, big)
    copy_gbps = reps * 2 * big.size * 4 / t / 1e9

    big16 = jnp.ones((128 * 1024 * 1024,), jnp.bfloat16)  # 256 MB
    t = tmin(chain_tanh, big16, record="stream_bf16_times")
    stream16_gbps = reps * 2 * big16.size * 2 / t / 1e9

    @jax.jit
    def chain_read(x):
        # the (i+1) scale keeps the reduction loop-variant so XLA cannot
        # hoist a single x.sum() out of the loop
        def body(i, acc):
            return acc + (x * (1.0 + i)).sum()

        return lax.fori_loop(0, reps, body, jnp.float32(0.0))

    t = tmin(chain_read, big)  # pure-read HBM rate
    read_gbps = reps * big.size * 4 / t / 1e9
    if samples is not None:
        samples["stream_f32_elems_per_rep"] = big.size
        samples["stream_bf16_elems_per_rep"] = big16.size
        samples["stream_reps"] = reps
    return {"bf16_matmul_tflops": round(bf16_tflops, 2),
            "f32_matmul_tflops": round(f32_tflops, 2),
            "stream_f32_gbps": round(stream_gbps, 1),
            "stream_bf16_gbps": round(stream16_gbps, 1),
            "stream_copy_gbps": round(copy_gbps, 1),
            "hbm_read_gbps": round(read_gbps, 1)}


def encode_flops_analytic(codec, B, T, fused=False):
    """EXACT FLOP count of the encode program (2*M*N*K per matmul — matmul
    arithmetic is unambiguous, unlike fusion-dependent byte counts).

    Needed because XLA ``cost_analysis`` counts a ``while`` body ONCE, not
    times the trip count, so every scan program's flops are undercounted
    ~T-fold — that is where BENCH_r04's encode utilization of 0.10-0.2x
    came from (VERDICT r4 #2: the scan actually runs at ~0.45x of the bf16
    matmul ceiling; verified against a direct scan-only timing in
    benchmarks/probe_scan_cell.py).

    Counted: per-step scan matmuls x T (standard cell: enc 3 + phi_z 3 +
    dec 4 + phi_x_gen 3 + GRU 2, with their concat input widths; fused
    cell: the 13 recombined dots) + the hoisted phi_x stack + the
    matmul-DFT mel frontend.  Elementwise flops are omitted (<1%)."""
    h, z, x = codec.conf.h_dim, codec.conf.z_dim, codec.conf.num_mels
    if fused:
        step = ((5 * h) * h          # w_h_combo
                + h * h + h * z      # enc l2, l3
                + z * h + h * h + h * h   # phi_z
                + h * (4 * h)        # w_pz_combo
                + h * h + h * h      # dec l2, l3
                + h * h              # w_fold
                + h * h + h * h      # px2, px3
                + h * (3 * h))       # gi_top
        seq = x * h + h * h + h * h + h * h + h * x  # phi_x + encx + dec4
    else:
        step = ((2 * h) * h + h * h + h * z          # enc
                + z * h + h * h + h * h              # phi_z
                + (2 * h) * h + h * h + h * h + h * x  # dec
                + x * h + h * h + h * h              # phi_x_gen
                + (2 * h) * (3 * h) + h * (3 * h))   # gru
        seq = x * h + h * h + h * h                  # hoisted phi_x
    n_fft = codec.conf.winsize
    dft = n_fft * (2 * (n_fft // 2 + 1)) + (n_fft // 2 + 1) * x
    return 2.0 * B * T * (step + seq + dft)


def build_packet_chain(codec, fc, n_pkt, x_host):
    """Build the bench's N-packet single-dispatch scan (the device-latency
    probe) for ``codec``/``FusedPacketCodec fc``.  Module-level so
    tests/test_streaming.py can construct+trace it on CPU with a
    ``precision='default'`` codec — the exact configuration whose missing
    ``approx_snake``/``voc_dtype`` knobs dtype-crashed the r4 bench
    (VERDICT r4 #1).  Returns (jitted_fn, args)."""
    import jax
    import jax.numpy as jnp

    from bvsc_tpu.streaming import _fused_packet_step

    chunks = jnp.asarray(
        x_host[0, : n_pkt * fc.hop].reshape(n_pkt, 1, fc.hop))
    bcfg, vcfg = codec.bvrnn_cfg, codec.conf.vocoder_config
    frontend = codec.frontend

    @jax.jit
    def packet_chain(params, voc_params, state, chunks, bits):
        def body(st, chunk):
            # the serving knobs MUST thread here exactly as
            # FusedPacketCodec._step passes them: with precision='default'
            # the initial voc state is bf16 (voc_state_dtype), and omitting
            # voc_dtype makes the step compute f32 — a scan-carry dtype
            # mismatch that silently cost BENCH_r04 its stream_device_ms_*
            # fields (VERDICT r4 #1)
            st, codes, wav = _fused_packet_step(
                params, voc_params, st, chunk, bits,
                bcfg=bcfg, vcfg=vcfg, frontend=frontend,
                approx_snake=codec.approx_snake,
                voc_dtype=codec.voc_dtype)
            return st, codes.sum() + wav.sum()
        _, acc = jax.lax.scan(body, state, chunks)
        return acc.sum()

    args = (codec.bvrnn_params, codec.vocoder_params, fc.state,
            chunks, fc.bits)
    return packet_chain, args


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from bvsc_tpu.codec import BVRNNCodecModel

    log("devices:", jax.devices())
    extra = {}  # roofline/latency fields merged into the final JSON line
    # Every probe guarded by a try/except appends its name here on failure;
    # a clean run ships "skipped_probes": [] so a missing field can never
    # drop out of the artifact silently again (VERDICT r4 #1: the r4 run
    # lost stream_device_ms_* to a swallowed exception and still exited 0).
    skipped = []
    extra["skipped_probes"] = skipped

    seconds = 4.0
    n_streams = 128
    bitrate = 3000

    codec = BVRNNCodecModel(precision="default")  # production serving mode
    x_host = load_speech(seconds, n_streams)
    L = x_host.shape[1]
    x = jax.device_put(jnp.asarray(x_host))

    def sync(v):
        # reduce on device, read back ONE scalar (full-array readback would
        # bill the 30 MB/s tunnel to the kernel being measured)
        return float(jax.tree.leaves(v)[0].sum())

    def full_chain(wav):
        # the public __call__: ONE fused program (mel -> encode_decode scan
        # -> vocoder); the encode scan's closed-loop state sync already
        # computes the decoded mel, so no separate decode scan runs
        return codec(wav, bitrate)

    def full_chain_2prog(wav):
        codes = codec.encode(wav, bitrate)
        return codec.decode(codes, L)

    def time_fn(fn, *args, iters=5):
        sync(fn(*args))  # warmup/compile
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        sync(outs[-1])
        return (time.perf_counter() - t0) / iters

    def t_best(fn, *args, tries=3):
        # min over independent timing rounds: throughput numbers must not
        # inherit one contended stretch of the shared host/tunnel (an r5
        # run measured the first B=128 chain at 146 ms vs 72 ms steady
        # state, which flipped the int8-headline comparison)
        return min(time_fn(fn, *args) for _ in range(tries))

    # --- batched serving config: 128 concurrent streams ---------------------
    t_batched = t_best(full_chain, x)
    audio_sec = n_streams * seconds
    throughput = audio_sec / t_batched
    log(f"batched {n_streams} streams x {seconds}s: {t_batched * 1e3:.1f} ms "
        f"-> {throughput:.1f} audio-sec/sec/chip (compute, fast mode)")

    # --- roofline ceilings + utilization (VERDICT r2 #4) ---------------------
    # ceilings are re-measured every run on this chip; utilization compares
    # each phase's analytic FLOPs/bytes against the binding ceiling, making
    # "fast as this chip allows" auditable rather than asserted.
    # Two full ceiling runs ALWAYS, elementwise max (advisor r4: the
    # conditional re-roll made the published ceilings a non-uniform
    # estimator across runs — best-of-3 on clean runs, max-of-6 on >1
    # violations); `ceilings_runs` records how many runs fed the max.
    ceil_samples = {}
    try:
        ceil = measure_ceilings(time_fn, samples=ceil_samples)
        ceil2 = measure_ceilings(time_fn, samples=ceil_samples)
        ceil = {k: max(ceil[k], ceil2[k]) for k in ceil}
        extra["ceilings_runs"] = 2
        log(f"measured ceilings (max of 2 runs): bf16 matmul "
            f"{ceil['bf16_matmul_tflops']} TFLOP/s, f32 matmul "
            f"{ceil['f32_matmul_tflops']} TFLOP/s, f32 streaming "
            f"{ceil['stream_f32_gbps']} GB/s, HBM read "
            f"{ceil['hbm_read_gbps']} GB/s")
        extra["ceilings"] = ceil

        # element-rate reconciliation (VERDICT r4 #4): report BOTH stream
        # element rates with min/max spread over every timing try, so the
        # "bf16 gives X elements/s vs f32" design note is auditable from
        # this artifact alone (r4 shipped 346 GB/s in benchmarks/README.md
        # vs 486 GB/s in BENCH_r04.json with no reconciliation).
        reps_s = ceil_samples["stream_reps"]
        for name, elems in (("f32", ceil_samples["stream_f32_elems_per_rep"]),
                            ("bf16", ceil_samples["stream_bf16_elems_per_rep"])):
            rates = [reps_s * elems / t / 1e9
                     for t in ceil_samples[f"stream_{name}_times"]]
            extra[f"stream_{name}_gelems"] = round(max(rates), 1)
            extra[f"stream_{name}_gelems_spread"] = [
                round(min(rates), 1), round(max(rates), 1)]
        log(f"stream element rates: f32 {extra['stream_f32_gelems']} Gelem/s "
            f"(spread {extra['stream_f32_gelems_spread']}), bf16 "
            f"{extra['stream_bf16_gelems']} Gelem/s "
            f"(spread {extra['stream_bf16_gelems_spread']}) -> bf16/f32 = "
            f"{extra['stream_bf16_gelems'] / extra['stream_f32_gelems']:.2f}x")
    except Exception as e:  # pragma: no cover
        log("ceiling measurement skipped:", e)
        skipped.append("ceilings")
        ceil = None

    # --- batch-scaling curve (VERDICT r3 #1a) --------------------------------
    # throughput saturates at B>=128 on this chip (the scan's per-step cost
    # is linear in B once the MXU tiles fill; the vocoder is HBM-bound at
    # any batch) — the curve makes that measured rather than asserted, and
    # the headline uses the best point.
    best_B, best_thr = n_streams, throughput
    curve = {str(n_streams): round(throughput, 1)}
    for B in (64, 256, 512):
        try:
            xb = jax.device_put(jnp.asarray(load_speech(seconds, B)))
            t_b = t_best(full_chain, xb, tries=2)
            thr_b = B * seconds / t_b
            curve[str(B)] = round(thr_b, 1)
            log(f"batch curve B={B}: {t_b * 1e3:.1f} ms -> {thr_b:.1f} audio-s/s")
            if thr_b > best_thr:
                best_B, best_thr = B, thr_b
            del xb
        except Exception as e:  # pragma: no cover
            log(f"batch curve B={B} skipped:", e)
            skipped.append(f"batch_curve_B{B}")
    extra.update(batch_curve=curve, n_streams_best=best_B)

    # --- phase breakdown (two-program composition, for comparison) ----------
    t_2prog = time_fn(full_chain_2prog, x)
    t_enc = time_fn(lambda w: codec.encode(w, bitrate), x)
    codes = codec.encode(x, bitrate)
    t_dec = time_fn(lambda c: codec.decode(c, L), codes)
    log(f"two-program encode->decode: {t_2prog * 1e3:.1f} ms "
        f"({audio_sec / t_2prog:.1f} audio-sec/sec); "
        f"phases: encode {t_enc * 1e3:.1f} ms, decode+vocode {t_dec * 1e3:.1f} ms")

    # --- per-phase roofline utilization (MEASURED denominators) --------------
    # numerators: wall time (scalar-readback synced); denominators: the
    # compiled programs' own XLA cost_analysis FLOPs / bytes-accessed
    # (post-fusion — what the executable actually moves), vs ceilings
    # measured on this chip this run.  Every utilization is asserted into
    # [0, 1]: a >1 reading means the methodology broke, and the bench FAILS
    # rather than shipping an unauditable number (VERDICT r3 #2; the r3
    # artifact carried vocoder_roofline_util=2.214 from analytic bytes).
    if ceil is not None:
        t_frames = int(np.asarray(codes).shape[1])

        def xla_cost(lowered_compiled) -> tuple[float, float]:
            d = lowered_compiled.cost_analysis()
            d = d[0] if isinstance(d, (list, tuple)) else d
            return float(d.get("flops", 0.0)), float(d.get("bytes accessed", 0.0))

        def util_of(flops, bytes_, t) -> tuple[float, float, float, str]:
            tf = flops / t / 1e12
            gb = bytes_ / t / 1e9
            u_mxu = tf / ceil["bf16_matmul_tflops"]
            u_hbm = gb / ceil["stream_copy_gbps"]
            return tf, gb, max(u_mxu, u_hbm), (
                "MXU" if u_mxu >= u_hbm else "HBM")

        # encode program (mel frontend + fused encode scan).  FLOPs are
        # EXACT analytic matmul counts, not cost_analysis: XLA counts a
        # while body once, undercounting scan programs ~T-fold — the r4
        # artifact's encode_roofline_util 0.10-0.2x was that undercount,
        # not unharvested headroom (encode_flops_analytic docstring).
        from bvsc_tpu.models import bvrnn as bvrnn_mod

        Lp = codec._pad_length(L)
        Tp = codec.frontend.num_frames(Lp)
        enc_fused = bvrnn_mod._use_fused(codec.bvrnn_cfg, n_streams)
        enc_fl = encode_flops_analytic(codec, n_streams, Tp, fused=enc_fused)
        enc_tf = enc_fl / t_enc / 1e12
        enc_util = enc_tf / ceil["bf16_matmul_tflops"]
        enc_bind = "MXU"  # weights are VMEM-resident at this batch; the
        # binding resource for the scan is matmul issue rate
        log(f"encode phase: {enc_tf:.2f} TFLOP/s (exact matmul arithmetic, "
            f"{'fused' if enc_fused else 'standard'} cell) -> "
            f"{enc_util:.2f}x of the bf16 matmul ceiling")

        # standalone generator program (the vocoder phase, timed directly —
        # not by subtracting a separately-dispatched mel-only program, whose
        # own dispatch overhead would understate it; advisor r3)
        from bvsc_tpu.models import vocoder as voc_mod

        mel = codec.decode_to_mel(codes)
        vcfg = codec.conf.vocoder_config
        vp16 = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16), codec.vocoder_params)
        mel16 = mel.astype(jnp.bfloat16)
        gen_len = t_frames * codec.conf.hopsize

        def gen_fn(vpar, m):
            return voc_mod.generator_apply(
                vpar, vcfg, m, gen_len, precision=codec.precision,
                approx_snake=codec.approx_snake)

        gen_jit = jax.jit(gen_fn)
        t_voc = time_fn(gen_jit, vp16, mel16)
        voc_fl, voc_by = xla_cost(gen_jit.lower(vp16, mel16).compile())
        voc_tf, voc_gb, voc_util, voc_bind = util_of(voc_fl, voc_by, t_voc)
        log(f"vocoder phase (standalone, {t_voc * 1e3:.1f} ms): "
            f"{voc_tf:.2f} TFLOP/s, {voc_gb:.1f} GB/s (XLA-measured) -> "
            f"{voc_util:.2f}x of the {voc_bind} ceiling")

        # decode-scan-only remainder (cross-check: enc + scan + voc ~ chain)
        t_mel_only = time_fn(lambda c: codec.decode_to_mel(c), codes)
        log(f"cross-check: decode-to-mel program {t_mel_only * 1e3:.1f} ms; "
            f"encode {t_enc * 1e3:.1f} + vocoder {t_voc * 1e3:.1f} vs fused "
            f"chain {t_batched * 1e3:.1f} ms")

        if enc_util > 1.0 or voc_util > 1.0:
            # A phase above its ceiling means the ceiling probe hit RTT
            # weather this run (the phase numerators are downward-biased —
            # their timings include per-dispatch RTT — so the denominator
            # is the suspect).  Re-measure once and take the elementwise
            # max (ceilings are capability bounds); if a phase still
            # exceeds the refreshed ceiling, that is a genuine methodology
            # violation and the bench fails below.
            log("a phase utilization exceeded 1 — re-measuring ceilings")
            try:
                ceil3 = measure_ceilings(time_fn)
                ceil = {k: max(ceil[k], ceil3[k]) for k in ceil}
                extra["ceilings_runs"] = extra.get("ceilings_runs", 1) + 1
            except Exception as e:  # pragma: no cover
                # advisor r4: a transient tunnel error here must fall
                # through to the [0,1] assertion on the original ceilings,
                # not crash the bench with a raw traceback
                log("ceiling re-measure failed, keeping originals:", e)
            enc_tf = enc_fl / t_enc / 1e12
            enc_util = enc_tf / ceil["bf16_matmul_tflops"]
            voc_tf, voc_gb, voc_util, voc_bind = util_of(voc_fl, voc_by, t_voc)
            extra["ceilings"] = ceil
        # Utilization gate: a phase at its ceiling measures 1.00 +- noise
        # (numerator and denominator are two independent timings of the
        # same resource), so a hair over 1 is measurement noise, not a
        # methodology violation — the r4-style hard [0,1] gate made the
        # bench fail on a 1.005 reading of a genuinely ceiling-bound
        # vocoder.  >2% over still fails loudly (that WAS the r3 2.2x
        # analytic-bytes failure mode).
        noise_cap = 1.02
        over = []
        for name, u in (("encode", enc_util), ("vocoder", voc_util)):
            if not (0.0 <= u <= noise_cap):
                raise AssertionError(
                    f"{name} roofline utilization {u:.3f} outside "
                    f"[0, {noise_cap}] — measured-denominator methodology "
                    "violated")
            if u > 1.0:
                over.append(name)
        if over:
            extra["roofline_util_note"] = (
                f"{'/'.join(over)} utilization >1 by <2% — within "
                "measurement noise of a ceiling-bound phase")
        extra.update(
            encode_ms=round(t_enc * 1e3, 1),
            encode_tflops=round(enc_tf, 2),
            encode_roofline_util=round(enc_util, 3),
            encode_binding_ceiling=enc_bind,
            encode_cell="fused" if enc_fused else "standard",
            vocoder_ms=round(t_voc * 1e3, 1),
            vocoder_tflops=round(voc_tf, 2), vocoder_gbps=round(voc_gb, 1),
            vocoder_roofline_util=round(voc_util, 3),
            vocoder_binding_ceiling=voc_bind,
            roofline_method="encode: exact analytic matmul FLOPs (XLA "
                            "cost_analysis counts a while body once, "
                            "undercounting scans ~T-fold — the source of "
                            "the r4 0.10-0.2x artifact) / vocoder: XLA "
                            "cost_analysis flops+bytes of the executed "
                            "program; both vs same-run measured ceilings",
        )

    # --- encode per-step decomposition (VERDICT r4 #2a) ----------------------
    # The encode scan measures 0.1-0.2x of every chip ceiling; the claimed
    # explanation is per-op sequencing overhead in the sequential scan body.
    # Make that an auditable measurement instead of an assertion:
    #   (1) per-step time from the SLOPE between two sequence lengths (fixed
    #       dispatch/pad/hoisted costs cancel),
    #   (2) the scan body's post-fusion HLO op count, read from the compiled
    #       while-body region,
    #   (3) a synthetic k-matmul scan at the same (B, h) geometry, fit
    #       t_step = a + b*k  ->  per-iteration overhead a, per-op cost b
    #       (a chained 128x1024 @ 1024x1024 bf16 matmul is ~2 us of MXU work,
    #       so b >> 2 us means sequencing, not compute, prices each op).
    # Done-criterion: predicted a + b*n_ops within ~2x of the measured step
    # time => the encode floor is op-count-bound and the fix is fewer ops
    # per step (the fused_cell path), not more bandwidth.
    try:
        from jax import lax

        t_long = time_fn(lambda w: codec.encode(w, bitrate), x)
        x_half = x[:, : L // 2]
        t_half = time_fn(lambda w: codec.encode(w, bitrate), x_half)
        # slope over the PADDED (executed) step counts, not the trimmed
        # frame counts — the scan runs the bucket length
        f_long = codec.frontend.num_frames(codec._pad_length(L))
        f_half = codec.frontend.num_frames(codec._pad_length(L // 2))
        step_us = (t_long - t_half) / (f_long - f_half) * 1e6

        n_ops = None
        try:
            import re

            bits_arr = jnp.asarray(codec.bits_per_frame(bitrate), jnp.float32)
            Lp = codec._pad_length(L)
            xp = jnp.pad(x, ((0, 0), (0, Lp - L)))
            txt = codec._encode_jit.lower(
                codec.bvrnn_params, xp, bits_arr, frontend=codec.frontend
            ).compile().as_text()
            m = re.search(r"while\(.*?body=%?([\w.\-]+)", txt)
            body_name = m.group(1)
            block = txt.split(f"{body_name} ", 1)[1]
            block = block.split("\n}", 1)[0]
            ops = [ln for ln in block.splitlines() if " = " in ln]
            skip_kinds = ("parameter(", "constant(", "tuple(",
                          "get-tuple-element(", "bitcast(", "copy(")
            real = [ln for ln in ops
                    if not any(k in ln for k in skip_kinds)]
            n_ops = len(real)
            kinds = {}
            for ln in real:
                mm = re.search(r"= \S+ ([\w\-]+)\(", ln)
                if mm:
                    kinds[mm.group(1)] = kinds.get(mm.group(1), 0) + 1
            log(f"encode scan body: {n_ops} post-fusion HLO ops "
                f"({', '.join(f'{k}:{v}' for k, v in sorted(kinds.items()))})")
        except Exception as e:
            log("HLO body op count failed:", e)

        B, h = x.shape[0], 1024
        w_syn = jnp.ones((h, h), jnp.bfloat16)
        c0 = jnp.ones((B, h), jnp.bfloat16)
        Tsyn = 128
        ks, ts = [], []
        for k in (1, 2, 4, 8, 16):
            def body(c, _, k=k):
                for _i in range(k):
                    c = jnp.tanh(jnp.matmul(c, w_syn))
                return c, ()

            fn = jax.jit(
                lambda c, body=body: lax.scan(body, c, None, length=Tsyn)[0].sum())
            t_k = time_fn(fn, c0)
            ks.append(k)
            ts.append(t_k / Tsyn * 1e6)
            log(f"synthetic scan body k={k} matmuls: {ts[-1]:.2f} us/step")
        b_us, a_us = np.polyfit(ks, ts, 1)
        log(f"synthetic fit: t_step = {a_us:.2f} us/iter + {b_us:.2f} us/op "
            f"(a chained (128,1024)x(1024,1024) bf16 matmul is ~2 us of MXU "
            f"work -> overhead/op ~{max(b_us - 2.0, 0.0):.1f} us)")
        # direct scan-only timing (no frontend/hoisted work): the same
        # program benchmarks/probe_scan_cell.py measures — anchors the
        # slope-derived figure above
        from bvsc_tpu.models import bvrnn as bvrnn_mod2

        T_direct = 344
        y_dir = jnp.zeros((n_streams, T_direct, codec.conf.num_mels))
        vb_dir = jnp.full((n_streams, T_direct), 35.0)
        h_dir = jnp.zeros((n_streams, codec.conf.h_dim))

        @jax.jit
        def scan_only(p, y, vb, h):
            z, mel, hf = bvrnn_mod2.encode_decode(
                p, codec.bvrnn_cfg, y, vb, h)
            return z.sum() + mel.sum()

        t_scan = time_fn(scan_only, codec.bvrnn_params, y_dir, vb_dir, h_dir)
        scan_us = t_scan / T_direct * 1e6
        log(f"direct encode_decode scan: {t_scan * 1e3:.1f} ms for "
            f"{T_direct} steps = {scan_us:.1f} us/step")

        decomp = {
            "encode_step_us_measured": round(float(step_us), 1),
            "scan_only_us_per_step": round(float(scan_us), 1),
            "scan_body_hlo_ops": n_ops,
            "synthetic_us_per_iter": round(float(a_us), 2),
            "synthetic_us_per_op": round(float(b_us), 2),
        }
        if n_ops:
            decomp["encode_step_us_predicted"] = round(
                float(a_us + b_us * n_ops), 1)
            decomp["implied_us_per_op"] = round(float(step_us) / n_ops, 2)
        extra["encode_decomposition"] = decomp
        log(f"encode decomposition: measured {decomp['encode_step_us_measured']}"
            f" us/step vs predicted {decomp.get('encode_step_us_predicted')}"
            f" us/step from {n_ops} ops x {b_us:.1f} us")
    except Exception as e:  # pragma: no cover
        log("encode decomposition skipped:", e)
        skipped.append("encode_decomposition")

    # --- batched with weight-only int8 BVRNN scans ---------------------------
    # (serving config upgrade: scan weights are the HBM-resident bulk; int8
    # halves their traffic.  Headline switches only if faster AND >=99.8%
    # code agreement vs the bf16 fast mode.)
    try:
        codec_q8 = BVRNNCodecModel(precision="default", quantize="int8")

        def full_chain_q8(wav):
            return codec_q8(wav, bitrate)

        t_batched_q8 = t_best(full_chain_q8, x, tries=2)
        # agreement over the FULL 128-stream batch (VERDICT r2 #8)
        c_fast_full = np.asarray(codec.encode(x, bitrate))
        agree_q8 = float(
            (np.asarray(codec_q8.encode(x, bitrate)) == c_fast_full).mean()
        )
        log(f"batched int8 scans: {t_batched_q8 * 1e3:.1f} ms -> "
            f"{audio_sec / t_batched_q8:.1f} audio-sec/sec/chip "
            f"(agreement {agree_q8 * 100:.3f}% over n={c_fast_full.size} bits)")
        extra.update(int8_agreement=round(agree_q8, 5),
                     agreement_sample_bits=int(c_fast_full.size))
        if t_batched_q8 < t_batched and agree_q8 >= 0.998:
            throughput = audio_sec / t_batched_q8
            log("headline uses int8-scan serving config")
    except Exception as e:  # pragma: no cover
        log("batched int8 path skipped:", e)
        skipped.append("int8_batched")

    # --- single-stream RTF ---------------------------------------------------
    x1 = x[:1]
    t_single = time_fn(lambda w: full_chain(w), x1)
    log(f"single stream: {t_single * 1e3:.1f} ms -> RTF {seconds / t_single:.1f}x")

    # --- single-stream with weight-only int8 scans ---------------------------
    try:
        codec_q = BVRNNCodecModel(precision="default", quantize="int8")

        def full_chain_q(wav):
            return codec_q(wav, bitrate)

        t_single_q = time_fn(full_chain_q, x1)
        log(f"single stream int8 scans: {t_single_q * 1e3:.1f} ms -> "
            f"RTF {seconds / t_single_q:.1f}x")

        # mixed mode: enc+phi_x bf16, rest int8 (higher code agreement);
        # agreement over the FULL 128-stream batch (VERDICT r2 #8)
        codec_qm = BVRNNCodecModel(precision="default", quantize="int8_mixed")
        t_single_qm = time_fn(lambda w: codec_qm(w, bitrate), x1)
        c_f = np.asarray(codec.encode(x, bitrate))
        c_qm = np.asarray(codec_qm.encode(x, bitrate))
        agree_qm = float((c_qm == c_f).mean())
        log(f"single stream int8_mixed scans: {t_single_qm * 1e3:.1f} ms -> "
            f"RTF {seconds / t_single_qm:.1f}x "
            f"(agreement {agree_qm * 100:.3f}% over n={c_f.size} bits)")
        extra.update(int8_mixed_agreement=round(agree_qm, 5))
    except Exception as e:  # pragma: no cover
        log("int8 path skipped:", e)
        skipped.append("int8_single")

    # --- streaming packet latency --------------------------------------------
    # (a) DEVICE property (VERDICT r2 #3): a single-dispatch lax.scan chain
    #     of N fused packet steps — compute-only per-packet latency, immune
    #     to tunnel-RTT weather.  This is the number the 34.8 ms algorithmic
    #     budget is judged against.
    # (b) host wall-clock per packet through this env's tunnel (context).
    try:
        from bvsc_tpu.streaming import FusedPacketCodec

        fc = FusedPacketCodec(codec, batch=1, bitrate=bitrate)
        fc.process(x_host[:1, : fc.winsize - fc.pad_left])  # start the stream

        n_pkt = 128
        packet_chain, args_chain = build_packet_chain(codec, fc, n_pkt, x_host)
        sync(packet_chain(*args_chain))  # compile
        per_run = []
        for _ in range(20):
            t0 = time.perf_counter()
            sync(packet_chain(*args_chain))
            per_run.append((time.perf_counter() - t0) / n_pkt * 1e3)
        dev_p50 = float(np.percentile(per_run, 50))
        dev_p99 = float(np.percentile(per_run, 99))
        budget_ms = (fc.winsize - fc.pad_left) / codec.conf.fs * 1e3  # 34.8
        log(f"streaming packet compute latency (device, {n_pkt}-packet "
            f"chain x20): p50={dev_p50:.2f} ms p99={dev_p99:.2f} ms per "
            f"11.6 ms packet vs {budget_ms:.1f} ms algorithmic budget "
            f"({'INSIDE' if dev_p99 < budget_ms else 'OVER'})")
        extra.update(stream_device_ms_p50=round(dev_p50, 3),
                     stream_device_ms_p99=round(dev_p99, 3),
                     stream_budget_ms=round(budget_ms, 1))

        lat = []
        xs = np.asarray(x_host[0])
        for i in range(0, 256 * 120, 256):
            t0 = time.perf_counter()
            fc.process(xs[None, i : i + 256])
            lat.append(time.perf_counter() - t0)
        lat = np.array(lat[4:]) * 1e3
        log(f"streaming frame latency incl. host hop (tunnel-RTT-bound in "
            f"this env): p50={np.percentile(lat, 50):.2f} ms "
            f"p99={np.percentile(lat, 99):.2f} ms")
        extra.update(stream_host_ms_p50=round(float(np.percentile(lat, 50)), 2),
                     stream_host_ms_p99=round(float(np.percentile(lat, 99)), 2))
    except Exception as e:  # pragma: no cover
        log("streaming latency check skipped:", e)
        skipped.append("streaming_latency")

    # --- end-to-end including host transfers (context, not headline) --------
    t0 = time.perf_counter()
    out = np.asarray(full_chain(jnp.asarray(x_host)))
    t_e2e = time.perf_counter() - t0
    log(f"end-to-end incl. host transfers: {t_e2e * 1e3:.1f} ms "
        f"({audio_sec / t_e2e:.1f} audio-sec/sec; tunnel-bound in this env)")

    # --- fast-mode vs parity-mode code agreement -----------------------------
    try:
        parity = BVRNNCodecModel(precision="highest")
        c_fast = np.asarray(codec.encode(x, bitrate))
        c_ref = np.asarray(parity.encode(x, bitrate))
        agree = float((c_fast == c_ref).mean())
        log(f"fast-mode code agreement vs parity mode: {agree * 100:.3f}% "
            f"(n={c_ref.size} bits)")
        extra.update(fast_vs_parity_agreement=round(agree, 5))
    except Exception as e:  # pragma: no cover
        log("code agreement check skipped:", e)
        skipped.append("code_agreement")

    # --- entropy-wire payload on a NON-collapsed code distribution -----------
    # (VERDICT r3 #6) bench's codec is random-init == near-maximum-entropy
    # codes, the conservative bound; the demo checkpoint's 80-96 % figure is
    # collapsed-KLD-specific (docs/artifacts/entropy_wire_stats.json has the
    # side-by-side).
    try:
        from bvsc_tpu.serve.entropy_wire import AdaptiveCodesCoder

        wire = {}
        for bps in (1380.0, 3000.0, 5500.0):
            k = int(codec.bits_per_frame(bps))
            c_b = np.asarray(codec.encode(x[:4], bps))  # (4, T, z)
            coder = AdaptiveCodesCoder(c_b.shape[-1])
            bits_out = frames = 0
            for s in range(c_b.shape[0]):
                for t0 in range(0, c_b.shape[1] - 7, 8):
                    bits_out += 8 * len(coder.encode_block(
                        c_b[s, t0 : t0 + 8], k))
                    frames += 8
            wire[str(int(bps))] = {
                "raw_bits_frame": k,
                "payload_bits_frame": round(bits_out / frames, 2),
                "reduction_pct": round(
                    100 * (1 - bits_out / frames / k), 1),
            }
        log("entropy wire (random-init codes, conservative): " + ", ".join(
            f"{b} bps {v['raw_bits_frame']}->{v['payload_bits_frame']} "
            f"bits/frame ({v['reduction_pct']}%)" for b, v in wire.items()))
        extra.update(entropy_wire_random_init=wire)
    except Exception as e:  # pragma: no cover
        log("entropy wire measurement skipped:", e)
        skipped.append("entropy_wire")

    # headline: the best measured serving point on the batch curve (the
    # knee; B=128 kept as a field for cross-round comparability)
    extra.update(value_128streams=round(audio_sec / t_batched, 2))
    print(json.dumps({
        "metric": "codec_throughput_3kbps_serving",
        "value": round(best_thr, 2),
        "unit": "audio_sec_per_sec",
        "vs_baseline": round(best_thr / 100.0, 3),
        "n_streams": best_B,
        **extra,
    }))


# Transient fault signatures of the tunneled TPU runtime, each observed to
# clear on retry (r5 log): a failed backend init is cached process-wide,
# a killed lease surfaces FAILED_PRECONDITION on the next client for a few
# minutes, and the remote compile helper occasionally drops a response.
_TRANSIENT_ERRORS = (
    "Unable to initialize backend",
    "FAILED_PRECONDITION",
    "remote_compile",
    "UNAVAILABLE",
)


def run_with_retry(fn, max_tries=4, delay_s=180.0):
    """Run ``fn``; on a transient tunneled-TPU RuntimeError, sleep and
    re-exec.

    jax caches a failed backend init (and can wedge client state after a
    device-side fault) for the process lifetime — so the retry must be a
    re-exec, not a loop.  Attempt count is carried across execs in
    ``BVSC_BENCH_RETRY``.
    """
    import os

    try:
        fn()
    except RuntimeError as e:
        tries = int(os.environ.get("BVSC_BENCH_RETRY", "0"))
        transient = any(s in str(e) for s in _TRANSIENT_ERRORS)
        if not transient or tries >= max_tries - 1:
            raise
        log(f"transient backend error (attempt {tries + 1}/{max_tries}), "
            f"retrying in {delay_s:.0f} s:", e)
        time.sleep(delay_s)
        os.environ["BVSC_BENCH_RETRY"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    run_with_retry(main)
