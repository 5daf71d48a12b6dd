"""bench.py's backend-unavailable retry wrapper (re-exec with attempt
counting in BVSC_BENCH_RETRY — jax caches a failed backend init for the
process lifetime, so an in-process loop cannot work)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_retry_reexecs_on_backend_unavailable(monkeypatch):
    calls = {"sleep": [], "execv": []}
    # setenv (not delenv) so monkeypatch records an undo: run_with_retry
    # writes the counter directly and must not leak it past this test
    monkeypatch.setenv("BVSC_BENCH_RETRY", "0")
    monkeypatch.setattr(bench.time, "sleep", lambda s: calls["sleep"].append(s))
    # run_with_retry does ``import os`` locally — same module object
    monkeypatch.setattr(
        os, "execv", lambda exe, argv: calls["execv"].append((exe, argv))
    )

    def fail():
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    bench.run_with_retry(fail, delay_s=0.01)
    assert calls["sleep"] == [0.01]
    assert len(calls["execv"]) == 1
    assert os.environ["BVSC_BENCH_RETRY"] == "1"


def test_retry_gives_up_after_max_tries(monkeypatch):
    monkeypatch.setenv("BVSC_BENCH_RETRY", "3")

    def fail():
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    with pytest.raises(RuntimeError, match="Unable to initialize"):
        bench.run_with_retry(fail, max_tries=4)


def test_retry_propagates_other_errors(monkeypatch):
    monkeypatch.delenv("BVSC_BENCH_RETRY", raising=False)

    def fail():
        raise RuntimeError("something else entirely")

    with pytest.raises(RuntimeError, match="something else"):
        bench.run_with_retry(fail)


def test_encode_flops_analytic_counts_matmuls():
    """bench.encode_flops_analytic must equal an independently-derived
    matmul FLOP count of the model's per-step shapes — the encode roofline
    utilization rests on this arithmetic (XLA cost_analysis cannot count
    scan programs: it tallies a while body once)."""
    import jax

    class FakeConf:
        h_dim, z_dim, num_mels, winsize = 32, 12, 8, 64

    class FakeCodec:
        conf = FakeConf()

    h, z, x, n_fft = 32, 12, 8, 64
    B, T = 3, 5
    # standard cell: enc(2h->h, h->h, h->z), phi_z(z->h, h->h, h->h),
    # dec(2h->h, h->h, h->h, h->x), phi_x_gen(x->h, h->h, h->h),
    # gru(2h->3h, h->3h); hoisted phi_x(x->h, h->h, h->h); DFT + mel basis
    dots_step = [(2*h, h), (h, h), (h, z), (z, h), (h, h), (h, h),
                 (2*h, h), (h, h), (h, h), (h, x), (x, h), (h, h), (h, h),
                 (2*h, 3*h), (h, 3*h)]
    dots_seq = [(x, h), (h, h), (h, h),
                (n_fft, 2 * (n_fft // 2 + 1)), (n_fft // 2 + 1, x)]
    expect = 2.0 * B * T * (sum(k * n for k, n in dots_step)
                            + sum(k * n for k, n in dots_seq))
    got = bench.encode_flops_analytic(FakeCodec(), B, T, fused=False)
    assert got == expect, (got, expect)
    # fused cell moves two matmuls out of the step but computes the same
    # function — total flops stay within ~35% (the h->5h combo and the
    # x-dim fold change op shapes, not orders of magnitude)
    got_fused = bench.encode_flops_analytic(FakeCodec(), B, T, fused=True)
    assert 0.5 * got < got_fused < 1.5 * got


def test_retry_covers_lease_fault_signatures(monkeypatch):
    """FAILED_PRECONDITION / remote_compile flakes (observed after a killed
    lease) must re-exec like a backend-init failure; unrelated errors must
    not."""
    import os as _os

    calls = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: calls.append(("sleep", s)))
    monkeypatch.setattr(_os, "execv", lambda *a: calls.append(("execv",)))
    monkeypatch.setenv("BVSC_BENCH_RETRY", "0")

    def boom():
        raise RuntimeError("TPU backend error (FailedPrecondition): "
                           "FAILED_PRECONDITION")

    bench.run_with_retry(boom)
    assert ("execv",) in calls

    def unrelated():
        raise RuntimeError("some genuine bug")

    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="genuine"):
        bench.run_with_retry(unrelated)
