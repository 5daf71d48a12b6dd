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
