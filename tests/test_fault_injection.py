"""Fault injection for the streaming scorer's transient-retry posture.

The reference app retries flaky hardware/ffmpeg steps
(/root/reference/app/options_manager.py:94-96 retry settings; SURVEY.md
section 5.3).  The TPU analog is stream_score's per-chunk retry on
transient device faults (pipeline/streaming.py): an ``UNAVAILABLE`` error
(preemption, flaky interconnect) is retried up to twice with backoff;
anything else propagates immediately.  These tests inject failures at the
feature-extraction boundary and pin the recovery semantics end-to-end.
"""

import threading

import numpy as np
import pytest

import pqa2_tpu.pipeline.streaming as streaming
from pqa2_tpu.io.y4m import write_y4m


def _mk_pair(tmp_path, rng, n=6, h=48, w=64):
    ys = rng.integers(16, 220, (n, h, w)).astype(np.uint8)
    dist = np.clip(
        ys.astype(np.int16) + rng.integers(-6, 7, ys.shape), 0, 255
    ).astype(np.uint8)

    def frames(arr):
        return [
            {
                "y": y,
                "u": np.full((h // 2, w // 2), 128, np.uint8),
                "v": np.full((h // 2, w // 2), 128, np.uint8),
            }
            for y in arr
        ]

    rp, dp = str(tmp_path / "ref.y4m"), str(tmp_path / "dist.y4m")
    write_y4m(rp, frames(ys))
    write_y4m(dp, frames(dist))
    return rp, dp


class _Flaky:
    """Wraps extract_features_batched; raises for the first ``fail_n`` calls."""

    def __init__(self, real, fail_n, exc_factory):
        self.real = real
        self.fail_n = fail_n
        self.calls = 0
        self.exc_factory = exc_factory

    def __call__(self, *args, **kwargs):
        self.calls += 1
        if self.calls <= self.fail_n:
            raise self.exc_factory()
        return self.real(*args, **kwargs)


@pytest.fixture
def no_backoff(monkeypatch):
    """Replace the retry sleep with a recorder so tests stay fast."""
    import time

    sleeps = []
    monkeypatch.setattr(time, "sleep", lambda s: sleeps.append(s))
    return sleeps


def _score(rp, dp, **kw):
    return streaming.stream_score(
        rp, dp, chunk_size=4, with_psnr=False, with_ssim=False,
        precision="float", **kw,
    )


def test_transient_unavailable_recovers_bitwise(tmp_path, rng, monkeypatch,
                                                no_backoff):
    rp, dp = _mk_pair(tmp_path, rng)
    clean = _score(rp, dp)

    flaky = _Flaky(
        streaming.extract_features_batched, 1,
        lambda: RuntimeError("UNAVAILABLE: device preempted (injected)"),
    )
    monkeypatch.setattr(streaming, "extract_features_batched", flaky)
    faulted = _score(rp, dp)

    # One retry happened, with backoff, and the result is unchanged.
    assert flaky.calls >= 2
    assert no_backoff == [5.0]
    np.testing.assert_array_equal(faulted.vmaf, clean.vmaf)
    for k in clean.features:
        np.testing.assert_array_equal(faulted.features[k], clean.features[k])


def test_unavailable_exhausts_after_two_retries(tmp_path, rng, monkeypatch,
                                                no_backoff):
    rp, dp = _mk_pair(tmp_path, rng)
    flaky = _Flaky(
        streaming.extract_features_batched, 99,
        lambda: RuntimeError("UNAVAILABLE: device preempted (injected)"),
    )
    monkeypatch.setattr(streaming, "extract_features_batched", flaky)
    before = threading.active_count()
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        _score(rp, dp)
    # Initial attempt + 2 retries on the first chunk, then give up.
    assert flaky.calls == 3
    assert no_backoff == [5.0, 10.0]
    # The producer thread was stopped and joined by the finally block.
    deadline = threading.Event()
    for _ in range(50):
        if threading.active_count() <= before:
            break
        deadline.wait(0.1)
    assert threading.active_count() <= before


def test_non_transient_error_propagates_immediately(tmp_path, rng,
                                                    monkeypatch, no_backoff):
    rp, dp = _mk_pair(tmp_path, rng)
    flaky = _Flaky(
        streaming.extract_features_batched, 99,
        lambda: ValueError("injected shape mismatch"),
    )
    monkeypatch.setattr(streaming, "extract_features_batched", flaky)
    with pytest.raises(ValueError, match="injected shape mismatch"):
        _score(rp, dp)
    assert flaky.calls == 1  # no retry for non-transient errors
    assert no_backoff == []


def test_mid_clip_fault_preserves_halo_continuity(tmp_path, rng, monkeypatch,
                                                  no_backoff):
    """A fault on a LATER chunk must not disturb the motion halo chain:
    motion2 of the first frame of chunk 2 depends on the last frame of
    chunk 1 carried across the boundary."""
    rp, dp = _mk_pair(tmp_path, rng, n=10)
    clean = _score(rp, dp)

    real = streaming.extract_features_batched
    state = {"calls": 0}

    def fail_second_chunk(*args, **kwargs):
        state["calls"] += 1
        if state["calls"] == 2:
            raise RuntimeError("UNAVAILABLE: injected mid-clip")
        return real(*args, **kwargs)

    monkeypatch.setattr(streaming, "extract_features_batched",
                        fail_second_chunk)
    faulted = _score(rp, dp)
    assert state["calls"] >= 3
    np.testing.assert_array_equal(faulted.vmaf, clean.vmaf)
