"""Global motion compensation (N10)."""

import numpy as np
import pytest

from pqa2_tpu.align.motioncomp import (
    compensate,
    estimate_shifts,
    motion_compensate_clip,
)


def _textured(rng, n=3, h=64, w=96):
    base = rng.uniform(0, 255, size=(n, h, w))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    return np.round(base).astype(np.float32)


def test_estimate_and_compensate_roundtrip(rng):
    ref = _textured(rng)
    true_shifts = np.array([[3, -5], [0, 7], [-4, 2]])
    mov = np.stack([
        np.roll(ref[i], tuple(true_shifts[i]), axis=(0, 1))
        for i in range(3)
    ])
    est = estimate_shifts(ref, mov)
    comp, shifts = motion_compensate_clip(ref, mov)
    # After compensation the frames must match the reference closely
    # (edge-fill affects only the vacated border strips).
    for i in range(3):
        h, w = ref[i].shape
        dy, dx = np.abs(shifts[i])
        core = (slice(dy + 1, h - dy - 1), slice(dx + 1, w - dx - 1))
        np.testing.assert_allclose(comp[i][core], ref[i][core], atol=1e-3)


def test_zero_shift_identity(rng):
    ref = _textured(rng, n=2)
    comp, shifts = motion_compensate_clip(ref, ref.copy())
    assert np.all(shifts == 0)
    np.testing.assert_array_equal(comp, ref)


def test_large_shift_rejected(rng):
    ref = _textured(rng, n=1, h=64, w=96)
    mov = np.roll(ref, (0, 45), axis=(1, 2))  # beyond max_shift=32
    est = estimate_shifts(ref, mov, max_shift=32)
    assert np.all(est == 0)


def test_shape_mismatch_errors(rng):
    ref = _textured(rng, n=2)
    with pytest.raises(ValueError):
        motion_compensate_clip(ref, ref[:1])
