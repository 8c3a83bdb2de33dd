"""Invariant tests for the numpy oracle implementations."""

import numpy as np
import pytest

from pqa2_tpu.golden import (
    adm_features,
    motion_features,
    psnr_frame,
    ssim_frame,
    vif_features,
)
from pqa2_tpu.golden.filters import vif_filter


def make_luma(rng, h=96, w=128):
    """Structured test content: gradients + texture, uint8."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = 96 + 64 * np.sin(xx / 9.0) + 48 * np.cos(yy / 7.0)
    tex = rng.normal(0, 12, (h, w))
    return np.clip(base + tex, 0, 255).astype(np.uint8)


def degrade(img, rng, sigma=6.0):
    return np.clip(
        img.astype(np.float64) + rng.normal(0, sigma, img.shape), 0, 255
    ).astype(np.uint8)


def test_vif_filter_taps_match_published_table():
    # Spot-check against libvmaf's published Gaussian window decimals.
    # libvmaf's table was generated in float arithmetic; the analytic f64
    # Gaussian agrees to ~5e-7 per tap (see docs/CALIBRATION.md).
    np.testing.assert_allclose(
        vif_filter(3), [0.166378498, 0.667243004, 0.166378498], atol=1e-6
    )
    t0 = vif_filter(0)
    assert len(t0) == 17
    assert t0[8] == pytest.approx(0.118773937, abs=1e-6)
    assert t0[0] == pytest.approx(0.00745626912, abs=1e-6)
    t1 = vif_filter(1)
    assert t1[4] == pytest.approx(0.224173605, abs=1e-6)


def test_vif_identity(rng):
    img = make_luma(rng)
    scores = vif_features(img, img)
    assert len(scores) == 4
    for s in scores:
        assert s == pytest.approx(1.0, abs=1e-9)


def test_vif_degradation_ordering(rng):
    ref = make_luma(rng)
    mild = degrade(ref, rng, 3.0)
    severe = degrade(ref, rng, 15.0)
    s_mild = vif_features(ref, mild)
    s_severe = vif_features(ref, severe)
    for a, b in zip(s_severe, s_mild):
        assert a < b < 1.0


def test_vif_neg_gain_limit_caps_enhancement(rng):
    ref = make_luma(rng)
    # Contrast-enhanced distorted copy.
    enhanced = np.clip(
        (ref.astype(np.float64) - 128) * 1.4 + 128, 0, 255
    ).astype(np.uint8)
    plain = vif_features(ref, enhanced)
    neg = vif_features(ref, enhanced, gain_limit=1.0)
    for p, n in zip(plain, neg):
        assert n <= p + 1e-12
    assert neg[0] < plain[0]  # limit must actually bite on enhancement


def test_adm_identity(rng):
    img = make_luma(rng)
    adm2, levels, num, den = adm_features(img, img)
    assert adm2 == pytest.approx(1.0, abs=1e-12)
    for s in levels:
        assert s == pytest.approx(1.0, abs=1e-12)


def test_adm_blur_reduces_score(rng):
    from pqa2_tpu.golden.filters import sep_filter2d, gaussian_taps

    ref = make_luma(rng)
    blurred = np.clip(
        sep_filter2d(ref.astype(np.float64), gaussian_taps(9, 2.0)), 0, 255
    ).astype(np.uint8)
    adm2, _, _, _ = adm_features(ref, blurred)
    assert 0.0 < adm2 < 0.99


def test_adm_neg_gain_limit(rng):
    ref = make_luma(rng)
    enhanced = np.clip(
        (ref.astype(np.float64) - 128) * 1.5 + 128, 0, 255
    ).astype(np.uint8)
    plain, _, _, _ = adm_features(ref, enhanced)
    neg, _, _, _ = adm_features(ref, enhanced, gain_limit=1.0)
    assert neg < plain + 1e-12


def test_motion_static_and_moving(rng):
    still = make_luma(rng)
    frames = np.stack([still] * 4)
    motion, motion2 = motion_features(frames)
    assert motion == [0.0] * 4
    assert motion2 == [0.0] * 4

    moving = np.stack([np.roll(still, 3 * i, axis=1) for i in range(4)])
    motion, motion2 = motion_features(moving)
    assert motion[0] == 0.0
    assert all(m > 0.5 for m in motion[1:])
    # motion2 is min(prev, next) except at the tail.
    assert motion2[1] == pytest.approx(min(motion[1], motion[2]))
    assert motion2[-1] == pytest.approx(motion[-1])


def test_psnr_semantics(rng):
    ref_y = make_luma(rng)
    planes = {
        "y": ref_y,
        "u": (ref_y[::2, ::2] // 2 + 64).astype(np.uint8),
        "v": (ref_y[::2, ::2] // 3 + 96).astype(np.uint8),
    }
    same = psnr_frame(planes, planes)
    assert np.isinf(same["psnr_avg"]) and np.isinf(same["psnr_y"])

    dist = dict(planes)
    dist["y"] = degrade(ref_y, rng, 4.0)
    res = psnr_frame(planes, dist)
    # mse_avg pools SSE over all samples: y SSE / (N_y + N_u + N_v).
    expected_mse_avg = res["mse_y"] * ref_y.size / (
        ref_y.size + 2 * planes["u"].size
    )
    assert res["mse_avg"] == pytest.approx(expected_mse_avg, rel=1e-12)
    assert 30.0 < res["psnr_y"] < 44.0


def test_ssim_semantics(rng):
    ref_y = make_luma(rng, 96, 128)
    planes = {
        "y": ref_y,
        "u": (ref_y[::2, ::2] // 2 + 64).astype(np.uint8),
        "v": (ref_y[::2, ::2] // 3 + 96).astype(np.uint8),
    }
    same = ssim_frame(planes, planes)
    assert same["ssim_all"] == pytest.approx(1.0, abs=1e-12)

    dist = {k: degrade(v, rng, 5.0) for k, v in planes.items()}
    res = ssim_frame(planes, dist)
    assert 0.5 < res["ssim_all"] < 1.0
    expected_all = (
        res["ssim_y"] * ref_y.size
        + res["ssim_u"] * planes["u"].size
        + res["ssim_v"] * planes["v"].size
    ) / (ref_y.size + 2 * planes["u"].size)
    assert res["ssim_all"] == pytest.approx(expected_all, rel=1e-12)


def test_ssim_constants():
    from pqa2_tpu.golden.ssim import SSIM_C1, SSIM_C2

    assert SSIM_C1 == 416
    assert SSIM_C2 == 235963
