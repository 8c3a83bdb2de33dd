"""jnp feature ops vs float64 oracles (SURVEY.md section 4, item 2)."""

import numpy as np
import pytest

from pqa2_tpu.golden import adm as g_adm
from pqa2_tpu.golden import motion as g_motion
from pqa2_tpu.golden import psnr as g_psnr
from pqa2_tpu.golden import ssim as g_ssim
from pqa2_tpu.golden import vif as g_vif
from pqa2_tpu.golden.filters import sep_filter2d, vif_filter
from pqa2_tpu.ops import (
    adm_features_batched,
    motion_features,
    psnr_planes_batched,
    sep_filter_batched,
    ssim_plane_batched,
    vif_features_batched,
)
from pqa2_tpu.ops.filters import dwt2_batched


def _frames(rng, n=3, h=72, w=96, smooth=True):
    """Synthetic luma batch with spatial structure (not pure noise)."""
    base = rng.uniform(0, 255, size=(n, h, w))
    if smooth:
        # Low-pass so VIF/ADM see natural-image-like correlation.
        for _ in range(2):
            base = (
                base
                + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)
            ) / 5.0
    return np.round(base).astype(np.float32)


def test_sep_filter_matches_oracle(rng):
    x = _frames(rng, n=2)
    taps = vif_filter(0)
    got = np.asarray(sep_filter_batched(x, taps))
    for i in range(2):
        want = sep_filter2d(x[i].astype(np.float64), taps)
        np.testing.assert_allclose(got[i], want, rtol=2e-5, atol=2e-3)


def test_dwt2_matches_oracle(rng):
    x = _frames(rng, n=2, h=67, w=93)  # odd sizes exercise the border math
    got = dwt2_batched(x)
    for i in range(2):
        want = g_adm.dwt2_db2(x[i].astype(np.float64))
        for band in ("a", "h", "v", "d"):
            np.testing.assert_allclose(
                np.asarray(got[band])[i], want[band], rtol=1e-4, atol=5e-3
            )


@pytest.mark.parametrize("variant", ["default", "classic"])
def test_vif_matches_oracle(rng, variant):
    ref = _frames(rng, n=3)
    dist = np.clip(ref + rng.normal(0, 4, ref.shape), 0, 255).astype(np.float32)
    got = np.asarray(vif_features_batched(ref, dist, variant=variant))
    for i in range(3):
        want = g_vif.vif_features(ref[i], dist[i], variant=variant)
        np.testing.assert_allclose(got[i], want, rtol=0, atol=2e-4)


def test_vif_neg_gain_limit(rng):
    ref = _frames(rng, n=2)
    # Enhancement (contrast boost) — the gain clamp must bite.
    dist = np.clip(ref * 1.3 - 30.0, 0, 255).astype(np.float32)
    got = np.asarray(vif_features_batched(ref, dist, gain_limit=1.0))
    plain = np.asarray(vif_features_batched(ref, dist))
    assert np.any(got < plain - 1e-5)
    # NEG semantics: enhancement gets NO credit, not a penalty — for a
    # pure affine boost the unclamped gain makes sv ~ 0 exactly, so the
    # clamped numerator equals the denominator and vif_neg ~ 1.0 (the
    # clamp-after-sv order libvmaf uses; fixed round 3). That same
    # cancellation makes the f32 sv noisier than the f64 oracle's, hence
    # the wider tolerance on this stress clip (measured ~2.5e-4).
    assert np.all(got > 0.999) and np.all(got <= 1.0 + 1e-6)
    for i in range(2):
        want = g_vif.vif_features(ref[i], dist[i], gain_limit=1.0)
        np.testing.assert_allclose(got[i], want, rtol=0, atol=1e-3)


def test_vif_identity(rng):
    ref = _frames(rng, n=1)
    got = np.asarray(vif_features_batched(ref, ref))
    np.testing.assert_allclose(got, 1.0, atol=1e-5)


def test_adm_matches_oracle(rng):
    ref = _frames(rng, n=3, h=108, w=144)
    dist = np.clip(ref + rng.normal(0, 6, ref.shape), 0, 255).astype(np.float32)
    got = np.asarray(adm_features_batched(ref, dist))
    for i in range(3):
        want, _, _, _ = g_adm.adm_features(ref[i], dist[i])
        np.testing.assert_allclose(got[i], want, rtol=0, atol=2e-4)


def test_adm_identity_and_neg(rng):
    ref = _frames(rng, n=1, h=108, w=144)
    np.testing.assert_allclose(
        np.asarray(adm_features_batched(ref, ref)), 1.0, atol=1e-5
    )
    dist = np.clip(ref * 1.25, 0, 255).astype(np.float32)
    got_neg = np.asarray(adm_features_batched(ref, dist, gain_limit=1.0))
    want_neg, _, _, _ = g_adm.adm_features(ref[0], dist[0], gain_limit=1.0)
    np.testing.assert_allclose(got_neg[0], want_neg, rtol=0, atol=2e-4)


def test_motion_matches_oracle(rng):
    frames = _frames(rng, n=5)
    motion, motion2 = motion_features(frames)
    want_m, want_m2 = g_motion.motion_features(frames)
    np.testing.assert_allclose(np.asarray(motion), want_m, rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(motion2), want_m2, rtol=0, atol=2e-3)


def test_motion_halo_consistency(rng):
    """Chunked scoring with halos == whole-clip scoring."""
    frames = _frames(rng, n=8)
    _, whole = motion_features(frames)
    whole = np.asarray(whole)
    # chunk 1: frames 0..3 (+next halo 4); chunk 2: frames 4..7 (+prev halo 3)
    _, c1 = motion_features(frames[:5], has_prev=False, has_next=True)
    _, c2 = motion_features(frames[3:], has_prev=True, has_next=False)
    got = np.concatenate([np.asarray(c1), np.asarray(c2)])
    np.testing.assert_allclose(got, whole, rtol=0, atol=1e-5)


def test_psnr_matches_oracle(rng):
    n, h, w = 3, 48, 64
    ref = {p: rng.integers(0, 256, (n, h // s, w // s)).astype(np.uint8)
           for p, s in (("y", 1), ("u", 2), ("v", 2))}
    dist = {p: np.clip(ref[p].astype(np.int32) + rng.integers(-5, 6, ref[p].shape), 0, 255).astype(np.uint8)
            for p in ref}
    got = psnr_planes_batched(
        ref["y"], ref["u"], ref["v"], dist["y"], dist["u"], dist["v"]
    )
    for i in range(n):
        want = g_psnr.psnr_frame(
            {p: ref[p][i] for p in ref}, {p: dist[p][i] for p in ref}
        )
        for key in ("mse_y", "mse_u", "mse_v", "mse_avg",
                    "psnr_y", "psnr_u", "psnr_v", "psnr_avg"):
            np.testing.assert_allclose(
                float(np.asarray(got[key])[i]), want[key], rtol=1e-5
            )


def test_psnr_identical_is_inf(rng):
    y = rng.integers(0, 256, (2, 16, 16)).astype(np.uint8)
    u = v = rng.integers(0, 256, (2, 8, 8)).astype(np.uint8)
    got = psnr_planes_batched(y, u, v, y, u, v)
    assert np.all(np.isinf(np.asarray(got["psnr_avg"])))


def test_ssim_matches_oracle(rng):
    n, h, w = 3, 64, 80
    ref = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    dist = np.clip(ref.astype(np.int32) + rng.integers(-8, 9, ref.shape), 0, 255).astype(np.uint8)
    got = np.asarray(ssim_plane_batched(ref, dist))
    for i in range(n):
        want = g_ssim.ssim_plane(ref[i], dist[i])
        np.testing.assert_allclose(got[i], want, rtol=0, atol=1e-5)


def test_ssim_identity(rng):
    ref = rng.integers(0, 256, (1, 32, 32)).astype(np.uint8)
    np.testing.assert_allclose(np.asarray(ssim_plane_batched(ref, ref)), 1.0, atol=1e-7)
