"""Pallas kernels vs the jnp ops (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

from pqa2_tpu.ops.pallas_vif import (
    pick_tile_h,
    vif_features_pallas,
    vif_scale_sums_pallas,
)
from pqa2_tpu.ops.vif import vif_features_batched


def _frames(rng, n=2, h=64, w=96):
    base = rng.uniform(0, 255, size=(n, h, w))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    return np.round(base).astype(np.float32)


def test_pick_tile_h():
    # 8-aligned tiles (Mosaic sublane rule); ragged tails are masked.
    assert pick_tile_h(1080) == 64
    assert pick_tile_h(2160) == 64
    assert pick_tile_h(64) == 64
    assert pick_tile_h(7) == 8
    assert pick_tile_h(13, max_tile=4) == 8


@pytest.mark.parametrize("scale", [0, 1, 2, 3])
def test_vif_scale_sums_match_jnp(rng, scale):
    ref = _frames(rng)
    dist = np.clip(ref + rng.normal(0, 4, ref.shape), 0, 255).astype(np.float32)
    # Decimate to the scale's resolution using the jnp reference path.
    from pqa2_tpu.golden.filters import vif_filter
    from pqa2_tpu.ops.filters import sep_filter_batched

    r, d = ref, dist
    for s in range(1, scale + 1):
        taps = vif_filter(s)
        r = np.asarray(sep_filter_batched(r, taps))[:, ::2, ::2]
        d = np.asarray(sep_filter_batched(d, taps))[:, ::2, ::2]

    tile_h = pick_tile_h(r.shape[1], max_tile=16)
    num, den = vif_scale_sums_pallas(
        r, d, scale, tile_h=tile_h, interpret=True
    )
    feat = np.asarray(num) / np.asarray(den)
    want = np.asarray(vif_features_batched(ref, dist))[:, scale]
    np.testing.assert_allclose(feat, want, rtol=0, atol=5e-5)


def test_vif_features_pallas_full(rng):
    ref = _frames(rng, n=2, h=64, w=96)
    dist = np.clip(ref + rng.normal(0, 5, ref.shape), 0, 255).astype(np.float32)
    got = np.asarray(vif_features_pallas(ref, dist, interpret=True))
    want = np.asarray(vif_features_batched(ref, dist))
    # tile-partial vs whole-image summation order differs in f32
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_vif_pallas_neg_gain(rng):
    ref = _frames(rng)
    dist = np.clip(ref * 1.3 - 25.0, 0, 255).astype(np.float32)
    got = np.asarray(vif_features_pallas(ref, dist, gain_limit=1.0, interpret=True))
    want = np.asarray(vif_features_batched(ref, dist, gain_limit=1.0))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_pipeline_pallas_backend_matches(rng):
    """extract_features_batched(backend='pallas') == default backend."""
    from pqa2_tpu.pipeline.features import extract_features_batched

    ref = _frames(rng, n=3, h=64, w=96)
    dist = np.clip(ref + rng.normal(0, 4, ref.shape), 0, 255).astype(np.float32)
    a = extract_features_batched(ref, dist)
    b = extract_features_batched(ref, dist, backend="pallas")
    for k in a:
        np.testing.assert_allclose(
            np.asarray(b[k]), np.asarray(a[k]), rtol=0, atol=2e-4, err_msg=k
        )


def test_ssim_pallas_matches_jnp(rng):
    from pqa2_tpu.ops.pallas_ssim import ssim_plane_pallas
    from pqa2_tpu.ops.ssim import ssim_plane_batched

    for h, w in ((64, 96), (52, 68)):  # second: non-multiple-of-4 crop
        ref = rng.integers(0, 256, (2, h, w)).astype(np.float32)
        dist = np.clip(ref + rng.normal(0, 8, ref.shape), 0, 255).astype(np.float32)
        got = np.asarray(ssim_plane_pallas(ref, dist, tile_b=4, interpret=True))
        want = np.asarray(ssim_plane_batched(ref, dist))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5,
                                   err_msg=f"{h}x{w}")


def test_ssim_pallas_10bit_constants(rng):
    """The fused kernel bakes ffmpeg's depth-scaled c1/c2 into the tile
    program; at 10-bit it must match both the XLA path and the depth-10
    oracle (the CPU suite's only exercise of the kernel's depth path —
    off-TPU ssim_sse_plane routes to XLA)."""
    from pqa2_tpu.golden.ssim import ssim_plane
    from pqa2_tpu.ops.pallas_ssim import ssim_plane_pallas
    from pqa2_tpu.ops.ssim import ssim_plane_batched

    ref10 = rng.integers(0, 1024, (2, 64, 96)).astype(np.uint16)
    dist10 = np.clip(ref10.astype(np.int32)
                     + rng.integers(-40, 41, ref10.shape),
                     0, 1023).astype(np.uint16)
    r8 = ref10.astype(np.float32) / 4.0
    d8 = dist10.astype(np.float32) / 4.0
    got = np.asarray(ssim_plane_pallas(r8, d8, tile_b=4, interpret=True,
                                       bit_depth=10))
    want_xla = np.asarray(ssim_plane_batched(r8, d8, bit_depth=10))
    np.testing.assert_allclose(got, want_xla, rtol=0, atol=1e-6)
    want = np.array([ssim_plane(ref10[i], dist10[i], bit_depth=10)
                     for i in range(2)])
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)


def test_ssim_pallas_identity(rng):
    from pqa2_tpu.ops.pallas_ssim import ssim_plane_pallas

    ref = rng.integers(0, 256, (1, 32, 48)).astype(np.float32)
    got = np.asarray(ssim_plane_pallas(ref, ref, interpret=True))
    np.testing.assert_allclose(got, 1.0, atol=1e-6)


@pytest.mark.parametrize("hw", [(64, 96), (68, 132), (54, 1280)])
def test_adm_pallas_matches_jnp(rng, hw):
    from pqa2_tpu.ops.adm import adm_features_batched
    from pqa2_tpu.ops.pallas_adm import adm_features_pallas

    h, w = hw
    ref = _frames(rng, n=2, h=h, w=w)
    dist = np.clip(ref + rng.normal(0, 6, ref.shape), 0, 255).astype(np.float32)
    got = np.asarray(adm_features_pallas(ref, dist, interpret=True))
    want = np.asarray(adm_features_batched(ref, dist))
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-4, err_msg=str(hw))


def test_adm_pallas_identity_and_neg(rng):
    from pqa2_tpu.ops.adm import adm_features_batched
    from pqa2_tpu.ops.pallas_adm import adm_features_pallas

    ref = _frames(rng, n=1, h=64, w=96)
    np.testing.assert_allclose(
        np.asarray(adm_features_pallas(ref, ref, interpret=True)), 1.0, atol=1e-4
    )
    dist = np.clip(ref * 1.25, 0, 255).astype(np.float32)
    got = np.asarray(adm_features_pallas(ref, dist, gain_limit=1.0, interpret=True))
    want = np.asarray(adm_features_batched(ref, dist, gain_limit=1.0))
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-4)


def test_motion_pallas_matches_jnp(rng):
    from pqa2_tpu.ops.motion import motion_features
    from pqa2_tpu.ops.pallas_motion import motion_features_pallas

    frames = _frames(rng, n=5, h=70, w=150)
    for has_prev in (False, True):
        for has_next in (False, True):
            a = motion_features(frames, has_prev=has_prev, has_next=has_next)
            b = motion_features_pallas(frames, has_prev=has_prev,
                                       has_next=has_next, interpret=True)
            for x, y in zip(a, b):
                x, y = np.asarray(x), np.asarray(y)
                # motion2 carries +inf at a true clip end slot pre-min;
                # outputs are finite, compare directly.
                np.testing.assert_allclose(x, y, rtol=0, atol=1e-4)


def test_motion_pallas_first_frame_zero(rng):
    from pqa2_tpu.ops.pallas_motion import motion_sad_pallas

    frames = _frames(rng, n=3, h=40, w=90)
    sad = np.asarray(motion_sad_pallas(frames, interpret=True))
    assert sad[0] == 0.0
    assert (sad[1:] > 0).all()


def test_ssim_sse_pallas_matches_jnp(rng):
    from pqa2_tpu.ops.pallas_ssim import ssim_sse_pallas
    from pqa2_tpu.ops.psnr import _sse
    from pqa2_tpu.ops.ssim import ssim_plane_batched

    for shape in ((2, 64, 96), (1, 70, 150), (2, 33, 700)):
        ref = _frames(rng, *shape)
        dist = np.clip(ref + rng.normal(0, 6, ref.shape), 0, 255).astype(
            np.float32)
        s, e = ssim_sse_pallas(ref, dist, interpret=True)
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(ssim_plane_batched(ref, dist)),
            rtol=0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(e), np.asarray(_sse(ref, dist)), rtol=1e-6, atol=0)


def test_ssim_sse_pallas_identity(rng):
    from pqa2_tpu.ops.pallas_ssim import ssim_sse_pallas

    ref = _frames(rng, n=2, h=48, w=80)
    s, e = ssim_sse_pallas(ref, ref, interpret=True)
    np.testing.assert_allclose(np.asarray(s), 1.0, rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e), 0.0, rtol=0, atol=0)


def test_fused_motion_chunked_equals_whole(rng):
    """The scale-0 kernel's fused motion SAD must agree across chunk
    boundaries (halo semantics) with the whole-clip jnp path."""
    from pqa2_tpu.pipeline.scoring import extract_clip_features

    ref = _frames(rng, n=7, h=48, w=80)
    dist = np.clip(ref + rng.normal(0, 5, ref.shape), 0, 255).astype(
        np.float32)
    whole = extract_clip_features(
        ref, dist, feature_params={"backend": "xla"}, chunk_size=64)
    chunked = extract_clip_features(
        ref, dist, feature_params={"backend": "pallas"}, chunk_size=3)
    for k in whole:
        np.testing.assert_allclose(chunked[k], whole[k], rtol=0, atol=1e-4,
                                   err_msg=k)


def test_vif_pallas_tiny_frames(rng):
    """Edge geometry: frames small enough that scale 3 is a handful of
    pixels, and widths below one lane tile."""
    from pqa2_tpu.ops.vif import vif_features_batched

    for shape in ((2, 48, 96), (1, 64, 130)):
        ref = _frames(rng, *shape)
        dist = np.clip(ref + rng.normal(0, 5, ref.shape), 0, 255).astype(
            np.float32)
        a = np.asarray(vif_features_batched(ref, dist))
        b = np.asarray(vif_features_pallas(ref, dist, interpret=True))
        # scale 3 here is only a handful of pixels; f32 reassociation in the
        # fused decimating blur shows up at ~1e-4 on such tiny sums.
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-4)


def test_vif_pallas_with_motion_matches(rng):
    from pqa2_tpu.ops.motion import motion_features
    from pqa2_tpu.ops.vif import vif_features_batched

    ref = _frames(rng, n=4, h=70, w=150)
    dist = np.clip(ref + rng.normal(0, 5, ref.shape), 0, 255).astype(
        np.float32)
    vif, sad = vif_features_pallas(ref, dist, interpret=True,
                                   with_motion=True)
    np.testing.assert_allclose(
        np.asarray(vif), np.asarray(vif_features_batched(ref, dist)),
        rtol=0, atol=2e-4)
    # sad[n] = sad(n-1, n); motion[t] for a closed clip is [0, sad[1:]...].
    motion, _ = motion_features(ref)
    np.testing.assert_allclose(np.asarray(sad)[1:], np.asarray(motion)[1:],
                               rtol=0, atol=1e-4)
    assert float(sad[0]) == 0.0
