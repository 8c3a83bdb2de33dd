"""10-bit ingest: features on the 8-bit scale, PSNR at native peak."""

import numpy as np
import pytest

from pqa2_tpu.io.y4m import write_y4m
from pqa2_tpu.pipeline.streaming import stream_score


def _planes(y, depth=8):
    h, w = y.shape
    c = np.full((h // 2, w // 2), 128 << (depth - 8),
                np.uint16 if depth > 8 else np.uint8)
    return {"y": y, "u": c, "v": c}


def test_10bit_matches_8bit_scores(tmp_path, rng):
    n, h, w = 3, 48, 64
    base = rng.uniform(16, 235, size=(n, h, w))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    ref8 = np.round(base).astype(np.uint8)
    dist8 = np.clip(ref8.astype(np.int16) + rng.integers(-5, 6, ref8.shape),
                    0, 255).astype(np.uint8)
    ref10 = (ref8.astype(np.uint16) << 2)
    dist10 = (dist8.astype(np.uint16) << 2)

    p8r, p8d = str(tmp_path / "r8.y4m"), str(tmp_path / "d8.y4m")
    p10r, p10d = str(tmp_path / "r10.y4m"), str(tmp_path / "d10.y4m")
    write_y4m(p8r, [_planes(f) for f in ref8])
    write_y4m(p8d, [_planes(f) for f in dist8])
    write_y4m(p10r, [_planes(f, 10) for f in ref10], colorspace="C420p10")
    write_y4m(p10d, [_planes(f, 10) for f in dist10], colorspace="C420p10")

    s8 = stream_score(p8r, p8d, with_ssim=True)
    s10 = stream_score(p10r, p10d, with_ssim=True)
    # x<<2 / 4 is exactly x, so scores must agree to float tolerance —
    # except SSIM's deliberate depth-10 constants (c1 416 -> 418.625 on the
    # 8-bit scale), a deterministic ~1e-5 shift: band it like the 12-bit pin.
    np.testing.assert_allclose(s10.vmaf, s8.vmaf, atol=1e-3)
    np.testing.assert_allclose(s10.ssim["ssim_y"], s8.ssim["ssim_y"], atol=5e-5)
    # PSNR: same relative error at 4x amplitude and 4x peak -> same dB.
    np.testing.assert_allclose(s10.psnr["psnr_y"], s8.psnr["psnr_y"], atol=0.05)


def test_mixed_depth_psnr_native(tmp_path, rng):
    """8-bit reference vs 10-bit capture: features/SSIM on the 8-bit scale;
    PSNR on the common scale at the max depth (the 8-bit-scale SSE times
    max_div^2 is exactly the common-format SSE)."""
    n, h, w = 3, 48, 64
    ref8 = rng.integers(16, 235, (n, h, w)).astype(np.uint8)
    dist10 = np.clip((ref8.astype(np.int32) << 2)
                     + rng.integers(-20, 21, ref8.shape), 0, 1023
                     ).astype(np.uint16)

    pr, pd = str(tmp_path / "r8.y4m"), str(tmp_path / "d10.y4m")
    write_y4m(pr, [_planes(f) for f in ref8])
    write_y4m(pd, [_planes(f, 10) for f in dist10], colorspace="C420p10")

    s = stream_score(pr, pd, with_ssim=True)
    # Native PSNR, computed independently: upscale ref to 10-bit grid.
    sse = ((ref8.astype(np.float64) * 4 - dist10.astype(np.float64)) ** 2
           ).sum(axis=(1, 2))
    mse_y = sse / (h * w)
    psnr_y = 10 * np.log10(1023.0**2 / mse_y)
    np.testing.assert_allclose(s.psnr["psnr_y"], psnr_y, atol=0.01)
    assert np.all(np.asarray(s.ssim["ssim_y"]) <= 1.0)


def test_12bit_matches_8bit_scores(tmp_path, rng):
    """12-bit (x<<4) sources run the native fixed-point grid end-to-end
    (in_q=4 widened shifts) and must reproduce the 8-bit scores exactly
    up to the f32 scale normalisation."""
    n, h, w = 3, 48, 64
    base = rng.uniform(16, 235, size=(n, h, w))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    ref8 = np.round(base).astype(np.uint8)
    dist8 = np.clip(ref8.astype(np.int16) + rng.integers(-5, 6, ref8.shape),
                    0, 255).astype(np.uint8)
    ref12 = (ref8.astype(np.uint16) << 4)
    dist12 = (dist8.astype(np.uint16) << 4)

    p8r, p8d = str(tmp_path / "r8.y4m"), str(tmp_path / "d8.y4m")
    p12r, p12d = str(tmp_path / "r12.y4m"), str(tmp_path / "d12.y4m")
    write_y4m(p8r, [_planes(f) for f in ref8])
    write_y4m(p8d, [_planes(f) for f in dist8])
    write_y4m(p12r, [_planes(f, 12) for f in ref12], colorspace="C420p12")
    write_y4m(p12d, [_planes(f, 12) for f in dist12], colorspace="C420p12")

    s8 = stream_score(p8r, p8d, with_ssim=True)
    s12 = stream_score(p12r, p12d, with_ssim=True)
    np.testing.assert_allclose(s12.vmaf, s8.vmaf, atol=1e-3)
    # SSIM pins against the depth-12 oracle (ffmpeg scales c1/c2 with the
    # native max, so the 12-bit value legitimately differs from the 8-bit
    # run by ~1e-5 — the constants, not the codes).
    from pqa2_tpu.golden.ssim import ssim_plane

    want12 = np.array([ssim_plane(ref12[i], dist12[i], bit_depth=12)
                       for i in range(n)])
    np.testing.assert_allclose(s12.ssim["ssim_y"], want12, atol=2e-6)
    np.testing.assert_allclose(s12.ssim["ssim_y"], s8.ssim["ssim_y"],
                               atol=5e-5)
    # Same relative error at 16x amplitude and 16x peak -> same dB.
    np.testing.assert_allclose(s12.psnr["psnr_y"], s8.psnr["psnr_y"],
                               atol=0.05)
    assert s12.peak == 4095.0


def test_mixed_depth_vmaf_promotes_shallow_stream(tmp_path, rng):
    """8-bit reference vs 10-bit capture must score identically to the same
    pair with the reference promoted to the 10-bit grid on the host.

    Regression: the shallower stream used to stay in uint8 through the
    feature pass, and to_native_grid read those raw 0..255 codes as codes
    already on the 10-bit pair grid — the reference landed 4x dark and the
    integer-path (default) scores were garbage."""
    n, h, w = 3, 48, 64
    base = rng.uniform(16, 235, size=(n, h, w))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    ref8 = np.round(base).astype(np.uint8)
    dist10 = np.clip((ref8.astype(np.int32) << 2)
                     + rng.integers(-20, 21, ref8.shape), 0, 1023
                     ).astype(np.uint16)
    ref10 = (ref8.astype(np.uint16) << 2)

    p8r = str(tmp_path / "r8.y4m")
    p10r, p10d = str(tmp_path / "r10.y4m"), str(tmp_path / "d10.y4m")
    write_y4m(p8r, [_planes(f) for f in ref8])
    write_y4m(p10r, [_planes(f, 10) for f in ref10], colorspace="C420p10")
    write_y4m(p10d, [_planes(f, 10) for f in dist10], colorspace="C420p10")

    mixed = stream_score(p8r, p10d, with_psnr=False, with_ssim=False)
    both10 = stream_score(p10r, p10d, with_psnr=False, with_ssim=False)
    # The promoted codes are identical (x<<2), so the two runs execute the
    # same integer pipeline on the same grid: features must agree exactly
    # up to float evaluation order.
    for k in mixed.feature_names:
        np.testing.assert_allclose(mixed.features[k], both10.features[k],
                                   atol=1e-6)
    np.testing.assert_allclose(mixed.vmaf, both10.vmaf, atol=1e-4)


def test_10bit_psnr_log_summary_uses_native_peak(tmp_path, rng):
    """The trailing 'PSNR average' summary line must pool with the native
    peak (1023 for 10-bit), consistent with the per-frame lines."""
    import re

    from pqa2_tpu.app.vmaf_analyzer import write_psnr_log

    n, h, w = 3, 48, 64
    ref10 = rng.integers(64, 940, (n, h, w)).astype(np.uint16)
    dist10 = np.clip(ref10.astype(np.int32) + rng.integers(-24, 25, ref10.shape),
                     0, 1023).astype(np.uint16)
    pr, pd = str(tmp_path / "r10.y4m"), str(tmp_path / "d10.y4m")
    write_y4m(pr, [_planes(f, 10) for f in ref10], colorspace="C420p10")
    write_y4m(pd, [_planes(f, 10) for f in dist10], colorspace="C420p10")

    s = stream_score(pr, pd, with_ssim=False)
    assert s.peak == 1023.0
    log = tmp_path / "p.txt"
    write_psnr_log(s, str(log))
    m = re.search(r"PSNR average:([0-9.]+|inf)", log.read_text())
    assert m is not None
    pooled = 10.0 * np.log10(1023.0**2 / np.mean(s.psnr["mse_avg"]))
    assert float(m.group(1)) == pytest.approx(pooled, abs=1e-3)
    # Summary must sit in the same ballpark as the per-frame values (a 255
    # peak would put it ~12 dB low).
    assert abs(float(m.group(1)) - float(np.mean(s.psnr["psnr_avg"]))) < 3.0


def test_native_10bit_integer_path_oracle_vs_device(rng):
    """True 10-bit content (codes not on the 8-bit grid): the integer
    feature family runs on the native grid — oracle and device twin agree
    per feature (round-3; previously >8-bit was rounded to 8-bit first)."""
    import jax.numpy as jnp

    from pqa2_tpu.golden.adm_int import adm_features_int
    from pqa2_tpu.golden.motion_int import motion_features_int as motion_o
    from pqa2_tpu.golden.vif_int import vif_features_int
    from pqa2_tpu.ops.adm_int import adm_features_int_batched
    from pqa2_tpu.ops.motion_int import motion_features_int as motion_d
    from pqa2_tpu.ops.vif_int import vif_features_int_batched

    ref = rng.integers(0, 1024, (3, 72, 96)).astype(np.uint16)
    dist = np.clip(ref.astype(np.int32) + rng.integers(-40, 41, ref.shape),
                   0, 1023).astype(np.uint16)

    fo = vif_features_int(ref[0], dist[0], bit_depth=10)
    fd = np.asarray(vif_features_int_batched(
        jnp.asarray(ref[:1], jnp.uint32), jnp.asarray(dist[:1], jnp.uint32),
        bit_depth=10))[0]
    np.testing.assert_allclose(fd, fo, rtol=0, atol=2e-6)

    ao = adm_features_int(ref[0], dist[0], bit_depth=10)[0]
    ad = float(np.asarray(adm_features_int_batched(
        jnp.asarray(ref[:1], jnp.uint32), jnp.asarray(dist[:1], jnp.uint32),
        bit_depth=10))[0])
    np.testing.assert_allclose(ad, ao, rtol=0, atol=1e-6)

    mo, m2o = motion_o(ref, bit_depth=10)
    md, m2d = motion_d(jnp.asarray(ref, jnp.uint32), bit_depth=10)
    np.testing.assert_allclose(np.asarray(md), mo, rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m2d), m2o, rtol=0, atol=1e-5)

    # The float path is the scale-invariant cross-check: native integer
    # features sit at the fixed-point quantisation distance from it.
    from pqa2_tpu.golden.vif import vif_features

    ff = vif_features(ref[0].astype(np.float64) / 4.0,
                      dist[0].astype(np.float64) / 4.0)
    assert np.max(np.abs(np.array(fo) - np.array(ff))) < 3e-3


def test_native_10bit_shifted_8bit_consistency(rng):
    """A 10-bit clip that is exactly 8-bit<<2 scores like the 8-bit clip —
    the native schedule only widens rounding granularity (sub-1e-3)."""
    from pqa2_tpu.golden.vif_int import vif_features_int

    ref8 = rng.integers(0, 256, (64, 80)).astype(np.uint8)
    dist8 = np.clip(ref8.astype(np.int16)
                    + rng.integers(-12, 13, ref8.shape), 0, 255
                    ).astype(np.uint8)
    f8 = vif_features_int(ref8, dist8)
    f10 = vif_features_int(ref8.astype(np.uint16) << 2,
                           dist8.astype(np.uint16) << 2, bit_depth=10)
    np.testing.assert_allclose(f10, f8, rtol=0, atol=1e-3)


def test_10bit_e2e_y4m_native_pin(tmp_path, rng):
    """End-to-end 10-bit y4m pair through the streaming scorer on the
    integer (native-grid) default: sane scores, pinned against the float
    family at the fixed-point distance."""
    n, h, w = 3, 48, 64
    base = rng.uniform(64, 940, size=(n, h, w))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    ref10 = np.round(base).astype(np.uint16)
    dist10 = np.clip(ref10.astype(np.int32)
                     + rng.integers(-8, 9, ref10.shape), 0, 1023
                     ).astype(np.uint16)
    pr, pd = str(tmp_path / "r10.y4m"), str(tmp_path / "d10.y4m")
    write_y4m(pr, [_planes(f, 10) for f in ref10], colorspace="C420p10")
    write_y4m(pd, [_planes(f, 10) for f in dist10], colorspace="C420p10")

    s_int = stream_score(pr, pd, with_psnr=False, with_ssim=False)
    s_f = stream_score(pr, pd, with_psnr=False, with_ssim=False,
                       precision="float")
    assert np.all(np.asarray(s_int.vmaf) > 20.0)
    assert np.all(np.asarray(s_int.vmaf) <= 100.0)
    np.testing.assert_allclose(s_int.vmaf, s_f.vmaf, rtol=0, atol=0.35)


@pytest.mark.parametrize("depth", [14, 16])
def test_native_deep_integer_path_oracle_vs_device(rng, depth):
    """Depths beyond 12 run natively since round 4 (no 12-bit pre-round):
    13..15-bit ADM folds the surplus into level 0's first-pass rounding
    shift in plain i32; depth 16 splits that accumulator. VIF/motion at
    in_q=8 reuse the proven Q8 decimated-scale domain. Oracle and device
    twin must agree per feature at every depth."""
    import jax.numpy as jnp

    from pqa2_tpu.golden.adm_int import adm_features_int
    from pqa2_tpu.golden.motion_int import motion_features_int as motion_o
    from pqa2_tpu.golden.vif_int import vif_features_int
    from pqa2_tpu.ops.adm_int import adm_features_int_batched
    from pqa2_tpu.ops.motion_int import motion_features_int as motion_d
    from pqa2_tpu.ops.vif_int import vif_features_int_batched

    peak = (1 << depth) - 1
    ref = rng.integers(0, peak + 1, (3, 72, 96)).astype(np.uint16)
    dist = np.clip(
        ref.astype(np.int32) + rng.integers(-40 << (depth - 10),
                                            (40 << (depth - 10)) + 1,
                                            ref.shape),
        0, peak).astype(np.uint16)

    fo = vif_features_int(ref[0], dist[0], bit_depth=depth)
    fd = np.asarray(vif_features_int_batched(
        jnp.asarray(ref[:1], jnp.uint32), jnp.asarray(dist[:1], jnp.uint32),
        bit_depth=depth))[0]
    np.testing.assert_allclose(fd, fo, rtol=0, atol=2e-6)

    ao = adm_features_int(ref[0], dist[0], bit_depth=depth)[0]
    ad = float(np.asarray(adm_features_int_batched(
        jnp.asarray(ref[:1], jnp.uint32), jnp.asarray(dist[:1], jnp.uint32),
        bit_depth=depth))[0])
    np.testing.assert_allclose(ad, ao, rtol=0, atol=1e-6)

    mo, m2o = motion_o(ref, bit_depth=depth)
    md, m2d = motion_d(jnp.asarray(ref, jnp.uint32), bit_depth=depth)
    np.testing.assert_allclose(np.asarray(md), mo, rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m2d), m2o, rtol=0, atol=1e-5)

    # Scale-invariance cross-check against the float family.
    from pqa2_tpu.golden.vif import vif_features

    div = float(1 << (depth - 8))
    ff = vif_features(ref[0].astype(np.float64) / div,
                      dist[0].astype(np.float64) / div)
    assert np.max(np.abs(np.array(fo) - np.array(ff))) < 3e-3


def test_native_16bit_shifted_8bit_consistency(rng):
    """A 16-bit clip that is exactly 8-bit<<8 scores like the 8-bit clip."""
    from pqa2_tpu.golden.adm_int import adm_features_int
    from pqa2_tpu.golden.vif_int import vif_features_int

    ref8 = rng.integers(0, 256, (64, 80)).astype(np.uint8)
    dist8 = np.clip(ref8.astype(np.int16)
                    + rng.integers(-12, 13, ref8.shape), 0, 255
                    ).astype(np.uint8)
    f8 = vif_features_int(ref8, dist8)
    f16 = vif_features_int(ref8.astype(np.uint32) << 8,
                           dist8.astype(np.uint32) << 8, bit_depth=16)
    np.testing.assert_allclose(f16, f8, rtol=0, atol=1e-3)
    a8 = adm_features_int(ref8, dist8)[0]
    a16 = adm_features_int(ref8.astype(np.uint32) << 8,
                           dist8.astype(np.uint32) << 8, bit_depth=16)[0]
    np.testing.assert_allclose(a16, a8, rtol=0, atol=1e-3)


def test_16bit_e2e_y4m_native_pin(tmp_path, rng):
    """End-to-end 16-bit y4m pair (VERDICT round-3 item 3): native-grid
    integer default produces sane scores pinned against the float family;
    PSNR pools at the native 65535 peak."""
    n, h, w = 3, 48, 64
    base = rng.uniform(4096, 60000, size=(n, h, w))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    ref16 = np.round(base).astype(np.uint16)
    dist16 = np.clip(ref16.astype(np.int32)
                     + rng.integers(-512, 513, ref16.shape), 0, 65535
                     ).astype(np.uint16)
    pr, pd = str(tmp_path / "r16.y4m"), str(tmp_path / "d16.y4m")
    write_y4m(pr, [_planes(f, 16) for f in ref16], colorspace="C420p16")
    write_y4m(pd, [_planes(f, 16) for f in dist16], colorspace="C420p16")

    s_int = stream_score(pr, pd, with_ssim=True)
    s_f = stream_score(pr, pd, with_psnr=False, with_ssim=False,
                       precision="float")
    assert s_int.peak == 65535.0
    assert np.all(np.asarray(s_int.vmaf) > 20.0)
    assert np.all(np.asarray(s_int.vmaf) <= 100.0)
    np.testing.assert_allclose(s_int.vmaf, s_f.vmaf, rtol=0, atol=0.35)


def test_geometry_mismatch_is_descriptive(tmp_path, rng):
    ref = rng.integers(0, 255, (2, 48, 64)).astype(np.uint8)
    dist = rng.integers(0, 255, (2, 32, 48)).astype(np.uint8)
    pr, pd = str(tmp_path / "r.y4m"), str(tmp_path / "d.y4m")
    write_y4m(pr, [_planes(f) for f in ref])
    write_y4m(pd, [_planes(f) for f in dist])
    with pytest.raises(ValueError, match="resolution mismatch"):
        stream_score(pr, pd)


def test_streaming_subsample_skips_compute(tmp_path, rng):
    """n_subsample=k must do ~1/k the feature work: the scorer sees only
    ceil(n/k) frames (frame_cb totals) and labels them with source indices."""
    n = 20
    ref = rng.integers(16, 235, (n, 48, 64)).astype(np.uint8)
    dist = np.clip(ref.astype(np.int16) + rng.integers(-6, 7, ref.shape),
                   0, 255).astype(np.uint8)
    pr, pd = str(tmp_path / "r.y4m"), str(tmp_path / "d.y4m")
    write_y4m(pr, [_planes(f) for f in ref])
    write_y4m(pd, [_planes(f) for f in dist])

    seen = []
    s = stream_score(pr, pd, subsample=5, frame_cb=seen.append,
                     with_psnr=False, with_ssim=False)
    assert s.n_frames == 4  # ceil(20/5)
    assert sum(seen) == 4
    assert s.frame_step == 5
    # Full run for comparison: sampled scores match the full run's every-5th
    # features except motion (computed between sampled frames, per libvmaf).
    full = stream_score(pr, pd, with_psnr=False, with_ssim=False)
    np.testing.assert_allclose(s.features["adm2"], full.features["adm2"][::5],
                               atol=1e-5)


def test_ssim_10bit_uses_native_max_constants(rng):
    """ffmpeg's >8-bit ssim path scales c1/c2 with the native max
    (ssim_end1x, max=1023) and sums native codes; the device path must
    reproduce it from 8-bit-scale inputs via constants/div^2 — NOT by
    reusing the 8-bit 416/235963 macros."""
    from pqa2_tpu.golden.ssim import ssim_constants, ssim_plane
    from pqa2_tpu.ops.ssim import scaled_ssim_constants, ssim_plane_batched

    # ffmpeg's int64 rounding of .01^2*max^2*64 (+63x for c2).
    assert ssim_constants(8) == (416, 235963)
    assert ssim_constants(10) == (6698, 3797644)
    assert ssim_constants(12) == (107322, 60851438)
    c1, c2 = scaled_ssim_constants(10)
    assert c1 == 6698 / 16 and c2 == 3797644 / 16

    n, h, w = 3, 96, 128
    ref = rng.integers(0, 1024, (n, h, w)).astype(np.uint16)
    dist = np.clip(ref.astype(np.int32) + rng.integers(-33, 34, ref.shape),
                   0, 1023).astype(np.uint16)
    want = np.array([ssim_plane(ref[i], dist[i], bit_depth=10)
                     for i in range(n)])
    got = np.asarray(ssim_plane_batched(ref.astype(np.float32) / 4.0,
                                        dist.astype(np.float32) / 4.0,
                                        bit_depth=10))
    np.testing.assert_allclose(got, want, atol=2e-6)
    # The depth-10 constants are a real (if small) effect: identical codes
    # still give exactly 1, and the wrong-constant result differs.
    ident = np.asarray(ssim_plane_batched(ref.astype(np.float32) / 4.0,
                                          ref.astype(np.float32) / 4.0,
                                          bit_depth=10))
    np.testing.assert_allclose(ident, 1.0, atol=1e-7)
    got8 = np.asarray(ssim_plane_batched(ref.astype(np.float32) / 4.0,
                                         dist.astype(np.float32) / 4.0))
    assert np.abs(got8 - want).max() > np.abs(got - want).max()
