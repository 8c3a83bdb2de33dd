"""Checked-in regression goldens (SURVEY.md section 4, item 1).

tests/goldens/regression_golden.json pins per-frame feature values and VMAF
scores computed once from the float64 oracle chain on a fixed synthetic clip.
Unlike the live oracle-comparison tests (which would drift along with shared
helper code), these literals catch any numeric change in the pipeline.

Clip generator (never change): np.random.default_rng(20260816), 4 frames of
72x96 — base uniform(16,235) + per-frame drift uniform(-18,18) + N(0,9),
two 5-point smoothing passes, rounded; dist = ref + N(0,5), rounded.
"""

import json
import os

import numpy as np
import pytest

from pqa2_tpu.pipeline.scoring import score_clip

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "regression_golden.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def clip(golden):
    rng = np.random.default_rng(20260816)
    n, h, w = golden["n"], golden["h"], golden["w"]
    base = (rng.uniform(16, 235, (1, h, w))
            + rng.uniform(-18, 18, (n, 1, 1)) + rng.normal(0, 9, (n, h, w)))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    ref = np.round(np.clip(base, 0, 255))
    dist = np.round(np.clip(ref + rng.normal(0, 5, ref.shape), 0, 255))
    return ref.astype(np.float32), dist.astype(np.float32)


@pytest.mark.parametrize("model_name", [
    "vmaf_v0.6.1", "vmaf_v0.6.1neg", "vmaf_4k_v0.6.1", "vmaf_float_v0.6.1",
])
def test_vmaf_scores_pinned(golden, clip, model_name):
    ref, dist = clip
    res = score_clip(ref, dist, model=model_name, chunk_size=4,
                     precision="float")
    want = np.asarray(golden["vmaf"][model_name])
    np.testing.assert_allclose(res.vmaf, want, rtol=0, atol=0.01)


@pytest.mark.parametrize("model_name", [
    "vmaf_v0.6.1", "vmaf_v0.6.1neg", "vmaf_4k_v0.6.1",
])
def test_vmaf_integer_scores_pinned(golden, clip, model_name):
    """Integer fixed-point path pins (VERDICT round-1 item 2): per-frame
    scores of the default extractor family for integer models."""
    ref, dist = clip
    res = score_clip(ref, dist, model=model_name, chunk_size=4)
    want = np.asarray(golden["vmaf_integer"][model_name])
    np.testing.assert_allclose(res.vmaf, want, rtol=0, atol=0.01)


def test_integer_features_pinned(golden, clip):
    ref, dist = clip
    res = score_clip(ref, dist, chunk_size=4, precision="integer")
    for i, fr in enumerate(golden["frames_integer"]):
        assert res.features["adm2"][i] == pytest.approx(fr["adm2"], abs=2e-4)
        assert res.features["motion2"][i] == pytest.approx(fr["motion2"], abs=1e-3)
        for s in range(4):
            assert res.features[f"vif_scale{s}"][i] == pytest.approx(
                fr["vif"][s], abs=2e-4), (i, s)


def test_features_pinned(golden, clip):
    ref, dist = clip
    res = score_clip(ref, dist, chunk_size=4, precision="float")
    for i, fr in enumerate(golden["frames"]):
        assert res.features["adm2"][i] == pytest.approx(fr["adm2"], abs=2e-4)
        assert res.features["motion2"][i] == pytest.approx(fr["motion2"], abs=1e-3)
        for s in range(4):
            assert res.features[f"vif_scale{s}"][i] == pytest.approx(
                fr["vif"][s], abs=2e-4), (i, s)


def test_ssim_psnr_pinned(golden, clip):
    import jax.numpy as jnp

    from pqa2_tpu.ops.psnr import psnr_planes_batched
    from pqa2_tpu.ops.ssim import ssim_plane_batched

    ref, dist = clip
    ssim = np.asarray(ssim_plane_batched(jnp.asarray(ref), jnp.asarray(dist)))
    ps = psnr_planes_batched(ref[:, :, :], ref[:, :36, :48], ref[:, :36, :48],
                             dist[:, :, :], dist[:, :36, :48], dist[:, :36, :48])
    psnr_y = np.asarray(ps["psnr_y"])
    for i, fr in enumerate(golden["frames"]):
        assert ssim[i] == pytest.approx(fr["ssim_y"], abs=1e-5)
        assert psnr_y[i] == pytest.approx(fr["psnr_y"], abs=1e-3)
