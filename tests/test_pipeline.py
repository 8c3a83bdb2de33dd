"""End-to-end pipeline tests (SURVEY.md section 4, items 1 & 4).

The parity anchor: per-frame VMAF from the jnp pipeline must stay within the
0.01 budget of the float64 oracle chain (BASELINE.md target, proxy for the
libvmaf golden which has no binary in this environment).
"""

import json

import numpy as np
import pytest

from pqa2_tpu.golden import adm as g_adm
from pqa2_tpu.golden import motion as g_motion
from pqa2_tpu.golden import vif as g_vif
from pqa2_tpu.models import get_model
from pqa2_tpu.models.svr import ScorePredictor
from pqa2_tpu.pipeline import (
    clip_scores_to_json,
    score_clip,
    score_planes,
    write_vmaf_json,
)
from pqa2_tpu.pipeline.scoring import extract_clip_features, pool_metric


def _clip(rng, n=6, h=72, w=96, noise=5.0):
    base = rng.uniform(16, 235, size=(1, h, w))
    drift = rng.uniform(-20, 20, size=(n, 1, 1))
    ref = np.clip(base + drift + rng.normal(0, 10, (n, h, w)), 0, 255)
    # Smooth for natural-image statistics.
    for _ in range(2):
        ref = (ref + np.roll(ref, 1, -1) + np.roll(ref, -1, -1)
               + np.roll(ref, 1, -2) + np.roll(ref, -1, -2)) / 5.0
    ref = np.round(ref).astype(np.float32)
    dist = np.clip(ref + rng.normal(0, noise, ref.shape), 0, 255)
    return ref, np.round(dist).astype(np.float32)


def _oracle_features(ref, dist, model):
    """Float64 oracle feature chain in the model's canonical order."""
    gain_vif = model.feature_opt("vif_scale0", "vif_enhn_gain_limit", float("inf"))
    gain_adm = model.feature_opt("adm2", "adm_enhn_gain_limit", 100.0)
    variant = "default" if model.uses_integer_features else "classic"
    _, motion2 = g_motion.motion_features(ref.astype(np.float64))
    rows = []
    for i in range(ref.shape[0]):
        vif = g_vif.vif_features(ref[i], dist[i], gain_limit=gain_vif, variant=variant)
        adm2, _, _, _ = g_adm.adm_features(ref[i], dist[i], gain_limit=gain_adm)
        feat = {"adm2": adm2, "motion2": motion2[i],
                "vif_scale0": vif[0], "vif_scale1": vif[1],
                "vif_scale2": vif[2], "vif_scale3": vif[3]}
        rows.append([feat[k] for k in model.feature_names])
    return np.asarray(rows, dtype=np.float64)


@pytest.mark.parametrize("model_name", ["vmaf_v0.6.1", "vmaf_v0.6.1neg", "vmaf_4k_v0.6.1"])
def test_parity_vs_oracle_chain(model_name):
    """jnp pipeline within the 0.01/frame budget of the float64 chain.

    Deterministic data: at the toy sizes tests use, f32 relative error in
    the decimated VIF scales is inflated ~30x vs real resolutions (see
    test_parity_realistic_resolution for the representative bound)."""
    rng = np.random.default_rng(1234)
    ref, dist = _clip(rng, n=5, h=108, w=144)
    model = get_model(model_name)
    got = score_clip(ref, dist, model=model_name, chunk_size=3,
                     precision="float")
    want = np.asarray(ScorePredictor(model)(_oracle_features(ref, dist, model)))
    np.testing.assert_allclose(got.vmaf, want, rtol=0, atol=0.01)


def test_parity_realistic_resolution():
    """At qHD (quarter-1080p) the budget must hold with wide margin; this is
    the representative regime for the 1080p/4K targets (BASELINE.md)."""
    rng = np.random.default_rng(7)
    ref, dist = _clip(rng, n=2, h=540, w=960, noise=5.0)
    model = get_model("vmaf_v0.6.1")
    got = score_clip(ref, dist, model=model, chunk_size=2, precision="float")
    want = np.asarray(ScorePredictor(model)(_oracle_features(ref, dist, model)))
    np.testing.assert_allclose(got.vmaf, want, rtol=0, atol=0.002)
    # The default (model-driven) path for this integer model is the
    # fixed-point emulation; its deviation from the float chain is the
    # quantisation magnitude (pinned in test_integer.py), bounded here.
    got_int = score_clip(ref, dist, model=model, chunk_size=2)
    np.testing.assert_allclose(got_int.vmaf, want, rtol=0, atol=0.1)


def test_chunked_equals_whole(rng):
    ref, dist = _clip(rng, n=7)
    whole = extract_clip_features(ref, dist, chunk_size=7)
    chunked = extract_clip_features(ref, dist, chunk_size=3)
    for k in whole:
        np.testing.assert_allclose(chunked[k], whole[k], rtol=0, atol=1e-5,
                                   err_msg=k)


def test_identity_scores_high(rng):
    ref, _ = _clip(rng, n=4)
    res = score_clip(ref, ref)
    assert res.n_frames == 4
    assert np.all(res.vmaf >= 90.0)
    assert np.all(res.vmaf <= 100.0)
    # f32 decouple rounds (tb/ob)*ob != tb, so identity adm2 is 1 +- ~1e-5.
    np.testing.assert_allclose(res.features["adm2"], 1.0, atol=1e-4)
    np.testing.assert_allclose(res.features["vif_scale3"], 1.0, atol=1e-4)


def test_subsample(rng):
    ref, dist = _clip(rng, n=8)
    res = score_clip(ref, dist, subsample=2)
    assert res.n_frames == 4


def test_bootstrap_model(rng):
    ref, dist = _clip(rng, n=3)
    res = score_clip(ref, dist, model="vmaf_b_v0.6.3")
    assert res.bootstrap is not None
    assert res.bootstrap.shape[0] == 21
    pooled = res.pooled_all()
    assert "vmaf_ci_p95_lo" in pooled
    assert pooled["vmaf_ci_p95_lo"]["mean"] <= pooled["vmaf_ci_p95_hi"]["mean"]


def test_pooling_methods():
    v = np.array([10.0, 20.0, 40.0])
    assert pool_metric(v, "mean") == pytest.approx(70.0 / 3)
    assert pool_metric(v, "min") == 10.0
    assert pool_metric(v, "max") == 40.0
    hm = pool_metric(v, "harmonic_mean")
    assert 10.0 < hm < 70.0 / 3


def test_score_planes_and_json(rng, tmp_path):
    n, h, w = 3, 48, 64
    ref_y, dist_y = _clip(rng, n=n, h=h, w=w)
    mk = lambda y: [
        {"y": y[i].astype(np.uint8),
         "u": np.full((h // 2, w // 2), 128, np.uint8),
         "v": np.full((h // 2, w // 2), 128, np.uint8)}
        for i in range(n)
    ]
    res = score_planes(mk(ref_y), mk(dist_y))
    assert res.psnr is not None and res.ssim is not None
    assert res.psnr["psnr_y"].shape == (n,)

    path = tmp_path / "out_vmaf.json"
    obj = write_vmaf_json(res, str(path), fps=30.0)
    loaded = json.loads(path.read_text())
    assert loaded["pooled_metrics"]["vmaf"]["mean"] == pytest.approx(
        float(res.vmaf.mean()), abs=1e-4
    )
    assert len(loaded["frames"]) == n
    fr = loaded["frames"][0]["metrics"]
    assert "vmaf" in fr and "integer_adm2" in fr and "psnr_y" in fr
    # chroma planes identical -> psnr_u hits the +inf cap representation
    assert fr["psnr_u"] == 1e9


def test_unknown_model_errors():
    with pytest.raises(KeyError):
        get_model("not_a_model")


def test_float_model_json_prefix(rng, tmp_path):
    """Float models (classic VIF path) must emit float_*-prefixed feature
    keys like real libvmaf logs — derived from model.uses_integer_features."""
    ref, dist = _clip(rng, n=2)
    res = score_clip(ref, dist, model="vmaf_float_v0.6.1")
    assert res.uses_integer_features is False
    obj = clip_scores_to_json(res)
    fr = obj["frames"][0]["metrics"]
    assert "float_adm2" in fr and "integer_adm2" not in fr
    assert "float_vif_scale0" in fr


def test_subsample_frame_numbers(rng):
    """frameNum in the JSON log reflects source-frame indices under
    n_subsample (libvmaf labels sampled frames with their true index)."""
    ref, dist = _clip(rng, n=8)
    res = score_clip(ref, dist, subsample=3)
    assert res.frame_step == 3
    obj = clip_scores_to_json(res)
    assert [f["frameNum"] for f in obj["frames"]] == [0, 3, 6]
