"""Sharded scoring on the virtual 8-device CPU mesh (SURVEY.md section 4, item 6)."""

import jax
import numpy as np
import pytest

from pqa2_tpu.parallel import (
    frame_sharding,
    make_mesh,
    make_sharded_scorer,
    shard_frames,
)
from pqa2_tpu.pipeline.scoring import score_clip


def _clip(rng, n=8, h=64, w=96):
    base = rng.uniform(16, 235, size=(n, h, w))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    ref = np.round(base).astype(np.float32)
    dist = np.clip(ref + rng.normal(0, 4, ref.shape), 0, 255).astype(np.float32)
    return ref, dist


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(n_data=4, n_space=2)
    assert mesh2.shape == {"data": 4, "space": 2}
    with pytest.raises(ValueError):
        make_mesh(n_data=16, n_space=2)


def test_sharded_scores_match_single_device(rng):
    ref, dist = _clip(rng)
    want = score_clip(ref, dist, chunk_size=8).vmaf

    mesh = make_mesh(n_data=4, n_space=2)
    step = make_sharded_scorer(mesh)
    out = step(shard_frames(ref, mesh), shard_frames(dist, mesh))
    got = np.asarray(out["vmaf"])
    # Identical math either way; sharding only changes reduction grouping.
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-3)


def test_sharded_data_only_mesh(rng):
    ref, dist = _clip(rng, n=8)
    mesh = make_mesh(n_data=8, n_space=1)
    step = make_sharded_scorer(mesh, with_psnr_ssim=True)
    out = step(shard_frames(ref, mesh), shard_frames(dist, mesh))
    assert np.asarray(out["vmaf"]).shape == (8,)
    assert np.asarray(out["psnr_y"]).shape == (8,)
    assert np.all(np.asarray(out["ssim_y"]) <= 1.0)


def test_sharded_scorer_native_10bit(rng):
    """The pjit scorer threads bit_depth: integer features run on the
    native grid, PSNR uses the native peak on the 8-bit scale (1023/4)
    and SSIM ffmpeg's depth-10 constants — stream_score's rules."""
    from pqa2_tpu.ops.psnr import psnr_from_mse_np
    from pqa2_tpu.ops.ssim import ssim_plane_batched

    ref, dist = _clip(rng, n=8)
    # True 10-bit codes (not on the 8-bit grid), presented on the 8-bit
    # scale per the pipeline convention.
    ref10 = np.clip(np.round(ref * 4) + rng.integers(-1, 2, ref.shape),
                    0, 1023).astype(np.float32)
    dist10 = np.clip(np.round(dist * 4) + rng.integers(-1, 2, ref.shape),
                     0, 1023).astype(np.float32)
    r8, d8 = ref10 / 4.0, dist10 / 4.0

    mesh = make_mesh(n_data=8, n_space=1)
    step = make_sharded_scorer(mesh, with_psnr_ssim=True, bit_depth=10)
    out = step(shard_frames(r8, mesh), shard_frames(d8, mesh))

    want_ssim = np.asarray(ssim_plane_batched(r8, d8, bit_depth=10))
    np.testing.assert_allclose(np.asarray(out["ssim_y"]), want_ssim,
                               rtol=0, atol=1e-5)
    mse8 = np.mean((r8 - d8) ** 2, axis=(-2, -1))
    want_psnr = psnr_from_mse_np(mse8, max_value=1023.0 / 4.0)
    np.testing.assert_allclose(np.asarray(out["psnr_y"]), want_psnr,
                               rtol=0, atol=1e-3)
    # Integer features on the native grid: match single-device scoring
    # at the same depth.
    whole = score_clip(r8, d8, chunk_size=8, bit_depth=10)
    np.testing.assert_allclose(np.asarray(out["vmaf"]), whole.vmaf,
                               rtol=0, atol=5e-3)


def test_motion_halo_across_shards(rng):
    """motion2 must see true neighbour frames across device boundaries."""
    ref, dist = _clip(rng, n=8)
    whole = score_clip(ref, dist, chunk_size=8).features["motion2"]

    mesh = make_mesh(n_data=8, n_space=1)  # every frame on its own device
    step = make_sharded_scorer(mesh)
    out = step(shard_frames(ref, mesh), shard_frames(dist, mesh))
    np.testing.assert_allclose(
        np.asarray(out["motion2"]), whole, rtol=0, atol=1e-4
    )


def test_multihost_helpers_single_host():
    from pqa2_tpu.parallel.multihost import (
        gather_summaries, initialize, shard_clip_list,
    )

    assert initialize() is False  # no coordinator configured -> no-op
    clips = [f"clip{i}" for i in range(7)]
    assert shard_clip_list(clips) == clips  # single process owns everything
    assert shard_clip_list(clips, process_id=1, num_processes=3) == [
        "clip1", "clip4"]
    summaries = [{"clip": "a", "vmaf": 90.0}]
    assert gather_summaries(summaries) == summaries


def test_shardmap_scorer_matches_single_device():
    """The shard_map (Pallas-compatible) scorer must match single-device
    scoring exactly — including motion halos across every shard edge and the
    global clip-start/end semantics."""
    import numpy as np
    import jax.numpy as jnp

    from pqa2_tpu.models.registry import get_model
    from pqa2_tpu.models.svr import ScorePredictor
    from pqa2_tpu.parallel import make_mesh, make_shardmap_scorer, shard_frames
    from pqa2_tpu.pipeline.features import (
        extract_features_batched,
        model_feature_params,
    )

    rng = np.random.default_rng(0)
    ref = rng.integers(0, 255, (16, 72, 96)).astype(np.float32)
    dist = np.clip(ref + rng.normal(0, 5, ref.shape), 0, 255).astype(np.float32)

    mesh = make_mesh(n_data=8, n_space=1)
    step = make_shardmap_scorer(mesh, "vmaf_v0.6.1")
    out = step(shard_frames(ref, mesh), shard_frames(dist, mesh))
    vm = np.asarray(out["vmaf"])

    m = get_model("vmaf_v0.6.1")
    feats = extract_features_batched(
        jnp.asarray(ref), jnp.asarray(dist), **model_feature_params(m))
    x = jnp.stack([feats[k] for k in m.feature_names], axis=-1)
    vm1 = np.asarray(ScorePredictor(m)(x))
    np.testing.assert_allclose(vm, vm1, rtol=0, atol=1e-3)
    for k in feats:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(feats[k]), rtol=0, atol=1e-4,
            err_msg=k)


def test_sharded_batch_suite_matches_single_device(tmp_path):
    """Ladder sweep over the 8-device CPU mesh (pipeline/batch.py mesh
    mode): per-clip VMAF equals the single-device scorer, padding (N not
    divisible by the data axis) handled, summary notes per-device fps."""
    import numpy as np

    from pqa2_tpu.io.y4m import write_y4m
    from pqa2_tpu.pipeline.batch import run_batch_suite

    rng = np.random.default_rng(3)
    n, h, w = 11, 48, 64  # 11 frames: exercises the pad path (8-dev mesh)
    ref = rng.integers(16, 235, (n, h, w)).astype(np.uint8)
    c = np.full((h // 2, w // 2), 128, np.uint8)
    mk = lambda ys: [{"y": f, "u": c, "v": c} for f in ys]
    ref_p = str(tmp_path / "ref.y4m")
    write_y4m(ref_p, mk(ref))
    entries = []
    for q in (4, 12):
        d = np.clip(ref.astype(np.int16) + rng.integers(-q, q + 1, ref.shape),
                    0, 255).astype(np.uint8)
        p = str(tmp_path / f"rung{q}.y4m")
        write_y4m(p, mk(d))
        entries.append({"reference": ref_p, "distorted": p,
                        "name": f"rung{q}"})

    mesh = make_mesh(n_data=8, n_space=1)
    out_dir = str(tmp_path / "suite")
    summary = run_batch_suite({"entries": entries}, out_dir, mesh=mesh)
    assert summary["mesh_devices"] == 8
    assert summary["n_clips"] == 2
    assert summary["total_frames"] == 2 * n
    assert summary["aggregate_fps_per_device"] is not None

    # Equivalence: single-device score_clip on the same pairs.
    import json

    for row, entry in zip(summary["clips"], entries):
        assert "error" not in row, row
        from pqa2_tpu.io.y4m import read_y4m

        d = np.stack([f["y"] for f in read_y4m(entry["distorted"])[1]])
        single = score_clip(ref.astype(np.float32), d.astype(np.float32),
                            model="vmaf_v0.6.1")
        np.testing.assert_allclose(row["vmaf"],
                                   float(np.mean(single.vmaf)), atol=2e-3)
        with open(row["json_path"]) as f:
            doc = json.load(f)
        assert len(doc["frames"]) == n
        per_frame = [fr["metrics"]["vmaf"] for fr in doc["frames"]]
        np.testing.assert_allclose(per_frame, single.vmaf, atol=5e-3)
    # Harsher rung scores lower.
    assert summary["clips"][1]["vmaf"] < summary["clips"][0]["vmaf"]


def test_sharded_batch_suite_10bit_and_per_entry_model(tmp_path):
    """Mesh sweep depth handling: a 10-bit pair scores like stream_score
    (f32 8-bit scale + native-grid bit_depth, not raw uint16 codes), and a
    per-entry float model emits float_*-prefixed JSON keys."""
    import json

    import numpy as np

    from pqa2_tpu.io.y4m import write_y4m
    from pqa2_tpu.pipeline.batch import run_batch_suite
    from pqa2_tpu.pipeline.streaming import stream_score

    rng = np.random.default_rng(5)
    n, h, w = 8, 48, 64
    base = rng.uniform(16, 235, size=(n, h, w))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    ref8 = np.round(base).astype(np.uint8)
    dist8 = np.clip(ref8.astype(np.int16) + rng.integers(-6, 7, ref8.shape),
                    0, 255).astype(np.uint8)

    def planes(y, depth=8):
        c = np.full((h // 2, w // 2), 128 << (depth - 8),
                    np.uint16 if depth > 8 else np.uint8)
        return {"y": y, "u": c, "v": c}

    p10r = str(tmp_path / "r10.y4m")
    p10d = str(tmp_path / "d10.y4m")
    write_y4m(p10r, [planes(f.astype(np.uint16) << 2, 10) for f in ref8],
              colorspace="C420p10")
    write_y4m(p10d, [planes(f.astype(np.uint16) << 2, 10) for f in dist8],
              colorspace="C420p10")
    p8r, p8d = str(tmp_path / "r8.y4m"), str(tmp_path / "d8.y4m")
    write_y4m(p8r, [planes(f) for f in ref8])
    write_y4m(p8d, [planes(f) for f in dist8])

    mesh = make_mesh(n_data=8, n_space=1)
    summary = run_batch_suite(
        {"entries": [
            {"reference": p10r, "distorted": p10d, "name": "tenbit"},
            {"reference": p8r, "distorted": p8d, "name": "floatmodel",
             "model": "vmaf_float_v0.6.1"},
        ]},
        str(tmp_path / "suite"), mesh=mesh)

    row10 = summary["clips"][0]
    assert "error" not in row10, row10
    want = stream_score(p10r, p10d, with_psnr=False, with_ssim=False)
    np.testing.assert_allclose(row10["vmaf"], float(np.mean(want.vmaf)),
                               atol=2e-3)
    with open(row10["json_path"]) as f:
        doc = json.load(f)
    np.testing.assert_allclose(
        [fr["metrics"]["vmaf"] for fr in doc["frames"]], want.vmaf, atol=5e-3)

    rowf = summary["clips"][1]
    assert "error" not in rowf, rowf
    with open(rowf["json_path"]) as f:
        docf = json.load(f)
    keys = docf["frames"][0]["metrics"]
    assert "float_adm2" in keys and "integer_adm2" not in keys
