"""Batch throughput suite: multi-clip codec/bitrate ladder scoring.

BASELINE.json config 5: "multi-clip codec/bitrate ladder scored end-to-end
with report_generator HTML/JSON reports". Each ladder entry is scored through
the same VMAFAnalyzer engine; per-clip JSON/HTML artifacts land in one suite
directory plus a combined summary (the reference's bulk-export analog,
app/ui/tabs/results_tab.py:3644-3696).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, List, Optional, Sequence


def run_batch_suite(
    spec: Dict,
    out_dir: str,
    model: str = "vmaf_v0.6.1",
    log: Optional[Callable[[str], None]] = None,
    mesh=None,
) -> Dict:
    """spec: {"pairs": [[ref, dist], ...]} or
    {"entries": [{"reference": .., "distorted": .., "name": .., "model": ..}]}.

    Returns a summary dict (also written to <out_dir>/batch_summary.json).

    ``mesh``: a jax.sharding.Mesh with all devices on the "data" axis —
    ladder entries are then scored through the shard_map scorer (frames
    sharded across chips, one compiled program reused across equal-geometry
    clips; parallel/scoring.py:score_clip_sharded). VMAF/feature JSON
    artifacts keep the same schema; the separate-pass PSNR/SSIM columns
    are skipped on the sharded sweep (ladder ranking is a VMAF metric).
    """
    if mesh is not None:
        return _run_batch_suite_sharded(spec, out_dir, model=model,
                                        log=log, mesh=mesh)
    from pqa2_tpu.app.report_generator import ReportGenerator
    from pqa2_tpu.app.vmaf_analyzer import VMAFAnalyzer

    log = log or (lambda m: None)
    entries: List[Dict] = []
    for pair in spec.get("pairs", []):
        entries.append({"reference": pair[0], "distorted": pair[1]})
    entries.extend(spec.get("entries", []))
    if not entries:
        raise ValueError("batch spec has no pairs/entries")

    os.makedirs(out_dir, exist_ok=True)
    analyzer = VMAFAnalyzer()
    gen = ReportGenerator()
    rows: List[Dict] = []
    t_start = time.perf_counter()
    total_frames = 0

    for i, entry in enumerate(entries):
        name = entry.get("name") or os.path.splitext(
            os.path.basename(entry["distorted"])
        )[0]
        log(f"[{i + 1}/{len(entries)}] scoring {name}")
        clip_dir = os.path.join(out_dir, name)
        os.makedirs(clip_dir, exist_ok=True)
        analyzer.set_output_directory(clip_dir)
        analyzer.set_test_name(name)
        t0 = time.perf_counter()
        results = analyzer.analyze_videos(
            entry["reference"], entry["distorted"],
            model=entry.get("model", model),
        )
        dt = time.perf_counter() - t0
        if results is None:
            rows.append({"name": name, "error": "analysis failed"})
            continue
        html = gen.generate_html_report(
            results, os.path.join(clip_dir, f"{name}_report.html")
        )
        gen.export_csv(results, os.path.join(clip_dir, f"{name}_frames.csv"))
        total_frames += results["frame_count"]
        rows.append({
            "name": name,
            "vmaf": results["vmaf_score"],
            "psnr": results["psnr_score"],
            "ssim": results["ssim_score"],
            "frames": results["frame_count"],
            "seconds": round(dt, 3),
            "fps": round(results["frame_count"] / dt, 2) if dt > 0 else None,
            "json_path": results["json_path"],
            "html_report": html,
        })

    wall = time.perf_counter() - t_start
    summary = {
        "model": model,
        "clips": rows,
        "n_clips": len(entries),
        "total_frames": total_frames,
        "wall_seconds": round(wall, 3),
        "aggregate_fps": round(total_frames / wall, 2) if wall > 0 else None,
    }
    with open(os.path.join(out_dir, "batch_summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=str)
    return summary


def _run_batch_suite_sharded(
    spec: Dict,
    out_dir: str,
    mesh,
    model: str = "vmaf_v0.6.1",
    log: Optional[Callable[[str], None]] = None,
) -> Dict:
    """Ladder sweep over a device mesh (SURVEY section 2.4 DP; VERDICT
    round-2 item 9): decode on host, shard frames over the mesh's data
    axis, reuse ONE compiled shard_map program across equal-geometry
    clips."""
    import numpy as np

    from pqa2_tpu.io.video import VideoReader
    from pqa2_tpu.models.registry import get_model
    from pqa2_tpu.parallel.scoring import (
        make_shardmap_scorer,
        score_clip_sharded,
    )
    from pqa2_tpu.pipeline.json_out import write_vmaf_json
    from pqa2_tpu.pipeline.scoring import ClipScores

    log = log or (lambda m: None)
    entries: List[Dict] = []
    for pair in spec.get("pairs", []):
        entries.append({"reference": pair[0], "distorted": pair[1]})
    entries.extend(spec.get("entries", []))
    if not entries:
        raise ValueError("batch spec has no pairs/entries")

    os.makedirs(out_dir, exist_ok=True)
    scorers: Dict[object, object] = {}  # one compile per (model, depth)
    luma_cache: Dict[str, tuple] = {}  # ladders reuse one reference

    def luma_of(path: str):
        """-> (luma (N,H,W) in source dtype, source bit depth)."""
        if path in luma_cache:
            # LRU touch: a ladder's shared reference is hit on every rung;
            # plain FIFO would evict it first (it is the oldest insertion)
            # and re-decode it per rung — the exact cost this cache exists
            # to avoid.
            luma_cache[path] = luma_cache.pop(path)
        else:
            if len(luma_cache) > 4:  # bound host memory on big sweeps
                luma_cache.pop(next(iter(luma_cache)))
            with VideoReader(path) as r:
                depth = int(getattr(r.info, "bit_depth", 8) or 8)
                y = np.stack([f["y"] for f in r])
                if depth > 8:
                    # Convert once at fill time — a ladder re-uses its
                    # reference on every rung, and a fresh full-clip f32
                    # copy per rung is the cost this cache exists to avoid.
                    y = y.astype(np.float32) / (1 << (depth - 8))
                luma_cache[path] = (y, depth)
        return luma_cache[path]

    nd = mesh.shape.get("data", 1)
    rows: List[Dict] = []
    t_start = time.perf_counter()
    total_frames = 0
    for i, entry in enumerate(entries):
        name = entry.get("name") or os.path.splitext(
            os.path.basename(entry["distorted"])
        )[0]
        mname = entry.get("model", model)
        log(f"[{i + 1}/{len(entries)}] scoring {name} (mesh data={nd})")
        clip_dir = os.path.join(out_dir, name)
        os.makedirs(clip_dir, exist_ok=True)
        t0 = time.perf_counter()
        try:
            ref_y, ref_depth = luma_of(entry["reference"])
            dist_y, dist_depth = luma_of(entry["distorted"])
            # Pipeline-wide depth convention: >8-bit pairs score as f32 on
            # the 8-bit scale with bit_depth carrying the native grid
            # (mixed pairs promote to the deeper grid, like stream_score).
            # Deep streams are already f32 from the cache; only a mixed
            # pair's shallow member still needs promoting here.
            depth = max(ref_depth, dist_depth)
            if depth > 8:
                if ref_y.dtype != np.float32:
                    ref_y = ref_y.astype(np.float32)
                if dist_y.dtype != np.float32:
                    dist_y = dist_y.astype(np.float32)
            key = (mname, depth)
            if key not in scorers:
                scorers[key] = make_shardmap_scorer(mesh, mname,
                                                    bit_depth=depth)
            res = score_clip_sharded(ref_y, dist_y, mesh, model=mname,
                                     scorer=scorers[key], bit_depth=depth)
        except Exception as e:  # keep sweeping; record the failure
            log(f"  failed: {e}")
            rows.append({"name": name, "error": str(e)})
            continue
        dt = time.perf_counter() - t0
        n = res.pop("n_frames")
        vmaf = res.pop("vmaf")
        res.pop("vmaf_bootstrap", None)
        emdl = get_model(mname)  # JSON schema follows the ENTRY's model
        scores = ClipScores(
            model_name=mname, feature_names=tuple(emdl.feature_names),
            features=res, vmaf=vmaf,
            peak=float((1 << depth) - 1),
            uses_integer_features=getattr(emdl, "uses_integer_features",
                                          True),
        )
        json_path = os.path.join(clip_dir, f"{name}_vmaf.json")
        write_vmaf_json(scores, json_path)
        total_frames += n
        rows.append({
            "name": name,
            "vmaf": float(np.mean(vmaf)),
            "psnr": None,  # separate-pass metrics skipped on the mesh sweep
            "ssim": None,
            "frames": n,
            "seconds": round(dt, 3),
            "fps": round(n / dt, 2) if dt > 0 else None,
            "json_path": json_path,
        })

    wall = time.perf_counter() - t_start
    summary = {
        "model": model,
        "mesh_devices": int(nd),
        "clips": rows,
        "n_clips": len(entries),
        "total_frames": total_frames,
        "wall_seconds": round(wall, 3),
        "aggregate_fps": round(total_frames / wall, 2) if wall > 0 else None,
        "aggregate_fps_per_device": (
            round(total_frames / wall / max(nd, 1), 2) if wall > 0 else None),
    }
    with open(os.path.join(out_dir, "batch_summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=str)
    return summary
