"""Clip-level scoring: chunked streaming, SVR fusion, pooling.

Replaces the reference's libvmaf subprocess + JSON parse round-trip
(app/vmaf_analyzer.py:411-932). Long clips stream through the device in
fixed-size chunks (static shapes -> one compilation) with a one-frame halo so
motion2 is exact across chunk boundaries (SURVEY.md section 5.7).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from pqa2_tpu.models.loader import BootstrapModel, VMAFModel
from pqa2_tpu.models.registry import get_model
from pqa2_tpu.models.svr import BootstrapPredictor, ScorePredictor
from pqa2_tpu.ops.ssim import ssim_plane_batched
from pqa2_tpu.pipeline.features import extract_features_batched, model_feature_params
from pqa2_tpu.utils.chunking import pad_frames, pow2_bucket

DEFAULT_CHUNK_SIZE = 32

POOL_METHODS = ("mean", "min", "max", "harmonic_mean")


@dataclasses.dataclass
class ClipScores:
    """Per-frame metrics + model metadata for one scored clip."""

    model_name: str
    feature_names: tuple
    features: Dict[str, np.ndarray]  # per-frame feature arrays (N,)
    vmaf: np.ndarray  # (N,) per-frame VMAF scores
    bootstrap: Optional[np.ndarray] = None  # (M, N) per-sub-model scores
    psnr: Optional[Dict[str, np.ndarray]] = None
    ssim: Optional[Dict[str, np.ndarray]] = None
    # Native PSNR peak (255 for 8-bit, 1023 for 10-bit, ...): the scale the
    # stored mse_* values live on. Used by the psnr log summary line.
    peak: float = 255.0
    # Whether the model was trained on the integer_* feature extractors
    # (drives the metric key prefix in the libvmaf-schema JSON).
    uses_integer_features: bool = True
    # Distance between scored frames in source-frame indices (n_subsample):
    # frameNum in the JSON log is i * frame_step.
    frame_step: int = 1

    @property
    def n_frames(self) -> int:
        return int(self.vmaf.shape[0])

    def pooled(self, method: str = "mean") -> Dict[str, float]:
        """Pooled value per metric (vmaf + features), one method."""
        out = {"vmaf": pool_metric(self.vmaf, method)}
        for k, v in self.features.items():
            out[k] = pool_metric(v, method)
        return out

    def pooled_all(self) -> Dict[str, Dict[str, float]]:
        """libvmaf-style pooled_metrics: {metric: {min/max/mean/harmonic_mean}}."""
        metrics = {"vmaf": self.vmaf, **self.features}
        if self.bootstrap is not None:
            lo, hi, stddev = bootstrap_ci(self.bootstrap)
            metrics["vmaf_bagging"] = self.bootstrap.mean(axis=0)
            metrics["vmaf_stddev"] = stddev
            metrics["vmaf_ci_p95_lo"] = lo
            metrics["vmaf_ci_p95_hi"] = hi
        return {
            name: {m: pool_metric(vals, m) for m in POOL_METHODS}
            for name, vals in metrics.items()
        }


def pool_metric(values: np.ndarray, method: str = "mean") -> float:
    values = np.asarray(values, dtype=np.float64)
    if values.size == 0:
        return 0.0
    if method == "mean":
        return float(values.mean())
    if method == "min":
        return float(values.min())
    if method == "max":
        return float(values.max())
    if method == "harmonic_mean":
        # libvmaf's harmonic mean shifts by 1 to tolerate zeros.
        return float(values.size / np.sum(1.0 / (1.0 + values)) - 1.0)
    raise ValueError(f"unknown pool method {method!r}")


def bootstrap_ci(scores: np.ndarray, alpha: float = 0.95):
    """(M, N) bootstrap sub-model scores -> (ci_lo, ci_hi, stddev) per frame.

    Matches libvmaf's normal-approximation CI: mean +/- 1.96 * stddev of the
    bootstrap distribution (models 1..M-1; model 0 is the primary predictor).
    """
    boot = scores[1:] if scores.shape[0] > 1 else scores
    mean = boot.mean(axis=0)
    std = boot.std(axis=0, ddof=1) if boot.shape[0] > 1 else np.zeros_like(mean)
    z = 1.959963984540054
    return mean - z * std, mean + z * std, std


def _resolve_model(model: Union[str, VMAFModel, BootstrapModel]):
    if isinstance(model, str):
        return get_model(model)
    return model


def score_features(
    features: Dict[str, np.ndarray],
    model: Union[str, VMAFModel, BootstrapModel] = "vmaf_v0.6.1",
):
    """Feature dict -> (vmaf_scores, bootstrap_scores_or_None)."""
    mdl = _resolve_model(model)
    names = mdl.feature_names
    x = jnp.stack(
        [jnp.asarray(features[k], dtype=jnp.float32) for k in names], axis=-1
    )
    if isinstance(mdl, BootstrapModel):
        primary, all_scores = BootstrapPredictor(mdl)(x)
        return np.asarray(primary), np.asarray(all_scores)
    return np.asarray(ScorePredictor(mdl)(x)), None


def iter_chunks(n: int, chunk_size: int):
    """Yield (start, stop, has_prev, has_next) chunk bounds over n frames."""
    for start in range(0, n, chunk_size):
        stop = min(start + chunk_size, n)
        yield start, stop, start > 0, stop < n


def extract_clip_features(
    ref_luma: np.ndarray,
    dist_luma: np.ndarray,
    *,
    model=None,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    feature_params: Optional[Dict] = None,
    frame_cb=None,
    precision: Optional[str] = None,
    bit_depth: int = 8,
) -> Dict[str, np.ndarray]:
    """Whole-clip feature extraction with chunked streaming + 1-frame halo.

    ref_luma/dist_luma: (N, H, W). The final partial chunk is padded up to
    chunk_size (static shapes -> single XLA compilation) and the pad frames'
    features dropped. precision overrides the model-driven float/integer
    extractor choice (pipeline/features.py:resolve_precision).
    """
    if feature_params is None:
        feature_params = (
            model_feature_params(_resolve_model(model), precision)
            if model else {}
        )
    n = ref_luma.shape[0]
    chunk_size = pow2_bucket(n, chunk_size)
    parts: List[Dict[str, np.ndarray]] = []
    for start, stop, has_prev, has_next in iter_chunks(n, chunk_size):
        lo = start - (1 if has_prev else 0)
        hi = stop + (1 if has_next else 0)
        ref_c = ref_luma[lo:hi]
        dist_c = dist_luma[lo:hi]
        # Pad the final short chunk to the static chunk shape.
        want = chunk_size + (1 if has_prev else 0) + (1 if has_next else 0)
        pad = want - ref_c.shape[0]
        if pad > 0:
            ref_c = pad_frames(ref_c, want)
            dist_c = pad_frames(dist_c, want)
        feats = extract_features_batched(
            jnp.asarray(ref_c), jnp.asarray(dist_c),
            has_prev=has_prev, has_next=has_next, bit_depth=bit_depth,
            **feature_params,
        )
        core_n = stop - start
        from pqa2_tpu.pipeline.features import fetch_features

        fetched = fetch_features(feats)
        part = {k: v[:core_n].copy() for k, v in fetched.items()}
        if pad > 0 and not has_next:
            # The duplicated pad frame gave the true last frame a zero forward
            # SAD; restore the clip-end semantics motion2[last] = sad(t-1, t).
            part["motion2"][core_n - 1] = part["motion"][core_n - 1]
        parts.append(part)
        if frame_cb is not None:
            frame_cb(core_n)
    return {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}


def score_clip(
    ref_luma: np.ndarray,
    dist_luma: np.ndarray,
    model: Union[str, VMAFModel, BootstrapModel] = "vmaf_v0.6.1",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    subsample: int = 1,
    frame_cb=None,
    precision: Optional[str] = None,
    bit_depth: int = 8,
) -> ClipScores:
    """Luma batches -> per-frame VMAF. The core scoring entry point.

    ``bit_depth``: the source depth of the (8-bit-scale) luma — lets the
    integer feature path recover exact native codes for its native-grid
    fixed-point schedule (pipeline/features.py).

    subsample=k scores every k-th frame (the reference's n_subsample option,
    app/vmaf_analyzer.py:379) with libvmaf semantics: features — including
    motion — are computed between the *sampled* frames only, so the feature
    work genuinely drops to ~1/k.
    frame_cb(n) is invoked per scored chunk with the frame count (progress).
    """
    mdl = _resolve_model(model)
    if subsample > 1:
        ref_luma = ref_luma[::subsample]
        dist_luma = dist_luma[::subsample]
    feats = extract_clip_features(
        ref_luma, dist_luma, model=mdl, chunk_size=chunk_size,
        frame_cb=frame_cb, precision=precision, bit_depth=bit_depth,
    )
    vmaf, boot = score_features(feats, mdl)
    name = mdl.name if hasattr(mdl, "name") else str(model)
    return ClipScores(
        model_name=name,
        feature_names=tuple(mdl.feature_names),
        features=feats,
        vmaf=vmaf,
        bootstrap=boot,
        uses_integer_features=getattr(mdl, "uses_integer_features", True),
        frame_step=subsample,
    )


def score_planes(
    ref_planes: Sequence[Dict[str, np.ndarray]],
    dist_planes: Sequence[Dict[str, np.ndarray]],
    model: Union[str, VMAFModel, BootstrapModel] = "vmaf_v0.6.1",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    with_psnr: bool = True,
    with_ssim: bool = True,
    frame_cb=None,
    bit_depth: int = 8,
    subsample: int = 1,
    precision: Optional[str] = None,
    ref_y=None,
    dist_y=None,
) -> ClipScores:
    """Full scoring from planar YUV frame lists (io.VideoReader output):
    VMAF on luma + optional PSNR/SSIM over all three planes.

    For >8-bit sources pass ``bit_depth``: features evaluate on the
    8-bit scale (libvmaf normalises high-bit-depth input the same way),
    SSIM uses ffmpeg's native-max constants mapped onto that scale
    (ops/ssim.py:scaled_ssim_constants), and PSNR uses the native peak.
    For per-stream depths use
    pipeline.streaming.stream_score, which reads them from the container.
    subsample=k keeps every k-th frame (stream_score semantics: skipped
    frames cost nothing, all metrics run on the sampled frames).

    ``ref_y``/``dist_y``: optionally the (N, H, W) luma batches ALREADY on
    the 8-bit scale — numpy or device arrays. The combined workflow passes
    device-resident slices of the luma it uploaded for alignment, so the
    biggest tensor is never transferred twice (app/workflow.py).
    """
    subsample = max(1, int(subsample or 1))
    if subsample > 1:
        ref_planes = ref_planes[::subsample]
        dist_planes = dist_planes[::subsample]
        if ref_y is not None:
            ref_y = ref_y[::subsample]
        if dist_y is not None:
            dist_y = dist_y[::subsample]
    div = float(1 << (bit_depth - 8))
    # Keep the source dtype: device transfers of uint8 are 4x smaller than
    # f32 and every op casts on device.
    if ref_y is None:
        ref_y = np.stack([f["y"] for f in ref_planes])
        if div != 1.0:
            ref_y = ref_y.astype(np.float32) / div
    if dist_y is None:
        dist_y = np.stack([f["y"] for f in dist_planes])
        if div != 1.0:
            dist_y = dist_y.astype(np.float32) / div
    result = score_clip(ref_y, dist_y, model=model, chunk_size=chunk_size,
                        frame_cb=frame_cb, precision=precision,
                        bit_depth=bit_depth)
    result.peak = float((1 << bit_depth) - 1)
    result.frame_step = subsample

    if with_psnr or with_ssim:
        ref_u = np.stack([f["u"] for f in ref_planes])
        ref_v = np.stack([f["v"] for f in ref_planes])
        dist_u = np.stack([f["u"] for f in dist_planes])
        dist_v = np.stack([f["v"] for f in dist_planes])
        if div != 1.0:
            ref_u = ref_u.astype(np.float32) / div
            ref_v = ref_v.astype(np.float32) / div
            dist_u = dist_u.astype(np.float32) / div
            dist_v = dist_v.astype(np.float32) / div
    peak = float((1 << bit_depth) - 1)

    def chunked(fn, r, d):
        """Run fn over fixed-size padded frame chunks (static shapes -> one
        compilation per plane geometry, never per clip length) and
        concatenate the per-frame outputs."""
        n0 = r.shape[0]
        cs = pow2_bucket(n0, chunk_size)
        outs = []
        for start in range(0, n0, cs):
            rc, dc = r[start : start + cs], d[start : start + cs]
            pad = cs - rc.shape[0]
            if pad:
                rc = pad_frames(rc, cs)
                dc = pad_frames(dc, cs)
            res = fn(jnp.asarray(rc), jnp.asarray(dc))
            if not isinstance(res, tuple):
                res = (res,)
            outs.append(tuple(np.asarray(x)[: cs - pad or None] for x in res))
        return tuple(np.concatenate([o[i] for o in outs])
                     for i in range(len(outs[0])))
    if with_psnr and with_ssim:
        # Fused path: one pass per plane yields both statistics (on TPU the
        # Pallas kernel reads each tile once for SSIM windows + SSE).
        from pqa2_tpu.ops.psnr import psnr_from_mse_np
        from pqa2_tpu.ops.ssim import ssim_db_np, ssim_sse_plane

        planes = {
            "y": (ref_y, dist_y), "u": (ref_u, dist_u), "v": (ref_v, dist_v)
        }
        ssim: Dict[str, np.ndarray] = {}
        psnr: Dict[str, np.ndarray] = {}
        total = 0.0
        total_w = 0
        total_sse = 0.0
        ssim_fn = functools.partial(ssim_sse_plane, bit_depth=bit_depth)
        for p, (r, d) in planes.items():
            sv, sse = chunked(ssim_fn, r, d)
            ssim[f"ssim_{p}"] = sv
            w = r.shape[-2] * r.shape[-1]
            total = total + sv * w
            total_w += w
            mse = np.asarray(sse) * (div * div) / w
            psnr[f"mse_{p}"] = mse
            psnr[f"psnr_{p}"] = psnr_from_mse_np(mse, max_value=peak)
            total_sse = total_sse + np.asarray(sse) * (div * div)
        ssim["ssim_all"] = total / total_w
        ssim["ssim_db"] = ssim_db_np(ssim["ssim_all"])
        psnr["mse_avg"] = total_sse / total_w
        psnr["psnr_avg"] = psnr_from_mse_np(psnr["mse_avg"], max_value=peak)
        result.ssim = ssim
        result.psnr = psnr
        return result
    if with_psnr:
        from pqa2_tpu.ops.psnr import _sse, psnr_from_mse_np

        psnr2: Dict[str, np.ndarray] = {}
        tot_sse = 0.0
        tot_w = 0
        for p, (r, d) in (("y", (ref_y, dist_y)), ("u", (ref_u, dist_u)),
                          ("v", (ref_v, dist_v))):
            (sse,) = chunked(_sse, r, d)
            w = r.shape[-2] * r.shape[-1]
            psnr2[f"mse_{p}"] = sse * (div * div) / w
            psnr2[f"psnr_{p}"] = psnr_from_mse_np(psnr2[f"mse_{p}"],
                                                  max_value=peak)
            tot_sse = tot_sse + sse * (div * div)
            tot_w += w
        psnr2["mse_avg"] = tot_sse / tot_w
        psnr2["psnr_avg"] = psnr_from_mse_np(psnr2["mse_avg"], max_value=peak)
        result.psnr = psnr2
    if with_ssim:
        from pqa2_tpu.ops.ssim import ssim_db_np

        planes = {
            "y": (ref_y, dist_y), "u": (ref_u, dist_u), "v": (ref_v, dist_v)
        }
        ssim: Dict[str, np.ndarray] = {}
        total = 0.0
        total_w = 0
        ssim_fn = functools.partial(ssim_plane_batched, bit_depth=bit_depth)
        for p, (r, d) in planes.items():
            (v,) = chunked(ssim_fn, r, d)
            ssim[f"ssim_{p}"] = v
            w = r.shape[-2] * r.shape[-1]
            total = total + v * w
            total_w += w
        ssim["ssim_all"] = total / total_w
        ssim["ssim_db"] = ssim_db_np(ssim["ssim_all"])
        result.ssim = ssim
    return result
