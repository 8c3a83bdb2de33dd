"""Streaming clip scoring: decode / H2D / compute overlap.

The throughput architecture for long clips (SURVEY.md section 7.3 item 3):
a producer thread reads paired ref/dist frame chunks (native C++ pump when
available, pure-Python reader otherwise) into a bounded queue while the
device scores the previous chunk — so file I/O, host assembly and TPU compute
overlap instead of serialising. Motion halos are carried across chunks by
holding back one frame at each boundary.

Peak host memory is two chunks instead of the whole clip (a 10 s 4K pair no
longer needs ~7 GB resident).
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from pqa2_tpu.models.loader import BootstrapModel, VMAFModel
from pqa2_tpu.models.registry import get_model
from pqa2_tpu.models.svr import BootstrapPredictor, ScorePredictor
from pqa2_tpu.ops.psnr import psnr_planes_batched
from pqa2_tpu.ops.ssim import ssim_plane_batched
from pqa2_tpu.pipeline.features import extract_features_batched, model_feature_params
from pqa2_tpu.pipeline.scoring import DEFAULT_CHUNK_SIZE, ClipScores
from pqa2_tpu.utils.chunking import pad_frames

logger = logging.getLogger(__name__)


def _open_reader(path: str):
    """Prefer the native threaded pump for y4m; fall back to VideoReader."""
    if str(path).lower().endswith(".y4m"):
        try:
            from pqa2_tpu.io.native import NativeY4MReader, is_available

            if is_available():
                return NativeY4MReader(path)
        except Exception as e:  # fall back silently — correctness first
            logger.debug("native reader unavailable (%s); using python", e)
    from pqa2_tpu.io.video import VideoReader

    return VideoReader(path)


def _check_geometry(ref_r, dist_r, ref_path, dist_path) -> None:
    """Fail fast with a readable error when ref/dist disagree on geometry
    (otherwise the mismatch surfaces later as an opaque jnp shape error)."""

    def _geom(r):
        info = getattr(r, "info", r)
        return (getattr(info, "width", None), getattr(info, "height", None))

    rg, dg = _geom(ref_r), _geom(dist_r)
    if None not in rg and None not in dg and rg != dg:
        raise ValueError(
            f"resolution mismatch: reference {ref_path!r} is {rg[0]}x{rg[1]} "
            f"but distorted {dist_path!r} is {dg[0]}x{dg[1]}; align/scale the "
            f"inputs to a common geometry before scoring"
        )


def _chunk_producer(
    ref_path: str,
    dist_path: str,
    chunk_size: int,
    out_q: "queue.Queue",
    max_frames: Optional[int],
    stop: threading.Event,
    meta: Optional[Dict] = None,
    subsample: int = 1,
) -> None:
    """Read paired chunks; each queue item is (ref_frames, dist_frames, eof).

    subsample=k keeps every k-th source frame (libvmaf n_subsample): skipped
    frames never reach the queue, so no feature work is spent on them.
    """
    ref_r = _open_reader(ref_path)
    dist_r = _open_reader(dist_path)
    if meta is not None:
        meta["ref_depth"] = _reader_depth(ref_r)
        meta["dist_depth"] = _reader_depth(dist_r)
    try:
        _check_geometry(ref_r, dist_r, ref_path, dist_path)
        n_read = 0
        ref_buf: List[Dict] = []
        dist_buf: List[Dict] = []
        while not stop.is_set():
            rf = ref_r.read_frame()
            df = dist_r.read_frame()
            eof = rf is None or df is None
            sampled = not eof and (n_read % subsample == 0)
            if not eof:
                if sampled:
                    ref_buf.append(rf)
                    dist_buf.append(df)
                n_read += 1
                if max_frames is not None and n_read >= max_frames:
                    eof = True
            if eof or len(ref_buf) == chunk_size:
                out_q.put((ref_buf, dist_buf, eof))
                ref_buf, dist_buf = [], []
                if eof:
                    return
    except Exception as e:
        logger.exception("producer failed")
        out_q.put(e)
    finally:
        for r in (ref_r, dist_r):
            try:
                r.close()
            except Exception:
                pass


def _reader_depth(reader) -> int:
    if hasattr(reader, "bit_depth"):
        return int(reader.bit_depth)
    if hasattr(reader, "info"):
        return int(reader.info.bit_depth)
    return 8


def stream_score(
    ref_path: str,
    dist_path: str,
    model: Union[str, VMAFModel, BootstrapModel] = "vmaf_v0.6.1",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    max_frames: Optional[int] = None,
    with_psnr: bool = True,
    with_ssim: bool = True,
    frame_cb: Optional[Callable[[int], None]] = None,
    subsample: int = 1,
    precision: Optional[str] = None,
) -> ClipScores:
    """Score two video files without materialising them in memory.

    subsample=k scores every k-th source frame (libvmaf n_subsample
    semantics: motion is computed between the sampled frames; skipped frames
    cost decode only, no feature work). precision overrides the model-driven
    float/integer extractor choice.
    """
    subsample = max(1, int(subsample))
    mdl = get_model(model) if isinstance(model, str) else model
    params = model_feature_params(mdl, precision)
    predictor = (
        BootstrapPredictor(mdl) if isinstance(mdl, BootstrapModel)
        else ScorePredictor(mdl)
    )

    q: "queue.Queue" = queue.Queue(maxsize=2)
    stop = threading.Event()
    meta: Dict = {}
    producer = threading.Thread(
        target=_chunk_producer,
        args=(ref_path, dist_path, chunk_size, q, max_frames, stop, meta,
              subsample),
        daemon=True,
    )
    producer.start()

    feats_parts: List[Dict[str, np.ndarray]] = []
    psnr_parts: List[Dict[str, np.ndarray]] = []
    ssim_parts: List[Dict[str, np.ndarray]] = []
    # Halo frames carried between chunks (luma + chroma of the last frame).
    prev_ref_tail: Optional[Dict] = None
    prev_dist_tail: Optional[Dict] = None
    pending: Optional[Tuple[List[Dict], List[Dict], bool]] = None
    total = 0

    try:
        while True:
            item = pending if pending is not None else q.get()
            pending = None
            if isinstance(item, Exception):
                raise item
            ref_frames, dist_frames, eof = item
            if not ref_frames:
                break
            # Peek one frame ahead for the next-halo unless this is the end.
            next_head: Optional[Tuple[Dict, Dict]] = None
            if not eof:
                nxt = q.get()
                if isinstance(nxt, Exception):
                    raise nxt
                pending = nxt
                if nxt[0]:
                    next_head = (nxt[0][0], nxt[1][0])

            has_prev = prev_ref_tail is not None
            has_next = next_head is not None
            ref_y = [f["y"] for f in ref_frames]
            dist_y = [f["y"] for f in dist_frames]
            if has_prev:
                ref_y = [prev_ref_tail["y"]] + ref_y
                dist_y = [prev_dist_tail["y"]] + dist_y
            if has_next:
                ref_y = ref_y + [next_head[0]["y"]]
                dist_y = dist_y + [next_head[1]["y"]]
            # >8-bit sources: features are evaluated on the 8-bit scale
            # (libvmaf normalises high-bit-depth input the same way).
            ref_div = float(1 << (meta.get("ref_depth", 8) - 8))
            dist_div = float(1 << (meta.get("dist_depth", 8) - 8))
            ref_np = np.stack(ref_y)
            dist_np = np.stack(dist_y)
            depth = max(meta.get("ref_depth", 8),
                        meta.get("dist_depth", 8))

            def run_chunk():
                # Transfer the SOURCE dtype (uint8/uint16) and convert on
                # device — f32 host conversion would quadruple the H2D bytes,
                # which is the dominant cost of the whole pipeline on hosts
                # with modest device links.
                rb = jnp.asarray(ref_np)
                db = jnp.asarray(dist_np)
                # The integer path recovers native codes from the 8-bit
                # scale; mixed-depth pairs score on the deeper grid.  When
                # the pair depth exceeds 8, BOTH streams must be float on
                # the 8-bit scale: to_native_grid reads an integer dtype as
                # codes already on the pair grid, so a shallower stream left
                # in uint8 would land 2^(depth diff) dark.  The float branch
                # promotes exactly (floor(x * 2^(depth-8) + 0.5) == code <<
                # diff for integer-valued x).
                if depth > 8 or ref_div != 1.0:
                    rb = rb.astype(jnp.float32) / ref_div
                if depth > 8 or dist_div != 1.0:
                    db = db.astype(jnp.float32) / dist_div
                out = extract_features_batched(
                    rb, db, has_prev=has_prev, has_next=has_next,
                    bit_depth=depth, **params,
                )
                from pqa2_tpu.pipeline.features import fetch_features

                return fetch_features(out), rb, db

            # Per-chunk retry on transient device faults (preemption, flaky
            # interconnect) — the TPU-side analog of the reference's
            # retry_attempts posture (SURVEY.md section 5.3).
            attempts = 0
            while True:
                try:
                    feats_np, rb_dev, db_dev = run_chunk()
                    feats_parts.append(feats_np)
                    break
                except Exception as e:
                    attempts += 1
                    if attempts > 2 or "UNAVAILABLE" not in str(e):
                        raise
                    logger.warning(
                        "chunk scoring failed (%s); retry %d/2", e, attempts
                    )
                    import time as _time

                    _time.sleep(5.0 * attempts)

            if with_psnr or with_ssim:
                n0 = len(ref_frames)
                lead = 1 if has_prev else 0
                # Depth promotion for metrics: both streams on a common
                # scale at the pair's max depth (ffmpeg upconverts to a
                # shared pixel format first). Used by every branch below.
                max_depth = max(meta.get("ref_depth", 8),
                                meta.get("dist_depth", 8))
                max_div = float(1 << (max_depth - 8))
                peak = float((1 << max_depth) - 1)

                def _pad_dev(x):
                    # Pad short tail chunks up to the static chunk shape on
                    # device so PSNR/SSIM never compile a per-clip-length
                    # program; the pad frames' outputs are sliced off below.
                    return pad_frames(x, chunk_size)

                def _stack_dev(frames, key, div):
                    a = jnp.asarray(np.stack([f[key] for f in frames]))
                    if div != 1.0:
                        a = a.astype(jnp.float32) / div
                    return _pad_dev(a)

                def _unpad(d):
                    return {k: np.asarray(v)[:n0] for k, v in d.items()}

                # Luma reuses the device buffers already uploaded for the
                # feature pass (core frames, without the motion halo).
                r_y = _pad_dev(rb_dev[lead : lead + n0])
                d_y = _pad_dev(db_dev[lead : lead + n0])
                r_u = _stack_dev(ref_frames, "u", ref_div)
                r_v = _stack_dev(ref_frames, "v", ref_div)
                d_u = _stack_dev(dist_frames, "u", dist_div)
                d_v = _stack_dev(dist_frames, "v", dist_div)
            if with_psnr and with_ssim:
                # Fused path: one pass per plane yields SSIM + SSE (on TPU
                # the Pallas kernel reads each tile once for both). SSIM is
                # evaluated on the 8-bit scale with ffmpeg's native-max
                # constants mapped onto it; PSNR on native code values —
                # the SSE rescales exactly.
                from pqa2_tpu.ops.psnr import psnr_from_mse_np
                from pqa2_tpu.ops.ssim import ssim_db_np, ssim_sse_plane

                # The 8-bit-scale SSE rescales exactly to the common grid:
                # diff_native = max_div * diff8.
                part: Dict[str, np.ndarray] = {}
                pstats: Dict[str, np.ndarray] = {}
                tot = 0.0
                tot_w = 0
                tot_sse = 0.0
                for p, (r, d) in {"y": (r_y, d_y), "u": (r_u, d_u),
                                  "v": (r_v, d_v)}.items():
                    # r/d are device arrays already on the 8-bit scale.
                    vv, sse8 = ssim_sse_plane(r, d, bit_depth=max_depth)
                    vv = np.asarray(vv)
                    part[f"ssim_{p}"] = vv
                    w = r.shape[-2] * r.shape[-1]
                    tot = tot + vv * w
                    tot_w += w
                    sse = np.asarray(sse8) * (max_div * max_div)
                    mse = sse / w
                    pstats[f"mse_{p}"] = mse
                    pstats[f"psnr_{p}"] = psnr_from_mse_np(mse, max_value=peak)
                    tot_sse = tot_sse + sse
                pstats["mse_avg"] = tot_sse / tot_w
                pstats["psnr_avg"] = psnr_from_mse_np(pstats["mse_avg"],
                                                     max_value=peak)
                psnr_parts.append(_unpad(pstats))
                part["ssim_all"] = tot / tot_w
                part["ssim_db"] = ssim_db_np(part["ssim_all"])
                ssim_parts.append(_unpad(part))
            elif with_psnr:
                # PSNR on a common scale at the max depth (see the fused
                # branch): the 8-bit-scale planes times max_div are exactly
                # the common-format code values, so computing on the 8-bit
                # scale with a rescaled peak gives identical dB.
                from pqa2_tpu.ops.psnr import psnr_from_mse_np

                stats = psnr_planes_batched(r_y, r_u, r_v, d_y, d_u, d_v)
                stats = {k: np.asarray(v) for k, v in stats.items()}
                for p in ("y", "u", "v", "avg"):
                    stats[f"mse_{p}"] = stats[f"mse_{p}"] * (max_div * max_div)
                    stats[f"psnr_{p}"] = psnr_from_mse_np(stats[f"mse_{p}"],
                                                          max_value=peak)
                psnr_parts.append(_unpad(stats))
            elif with_ssim:
                from pqa2_tpu.ops.ssim import ssim_db_np

                part: Dict[str, np.ndarray] = {}
                tot = 0.0
                tot_w = 0
                for p, (r, d) in {"y": (r_y, d_y), "u": (r_u, d_u),
                                  "v": (r_v, d_v)}.items():
                    # r/d are on the 8-bit scale for any depth; the
                    # constants follow ffmpeg's native max.
                    vv = np.asarray(ssim_plane_batched(
                        r, d, bit_depth=max_depth))
                    part[f"ssim_{p}"] = vv
                    w = r.shape[-2] * r.shape[-1]
                    tot = tot + vv * w
                    tot_w += w
                part["ssim_all"] = tot / tot_w
                part["ssim_db"] = ssim_db_np(part["ssim_all"])
                ssim_parts.append(_unpad(part))

            total += len(ref_frames)
            if frame_cb is not None:
                frame_cb(len(ref_frames))
            prev_ref_tail = ref_frames[-1]
            prev_dist_tail = dist_frames[-1]
            if eof:
                break
    finally:
        stop.set()
        # Drain so the producer is never blocked on put().
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        producer.join(timeout=5.0)

    if total == 0:
        raise ValueError("empty input video")

    features = {
        k: np.concatenate([p[k] for p in feats_parts]) for k in feats_parts[0]
    }
    x = jnp.asarray(
        np.stack([features[k] for k in mdl.feature_names], axis=-1),
        dtype=jnp.float32,
    )
    if isinstance(mdl, BootstrapModel):
        vmaf, boot = predictor(x)
        vmaf, boot = np.asarray(vmaf), np.asarray(boot)
    else:
        vmaf, boot = np.asarray(predictor(x)), None

    max_depth = max(meta.get("ref_depth", 8), meta.get("dist_depth", 8))
    out = ClipScores(
        model_name=mdl.name if hasattr(mdl, "name") else str(model),
        feature_names=tuple(mdl.feature_names),
        features=features,
        vmaf=vmaf,
        bootstrap=boot,
        peak=float((1 << max_depth) - 1),
        uses_integer_features=getattr(mdl, "uses_integer_features", True),
        frame_step=subsample,
    )
    if psnr_parts:
        out.psnr = {k: np.concatenate([p[k] for p in psnr_parts])
                    for k in psnr_parts[0]}
    if ssim_parts:
        out.ssim = {k: np.concatenate([p[k] for p in ssim_parts])
                    for k in ssim_parts[0]}
    return out
