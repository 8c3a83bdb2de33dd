"""Batched per-frame luma statistics (the device half of bookend detection).

Replaces the reference's per-frame OpenCV decode + np.mean/np.std loops
(app/bookend_alignment.py:884-930, :966-1063) with one jitted pass per chunk:
mean, standard deviation, and a 256-bin histogram per frame. The histogram is
the key redesign — any white-pixel-ratio threshold the host-side cascade
wants to try afterwards becomes a free cumulative-sum lookup instead of
another video scan.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from pqa2_tpu.utils.chunking import pad_frames


@jax.jit
def _stats_chunk(frames: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    f = frames.astype(jnp.float32)
    mean = jnp.mean(f, axis=(-2, -1))
    # Two-pass variance: the E[x^2]-mean^2 form cancels catastrophically in
    # f32 for bright uniform frames (exactly the bookend case).
    d = f - mean[:, None, None]
    std = jnp.sqrt(jnp.maximum(jnp.mean(d * d, axis=(-2, -1)), 0.0))
    # Per-frame 256-bin histogram: one-hot accumulate via bincount per frame.
    idx = jnp.clip(frames.astype(jnp.int32), 0, 255)
    hist = jax.vmap(lambda x: jnp.bincount(x.ravel(), length=256))(idx)
    return {"mean": mean, "std": std, "hist": hist}


@jax.jit
def _stats_thumb_chunk(frames: jnp.ndarray) -> jnp.ndarray:
    """_stats_chunk + 8x8 block-mean thumbnails, packed into ONE
    (N, 2 + 256 + 64) f32 array.

    One dispatch and one device->host fetch per chunk instead of four —
    on tunneled hosts each small fetch is a full (and flake-prone) round
    trip, and bookend alignment is latency-bound, not compute-bound.
    Histogram counts stay exact in f32 (frame pixel counts < 2^24).
    """
    s = _stats_chunk(frames)
    n, h, w = frames.shape
    bh, bw = h // 8, w // 8
    x = frames.astype(jnp.float32)[:, : bh * 8, : bw * 8]
    thumb = x.reshape(n, 8, bh, 8, bw).mean(axis=(2, 4)).reshape(n, 64)
    return jnp.concatenate(
        [s["mean"][:, None], s["std"][:, None],
         s["hist"].astype(jnp.float32), thumb], axis=1)


def _finish_stats(mean, std, hist, h, w) -> Dict[str, np.ndarray]:
    stats = {"mean": mean, "std": std, "hist": hist}
    # Suffix-sum of histogram: white_count[t] = #pixels with value > t.
    above = np.cumsum(hist.astype(np.int64)[:, ::-1], axis=1)[:, ::-1]
    stats["pixels"] = h * w
    stats["_above"] = above
    return stats


def stats_and_thumbs(luma, chunk_size: int = 64):
    """(N, H, W) luma -> (stats dict, (N, 64) thumbnails), one packed
    device round trip per chunk. The combined pass for bookend alignment:
    detection reads the stats, xcorr refinement reads the thumbnails."""
    n = luma.shape[0]
    parts = []
    for start in range(0, n, chunk_size):
        chunk = luma[start : start + chunk_size]
        pad = chunk_size - chunk.shape[0]
        if pad:
            chunk = pad_frames(chunk, chunk_size)
        out = np.asarray(_stats_thumb_chunk(jnp.asarray(chunk)))
        parts.append(out[: chunk_size - pad or None])
    packed = np.concatenate(parts)
    stats = _finish_stats(packed[:, 0], packed[:, 1], packed[:, 2:258],
                          luma.shape[-2], luma.shape[-1])
    return stats, packed[:, 258:]


def frame_luma_stats(luma: np.ndarray, chunk_size: int = 64) -> Dict[str, np.ndarray]:
    """(N, H, W) luma (uint8 or float in [0,255]) -> per-frame stats.

    Returns dict with mean (N,), std (N,), hist (N, 256) and
    white_ratio(threshold) support via cumulative histogram.
    """
    n = luma.shape[0]
    parts = []
    for start in range(0, n, chunk_size):
        chunk = luma[start : start + chunk_size]
        # Always pad to the static chunk shape — exact-length programs would
        # compile once per clip length.
        pad = chunk_size - chunk.shape[0]
        if pad:
            chunk = pad_frames(chunk, chunk_size)
        out = _stats_chunk(jnp.asarray(chunk))
        take = chunk.shape[0] - pad
        parts.append({k: np.asarray(v)[:take] for k, v in out.items()})
    stats = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    hist = stats["hist"]
    return _finish_stats(stats["mean"], stats["std"], hist,
                         luma.shape[-2], luma.shape[-1])


def white_ratio(stats: Dict[str, np.ndarray], threshold: float) -> np.ndarray:
    """Fraction of pixels strictly above `threshold` per frame, from the
    precomputed histograms."""
    t = int(np.floor(threshold)) + 1  # strictly greater
    if t > 255:
        return np.zeros(stats["_above"].shape[0])
    t = max(t, 0)
    return stats["_above"][:, t] / stats["pixels"]
