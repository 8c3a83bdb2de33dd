"""Batched PSNR — jnp implementation of ffmpeg's psnr filter semantics.

Per-plane MSE -> 10*log10(MAX^2/mse); mse_avg pools summed squared error over
all planes (reference runs this as a separate ffmpeg pass,
app/vmaf_analyzer.py:1027-1045; oracle: pqa2_tpu.golden.psnr). Infinite PSNR
(mse == 0) is kept as jnp.inf — formatting to ffmpeg's "inf" happens in the
log writer.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


@jax.jit
def _sse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.sum(d * d, axis=(-2, -1))


@jax.jit
def psnr_from_mse(mse: jnp.ndarray, max_value: float = 255.0) -> jnp.ndarray:
    return jnp.where(
        mse > 0.0,
        10.0 * jnp.log10(max_value * max_value / jnp.maximum(mse, 1e-30)),
        jnp.inf,
    )


def psnr_from_mse_np(mse, max_value: float = 255.0):
    """Host-side variant for per-frame post-processing (the arrays are tiny;
    a device dispatch would cost more than the math)."""
    import numpy as np

    mse = np.asarray(mse, dtype=np.float64)
    return np.where(
        mse > 0.0,
        10.0 * np.log10(max_value * max_value / np.maximum(mse, 1e-30)),
        np.inf,
    )


def psnr_planes_batched(
    ref_y, ref_u, ref_v, dist_y, dist_u, dist_v, max_value: float = 255.0
) -> Dict[str, jnp.ndarray]:
    """Per-frame PSNR stats over (N,H,W) plane batches.

    Returns mse_{y,u,v,avg} and psnr_{y,u,v,avg}, each (N,).
    """
    out: Dict[str, jnp.ndarray] = {}
    total_sse = 0.0
    total_n = 0
    for name, r, d in (("y", ref_y, dist_y), ("u", ref_u, dist_u), ("v", ref_v, dist_v)):
        sse = _sse(r, d)
        n = r.shape[-2] * r.shape[-1]
        mse = sse / n
        out[f"mse_{name}"] = mse
        out[f"psnr_{name}"] = psnr_from_mse(mse, max_value)
        total_sse = total_sse + sse
        total_n += n
    out["mse_avg"] = total_sse / total_n
    out["psnr_avg"] = psnr_from_mse(out["mse_avg"], max_value)
    return out
