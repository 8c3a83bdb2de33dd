"""Batched SSIM — jnp implementation of ffmpeg's 8x8-block ssim filter.

The x264-derived variant (NOT Gaussian-window SSIM): integer sums over 4x4
blocks, SSIM evaluated on overlapping 8x8 windows placed on a 4-pixel grid
(reference pass: app/vmaf_analyzer.py:1057-1075; oracle:
pqa2_tpu.golden.ssim, incl. the c1=416 / c2=235963 constants).

All sums are exact in f32 up to the 4x4-block level (<= 2^20); the window
products round at ~1e-7 relative — well inside the 1e-5 parity budget the
tests enforce against the float64 oracle.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from pqa2_tpu.golden.ssim import ssim_constants


def scaled_ssim_constants(bit_depth: int = 8):
    """ffmpeg's native-max c1/c2 mapped onto the pipeline's 8-bit scale.

    ffmpeg's >8-bit ssim path evaluates native codes with
    c = f((1<<depth)-1); on values divided by div = 2^(depth-8) the same
    ratio falls out of c/div^2 exactly (every sum term scales by div^2)."""
    c1, c2 = ssim_constants(bit_depth)
    div2 = float(1 << (bit_depth - 8)) ** 2
    return c1 / div2, c2 / div2


def _block_sums(p: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) -> (N, H//4, W//4) sums over non-overlapping 4x4 blocks."""
    n, h, w = p.shape
    h4, w4 = h // 4, w // 4
    p = p[:, : h4 * 4, : w4 * 4]
    return p.reshape(n, h4, 4, w4, 4).sum(axis=(2, 4))


def _group(a: jnp.ndarray) -> jnp.ndarray:
    """2x2 groups of 4x4 blocks -> overlapping 8x8 windows on a 4px grid."""
    return a[:, :-1, :-1] + a[:, :-1, 1:] + a[:, 1:, :-1] + a[:, 1:, 1:]


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def ssim_plane_batched(ref: jnp.ndarray, dist: jnp.ndarray,
                       bit_depth: int = 8) -> jnp.ndarray:
    """(N, H, W) plane pair -> (N,) per-frame SSIM (ffmpeg variant).

    Inputs on the pipeline's 8-bit scale; ``bit_depth`` selects ffmpeg's
    native-max constants (see :func:`scaled_ssim_constants`)."""
    c1, c2 = scaled_ssim_constants(bit_depth)
    r = ref.astype(jnp.float32)
    d = dist.astype(jnp.float32)
    s1 = _block_sums(r)
    s2 = _block_sums(d)
    ss = _block_sums(r * r) + _block_sums(d * d)
    s12 = _block_sums(r * d)

    fs1, fs2, fss, fs12 = _group(s1), _group(s2), _group(ss), _group(s12)
    vars_ = fss * 64.0 - fs1 * fs1 - fs2 * fs2
    covar = fs12 * 64.0 - fs1 * fs2
    num = (2.0 * fs1 * fs2 + c1) * (2.0 * covar + c2)
    den = (fs1 * fs1 + fs2 * fs2 + c1) * (vars_ + c2)
    return jnp.mean(num / den, axis=(-2, -1))


@jax.jit
def ssim_db(ssim: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        ssim >= 1.0, jnp.inf, -10.0 * jnp.log10(jnp.maximum(1.0 - ssim, 1e-30))
    )


def ssim_db_np(ssim):
    """Host-side variant for per-frame post-processing."""
    import numpy as np

    ssim = np.asarray(ssim, dtype=np.float64)
    return np.where(
        ssim >= 1.0, np.inf, -10.0 * np.log10(np.maximum(1.0 - ssim, 1e-30))
    )


def ssim_sse_plane(ref: jnp.ndarray, dist: jnp.ndarray, bit_depth: int = 8):
    """(N, H, W) plane pair -> ((N,) SSIM, (N,) SSE) in one pass.

    On TPU the fused Pallas kernel computes both statistics from a single
    read of each tile (the PSNR/SSIM pass shares the traffic); elsewhere the
    jnp ops run (the Pallas kernel would only interpret there)."""
    if jax.default_backend() == "tpu":
        from pqa2_tpu.ops.pallas_ssim import ssim_sse_pallas

        return ssim_sse_pallas(ref, dist, bit_depth=bit_depth)
    from pqa2_tpu.ops.psnr import _sse

    return ssim_plane_batched(ref, dist, bit_depth=bit_depth), _sse(ref, dist)
