"""Colorspace / pixel-format conversions (SURVEY.md section 2.3 N11).

The reference leaves all pixel-format work to implicit ffmpeg filtergraph
conversions (uyvy422 capture -> yuv420p encode, app/options_manager.py:83-89).
Here the conversions are explicit batched jnp ops so ingest can hand the
feature kernels planar luma directly:

  * packed UYVY 4:2:2 -> planar y/u/v
  * BT.601 / BT.709 limited- and full-range YCbCr <-> RGB matrices
  * chroma up/down-sampling between 4:2:0 / 4:2:2 / 4:4:4
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# Luma coefficients.
_KR_KB = {"bt601": (0.299, 0.114), "bt709": (0.2126, 0.0722)}


def _matrix(standard: str) -> np.ndarray:
    kr, kb = _KR_KB[standard]
    kg = 1.0 - kr - kb
    # RGB -> YCbCr (analog, [0,1] ranges)
    return np.array([
        [kr, kg, kb],
        [-0.5 * kr / (1 - kb), -0.5 * kg / (1 - kb), 0.5],
        [0.5, -0.5 * kg / (1 - kr), -0.5 * kb / (1 - kr)],
    ])


def rgb_to_yuv(rgb: jnp.ndarray, standard: str = "bt709",
               full_range: bool = False) -> jnp.ndarray:
    """(..., 3) RGB in [0,255] -> (..., 3) YCbCr (8-bit levels)."""
    m = jnp.asarray(_matrix(standard), dtype=jnp.float32)
    ycc = rgb.astype(jnp.float32) / 255.0 @ m.T  # y in [0,1], c in [-.5,.5]
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    if full_range:
        y = y * 255.0
        cb = cb * 255.0 + 128.0
        cr = cr * 255.0 + 128.0
    else:
        y = y * 219.0 + 16.0
        cb = cb * 224.0 + 128.0
        cr = cr * 224.0 + 128.0
    return jnp.stack([y, cb, cr], axis=-1)


def yuv_to_rgb(yuv: jnp.ndarray, standard: str = "bt709",
               full_range: bool = False) -> jnp.ndarray:
    """(..., 3) YCbCr (8-bit levels) -> (..., 3) RGB in [0,255]."""
    y, cb, cr = (yuv.astype(jnp.float32)[..., i] for i in range(3))
    if full_range:
        y = y / 255.0
        cb = (cb - 128.0) / 255.0
        cr = (cr - 128.0) / 255.0
    else:
        y = (y - 16.0) / 219.0
        cb = (cb - 128.0) / 224.0
        cr = (cr - 128.0) / 224.0
    m_inv = jnp.asarray(np.linalg.inv(_matrix(standard)), dtype=jnp.float32)
    rgb = jnp.stack([y, cb, cr], axis=-1) @ m_inv.T
    return rgb * 255.0


def uyvy422_to_planar(packed: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Packed UYVY 4:2:2 bytes -> planar dict.

    packed: (..., H, 2*W) uint8 laid out U0 Y0 V0 Y1 U2 Y2 V2 Y3 ...
    Returns y (..., H, W), u/v (..., H, W//2) — the capture card's native
    wire format (app/options_manager.py:82).
    """
    h = packed.shape[-2]
    w2 = packed.shape[-1]
    w = w2 // 2
    quads = packed.reshape(*packed.shape[:-1], w // 2, 4)  # U Y V Y
    u = quads[..., 0]
    y0 = quads[..., 1]
    v = quads[..., 2]
    y1 = quads[..., 3]
    y = jnp.stack([y0, y1], axis=-1).reshape(*packed.shape[:-1], w)
    return {"y": y, "u": u, "v": v}


def planar_to_uyvy422(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Planar 4:2:2 -> packed UYVY bytes (inverse of uyvy422_to_planar)."""
    w = y.shape[-1]
    y_pairs = y.reshape(*y.shape[:-1], w // 2, 2)
    quads = jnp.stack(
        [u, y_pairs[..., 0], v, y_pairs[..., 1]], axis=-1
    )
    return quads.reshape(*y.shape[:-1], 2 * w)


def chroma_420_to_444(c: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour chroma upsample (ffmpeg default for metrics)."""
    c = jnp.repeat(c, 2, axis=-1)
    return jnp.repeat(c, 2, axis=-2)


def chroma_444_to_420(c: jnp.ndarray) -> jnp.ndarray:
    """2x2 box-average chroma downsample."""
    h, w = c.shape[-2] // 2 * 2, c.shape[-1] // 2 * 2
    c = c[..., :h, :w].astype(jnp.float32)
    c = c.reshape(*c.shape[:-2], h // 2, 2, w // 2, 2).mean(axis=(-3, -1))
    return c


def chroma_422_to_420(c: jnp.ndarray) -> jnp.ndarray:
    """Vertical 2x box-average (4:2:2 -> 4:2:0)."""
    h = c.shape[-2] // 2 * 2
    c = c[..., :h, :].astype(jnp.float32)
    return c.reshape(*c.shape[:-2], h // 2, 2, c.shape[-1]).mean(axis=-2)
