"""Optional motion compensation (SURVEY.md section 2.3 N10).

The reference can run the capture through ffmpeg's ``minterpolate`` before
alignment to stabilise fast content (app/bookend_alignment.py:177-231) —
flag-gated off by default (app/options_manager.py:52). The TPU-native
equivalent: per-frame *global* translation estimation by phase correlation
on the device (one batched FFT program) and integer-pixel compensation.
Capture chains misregister by a constant or slowly-drifting offset (scaler
pipelines, HDMI crop), which is exactly the component a global estimate
removes; local interpolation is out of scope like it effectively is in the
reference (disabled by default).
"""

from __future__ import annotations

import logging
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@jax.jit
def _phase_corr_surface(ref: jnp.ndarray, mov: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) pairs -> (N, H, W) phase-correlation surfaces."""
    f1 = jnp.fft.rfft2(ref.astype(jnp.float32))
    f2 = jnp.fft.rfft2(mov.astype(jnp.float32))
    cross = f1 * jnp.conj(f2)
    cross = cross / (jnp.abs(cross) + 1e-9)
    return jnp.fft.irfft2(cross, s=ref.shape[-2:])


def estimate_shifts(ref: np.ndarray, mov: np.ndarray,
                    max_shift: int = 32) -> np.ndarray:
    """Per-frame (dy, dx) such that shifting `mov` by it aligns to `ref`.

    Returns (N, 2) int array; shifts beyond max_shift are treated as
    spurious peaks and zeroed.
    """
    surf = np.asarray(_phase_corr_surface(jnp.asarray(ref), jnp.asarray(mov)))
    n, h, w = surf.shape
    flat = surf.reshape(n, -1).argmax(axis=1)
    dy = flat // w
    dx = flat % w
    # wrap-around -> signed shifts
    dy = np.where(dy > h // 2, dy - h, dy)
    dx = np.where(dx > w // 2, dx - w, dx)
    bad = (np.abs(dy) > max_shift) | (np.abs(dx) > max_shift)
    dy = np.where(bad, 0, dy)
    dx = np.where(bad, 0, dx)
    return np.stack([dy, dx], axis=1).astype(np.int32)


def compensate(frames: np.ndarray, shifts: np.ndarray,
               fill: str = "edge") -> np.ndarray:
    """Shift each (H, W) frame by its (dy, dx); vacated pixels take the edge
    value (roll + edge overwrite) so metric windows see no wrap artefacts."""
    out = np.empty_like(frames)
    for i, (dy, dx) in enumerate(shifts):
        f = np.roll(frames[i], (int(dy), int(dx)), axis=(0, 1))
        if fill == "edge":
            if dy > 0:
                f[:dy, :] = f[dy : dy + 1, :]
            elif dy < 0:
                f[dy:, :] = f[dy - 1 : dy, :]
            if dx > 0:
                f[:, :dx] = f[:, dx : dx + 1]
            elif dx < 0:
                f[:, dx:] = f[:, dx - 1 : dx]
        out[i] = f
    return out


def motion_compensate_clip(
    ref_luma: np.ndarray, cap_luma: np.ndarray, max_shift: int = 32
) -> Tuple[np.ndarray, np.ndarray]:
    """Compensate an aligned capture window against its reference frames.

    Returns (compensated_capture, shifts). Equal-length inputs required.
    """
    if ref_luma.shape != cap_luma.shape:
        raise ValueError("motion compensation expects aligned equal shapes")
    shifts = estimate_shifts(ref_luma, cap_luma, max_shift=max_shift)
    if np.any(shifts != 0):
        logger.info(
            "motion compensation: median shift dy=%d dx=%d",
            int(np.median(shifts[:, 0])), int(np.median(shifts[:, 1])),
        )
    return compensate(cap_luma, shifts), shifts
