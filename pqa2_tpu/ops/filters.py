"""Batched separable filtering / DWT primitives (jnp).

The building blocks for the VIF / motion / ADM feature ops. All functions
operate on frame batches ``(N, H, W)`` and are built from static shifted-slice
accumulations, which XLA lowers to fused VPU passes on TPU (no gather, no
convolution lowering surprises, fully static shapes).

Filter taps come from ``pqa2_tpu.golden.filters`` — a single source of truth
shared with the float64 oracles.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from pqa2_tpu.golden.filters import DB2_HI, DB2_LO


def _filter_axis(x: jnp.ndarray, taps: np.ndarray, axis: int, mode: str) -> jnp.ndarray:
    """Correlate along `axis` with mirrored borders.

    mode='reflect' mirrors without edge repeat (VIF/motion convention);
    mode='symmetric' repeats the edge sample (ADM DWT convention).
    """
    k = len(taps)
    half = k // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (half, half)
    xp = jnp.pad(x, pad, mode=mode)
    n = x.shape[axis]
    out = None
    for t in range(k):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(t, t + n)
        term = float(taps[t]) * xp[tuple(sl)]
        out = term if out is None else out + term
    return out


def sep_filter_batched(
    x: jnp.ndarray, taps: np.ndarray, mode: str = "reflect"
) -> jnp.ndarray:
    """Separable 2-D correlation over (N, H, W) batches, mirrored borders.

    Matches pqa2_tpu.golden.filters.sep_filter2d (same taps, same border
    convention) in f32.
    """
    out = _filter_axis(x, taps, axis=-2, mode=mode)
    out = _filter_axis(out, taps, axis=-1, mode=mode)
    return out


def _dwt1d_axis(x: jnp.ndarray, taps: np.ndarray, axis: int) -> jnp.ndarray:
    """Filter + decimate along `axis`: out[i] = sum_f taps[f] * x[2i-1+f],
    symmetric border extension — the ADM DWT convention
    (pqa2_tpu.golden.adm._dwt1d_axis0)."""
    n = x.shape[axis]
    n2 = (n + 1) // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 2)  # covers indices -1 .. n+1 for both parities
    xp = jnp.pad(x, pad, mode="symmetric")
    out = None
    for t in range(4):
        sl = [slice(None)] * x.ndim
        # padded index 2i + t  (the +1 pad shift cancels the -1 offset)
        sl[axis] = slice(t, t + 2 * n2 - 1, 2)
        term = float(taps[t]) * xp[tuple(sl)]
        out = term if out is None else out + term
    return out


def dwt2_batched(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """One Daubechies-2 DWT level over (N, H, W) -> dict(a, h, v, d).

    Band names follow the oracle (golden/adm.py:80-88): h = row-highpass
    (horizontal detail), v = column-highpass.
    """
    lo_r = _dwt1d_axis(x, DB2_LO, axis=-2)
    hi_r = _dwt1d_axis(x, DB2_HI, axis=-2)
    return {
        "a": _dwt1d_axis(lo_r, DB2_LO, axis=-1),
        "v": _dwt1d_axis(lo_r, DB2_HI, axis=-1),
        "h": _dwt1d_axis(hi_r, DB2_LO, axis=-1),
        "d": _dwt1d_axis(hi_r, DB2_HI, axis=-1),
    }
