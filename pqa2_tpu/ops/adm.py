"""Batched ADM2 (Detail Loss Metric) — jnp implementation.

The ``adm2`` SVR input (reference consumes it from libvmaf via the lavfi
filter string, app/vmaf_analyzer.py:406). Pipeline per frame pair — 4-level
db2 DWT, decoupling into restoration/additive, Watson-CSF weighting, contrast
masking, cube-sum pooling — mirrors the float64 oracle ``pqa2_tpu.golden.adm``
in f32, batched over frames.

NEG models pass ``gain_limit = adm_enhn_gain_limit`` (=1.0); the default 100.0
matches libvmaf's non-NEG default (effectively no clamp).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from pqa2_tpu.golden.adm import (
    BORDER_FACTOR,
    COS_1DEG_SQ,
    NUM_LEVELS,
    csf_rfactors,
)
from pqa2_tpu.ops.filters import dwt2_batched


def _decouple(o: Dict[str, jnp.ndarray], t: Dict[str, jnp.ndarray], gain_limit: float):
    """Split distorted detail bands into restoration + additive (batched).

    Mirrors golden/adm.py:decouple — angle_flag treats near-parallel (H,V)
    gradient vectors (< 1 degree) as contrast change.
    """
    oh, ov = o["h"], o["v"]
    th, tv = t["h"], t["v"]
    ot_dp = oh * th + ov * tv
    o_mag_sq = oh * oh + ov * ov
    t_mag_sq = th * th + tv * tv
    angle_flag = (ot_dp >= 0.0) & (ot_dp * ot_dp >= COS_1DEG_SQ * o_mag_sq * t_mag_sq)

    rst: Dict[str, jnp.ndarray] = {}
    add: Dict[str, jnp.ndarray] = {}
    for band in ("h", "v", "d"):
        ob, tb = o[band], t[band]
        k = jnp.where(ob != 0.0, tb / jnp.where(ob != 0.0, ob, 1.0), 0.0)
        k = jnp.clip(k, 0.0, 1.0)
        r = k * ob
        gained = r * gain_limit
        r_flag = jnp.where(
            tb > 0.0, jnp.minimum(gained, tb),
            jnp.where(tb < 0.0, jnp.maximum(gained, tb), tb),
        )
        r = jnp.where(angle_flag, r_flag, r)
        rst[band] = r
        add[band] = tb - r
    return rst, add


def _cm_threshold(csf_add: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Masking threshold: 3x3 sum (centre doubled) of |csf(additive)| over the
    three bands, / 30, symmetric borders (golden/adm.py:cm_threshold)."""
    total = None
    for band in ("h", "v", "d"):
        x = jnp.abs(csf_add[band])
        p = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="symmetric")
        h, w = x.shape[-2], x.shape[-1]
        s = None
        for di in (0, 1, 2):
            for dj in (0, 1, 2):
                term = p[:, di : di + h, dj : dj + w]
                s = term if s is None else s + term
        s = s + x  # centre counted twice
        total = s if total is None else total + s
    return total / 30.0


def _trim(w: int) -> int:
    return max(int(w * BORDER_FACTOR - 0.5), 0)


def _sum_cube(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) -> (N,) cbrt(cube-sum over central region) + cbrt(N/32)."""
    h, w = x.shape[-2], x.shape[-1]
    top, left = _trim(h), _trim(w)
    bottom, right = h - top, w - left
    core = jnp.abs(x[:, top:bottom, left:right])
    n = (bottom - top) * (right - left)
    return jnp.cbrt(jnp.sum(core**3, axis=(-2, -1))) + float(n / 32.0) ** (1.0 / 3.0)


def adm_features_batched(
    ref: jnp.ndarray, dist: jnp.ndarray, gain_limit: float = 100.0
) -> jnp.ndarray:
    """(N, H, W) luma pair -> (N,) adm2 feature."""
    ref = ref.astype(jnp.float32)
    dist = dist.astype(jnp.float32)
    h, w = ref.shape[-2], ref.shape[-1]
    num = 0.0
    den = 0.0
    cur_r, cur_d = ref, dist
    for lvl in range(NUM_LEVELS):
        o_bands = dwt2_batched(cur_r)
        t_bands = dwt2_batched(cur_d)
        cur_r, cur_d = o_bands["a"], t_bands["a"]
        rst, add = _decouple(o_bands, t_bands, gain_limit)
        fh, fv, fd = csf_rfactors(lvl)
        factors = {"h": fh, "v": fv, "d": fd}
        csf_a = {b: add[b] * factors[b] for b in ("h", "v", "d")}
        mt = _cm_threshold(csf_a)
        for band in ("h", "v", "d"):
            masked = jnp.maximum(jnp.abs(rst[band] * factors[band]) - mt, 0.0)
            num = num + _sum_cube(masked)
            den = den + _sum_cube(o_bands[band] * factors[band])
    eps = 1e-10 * (w * h) / (1920.0 * 1080.0)
    return (num + eps) / (den + eps)
