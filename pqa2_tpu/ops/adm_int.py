"""Integer fixed-point ADM2 — batched jnp implementation (TPU-safe int32).

Device twin of ``pqa2_tpu.golden.adm_int``: integer Q15 db2 DWT on the
ADM_BAND_Q schedule and integer decoupling (exact, pinned against the
oracle), with the smooth CSF/masking/pooling tail evaluated in f32 on the
integer-valued bands — identical formulas to ops/adm.py.

The decouple division k = trunc((|t| << 15) / |o|) is computed exactly
without 64-bit integers: an f32 estimate of the quotient, then the residual
recovered in wrapping int32 arithmetic (the true remainder is small, so the
wrap cancels), then a truncating-division correction step.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pqa2_tpu.golden.adm import COS_1DEG_SQ, NUM_LEVELS, csf_rfactors
from pqa2_tpu.golden.fixedpoint import ADM_BAND_Q, DB2_HI_Q15, DB2_LO_Q15
from pqa2_tpu.ops.adm import _cm_threshold, _sum_cube
from pqa2_tpu.ops.vif_int import to_native_grid

_I32 = jnp.int32


def _dwt1d_axis_int(
    x: jnp.ndarray, taps: np.ndarray, axis: int, extra_shift: int = 0
) -> jnp.ndarray:
    """Integer filter + decimate along axis (ops/filters.py:_dwt1d_axis with
    Q15 taps and (acc + 2^(14+e)) >> (15+e) rounding). x int32."""
    n = x.shape[axis]
    n2 = (n + 1) // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 2)
    xp = jnp.pad(x, pad, mode="symmetric")
    acc = None
    for t in range(4):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(t, t + 2 * n2 - 1, 2)
        term = _I32(int(taps[t])) * xp[tuple(sl)]
        acc = term if acc is None else acc + term
    s = 15 + extra_shift
    return (acc + _I32(1 << (s - 1))) >> s


def _dwt1d_axis_int_split(
    x: jnp.ndarray, taps: np.ndarray, axis: int, extra_shift: int = 0
) -> jnp.ndarray:
    """_dwt1d_axis_int for NON-NEGATIVE x up to 2^16 (depth-16 level-0
    codes), where the plain i32 accumulator would overflow (sum|q15 tap| *
    65535 ~ 2^31.74). Byte-splits the input: with A = filt(x >> 8),
    B = filt(x & 255) the exact result is

        (A*2^8 + B + 2^(s-1)) >> s  =  (A >> (s-8))
                                       + (((A & m)<<8) + B + 2^(s-1)) >> s

    (floor-division algebra, any signed A/B) — every intermediate < 2^25,
    value-identical to the oracle's int64 pass."""
    n = x.shape[axis]
    n2 = (n + 1) // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 2)
    xp = jnp.pad(x, pad, mode="symmetric")
    xh = xp >> 8
    xl = xp & _I32(255)
    acc_h = None
    acc_l = None
    for t in range(4):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(t, t + 2 * n2 - 1, 2)
        c = _I32(int(taps[t]))
        th_ = c * xh[tuple(sl)]
        tl_ = c * xl[tuple(sl)]
        acc_h = th_ if acc_h is None else acc_h + th_
        acc_l = tl_ if acc_l is None else acc_l + tl_
    s = 15 + extra_shift
    a1 = acc_h >> (s - 8)
    a0 = acc_h & _I32((1 << (s - 8)) - 1)
    return a1 + (((a0 << 8) + acc_l + _I32(1 << (s - 1))) >> s)


def dwt2_int_batched(
    x: jnp.ndarray, extra_row_shift: int = 0, split_first: bool = False
) -> Dict[str, jnp.ndarray]:
    """One integer DWT level over (N, H, W) int32 -> dict(a, h, v, d).

    ``split_first`` runs the first (vertical) pass in split arithmetic —
    required only for depth-16 level 0 (see _dwt1d_axis_int_split)."""
    first = _dwt1d_axis_int_split if split_first else _dwt1d_axis_int
    lo_r = first(x, DB2_LO_Q15, axis=-2, extra_shift=extra_row_shift)
    hi_r = first(x, DB2_HI_Q15, axis=-2, extra_shift=extra_row_shift)
    return {
        "a": _dwt1d_axis_int(lo_r, DB2_LO_Q15, axis=-1),
        "v": _dwt1d_axis_int(lo_r, DB2_HI_Q15, axis=-1),
        "h": _dwt1d_axis_int(hi_r, DB2_LO_Q15, axis=-1),
        "d": _dwt1d_axis_int(hi_r, DB2_HI_Q15, axis=-1),
    }


def _div_q15_trunc(ta: jnp.ndarray, oa: jnp.ndarray) -> jnp.ndarray:
    """Exact trunc((ta << 15) / oa) for int32 0 <= ta, 0 < oa < 2^16.

    f32 quotient estimate + wrapping-int32 residual + one truncating
    correction division; result clipped to [0, 32768] by the caller's use.
    """
    oa_safe = jnp.maximum(oa, 1)
    qf = jnp.floor(ta.astype(jnp.float32) * 32768.0 / oa_safe.astype(jnp.float32))
    q0 = jnp.clip(qf, 0.0, 65535.0).astype(_I32)
    # Residual mod 2^32: exact because the true remainder is < 2^21.
    rem = (ta << 15) - q0 * oa_safe
    corr = jax.lax.div(rem, oa_safe)
    q = q0 + corr
    rem2 = rem - corr * oa_safe
    return jnp.where(rem2 < 0, q - 1, q)


def decouple_int_batched(
    o: Dict[str, jnp.ndarray], t: Dict[str, jnp.ndarray], gain_limit: float
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Integer decoupling (golden/adm_int.py:decouple_int), batched."""
    ohf = o["h"].astype(jnp.float32)
    ovf = o["v"].astype(jnp.float32)
    thf = t["h"].astype(jnp.float32)
    tvf = t["v"].astype(jnp.float32)
    ot_dp = ohf * thf + ovf * tvf
    angle_flag = (ot_dp >= 0.0) & (
        ot_dp * ot_dp
        >= COS_1DEG_SQ * (ohf * ohf + ovf * ovf) * (thf * thf + tvf * tvf)
    )

    rst: Dict[str, jnp.ndarray] = {}
    add: Dict[str, jnp.ndarray] = {}
    for band in ("h", "v", "d"):
        ob, tb = o[band], t[band]
        oa = jnp.abs(ob)
        ta = jnp.abs(tb)
        same_sign = (ob > 0) == (tb > 0)
        k = jnp.where(
            (oa > 0) & same_sign & (tb != 0),
            jnp.minimum(_div_q15_trunc(ta, oa), 32768),
            0,
        )
        r = jnp.sign(ob) * ((k * oa + _I32(1 << 14)) >> 15)
        if float(gain_limit) == 1.0:
            gained = r
        else:
            gained = jnp.round(r.astype(jnp.float32) * gain_limit).astype(_I32)
        r_flag = jnp.where(tb > 0, jnp.minimum(gained, tb),
                           jnp.where(tb < 0, jnp.maximum(gained, tb), tb))
        r = jnp.where(angle_flag, r_flag, r)
        rst[band] = r
        add[band] = tb - r
    return rst, add


def adm_features_int_batched(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    gain_limit: float = 100.0,
    bit_depth: int = 8,
) -> jnp.ndarray:
    """(N, H, W) luma pair -> (N,) adm2, integer fixed-point path."""
    h, w = ref.shape[-2], ref.shape[-1]
    # Native >8-bit grid: codes carry in_q fractional bits. Up to Q4 the
    # initial shift keeps level 0 at Q4 on the 8-bit scale; deeper codes
    # (13..16-bit) enter unshifted and level 0's first pass folds the
    # surplus into its rounding shift (golden/adm_int.py:dwt_pyramid_int).
    # Depth 16 additionally needs the split first pass (accumulator
    # headroom — _dwt1d_axis_int_split).
    ref_c, in_q = to_native_grid(ref, bit_depth)
    dist_c, _ = to_native_grid(dist, bit_depth)
    cur_r = ref_c.astype(_I32) << max(ADM_BAND_Q[0] - in_q, 0)
    cur_d = dist_c.astype(_I32) << max(ADM_BAND_Q[0] - in_q, 0)
    split0 = in_q >= 8
    num = 0.0
    den = 0.0
    for lvl in range(NUM_LEVELS):
        if lvl:
            drop = ADM_BAND_Q[lvl - 1] - ADM_BAND_Q[lvl]
        else:
            drop = max(in_q - ADM_BAND_Q[0], 0)
        o_bands = dwt2_int_batched(cur_r, extra_row_shift=drop,
                                   split_first=split0 and lvl == 0)
        t_bands = dwt2_int_batched(cur_d, extra_row_shift=drop,
                                   split_first=split0 and lvl == 0)
        cur_r, cur_d = o_bands["a"], t_bands["a"]
        rst, add = decouple_int_batched(o_bands, t_bands, gain_limit)
        scale = 1.0 / (1 << ADM_BAND_Q[lvl])
        fh, fv, fd = csf_rfactors(lvl)
        factors = {"h": fh * scale, "v": fv * scale, "d": fd * scale}
        csf_a = {b: add[b].astype(jnp.float32) * factors[b]
                 for b in ("h", "v", "d")}
        mt = _cm_threshold(csf_a)
        for band in ("h", "v", "d"):
            csf_r = rst[band].astype(jnp.float32) * factors[band]
            masked = jnp.maximum(jnp.abs(csf_r) - mt, 0.0)
            num = num + _sum_cube(masked)
            csf_o = o_bands[band].astype(jnp.float32) * factors[band]
            den = den + _sum_cube(csf_o)
    eps = 1e-10 * (w * h) / (1920.0 * 1080.0)
    return (num + eps) / (den + eps)
