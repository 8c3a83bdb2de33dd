"""Integer fixed-point ADM2 — oracle.

Emulates the fixed-point front half of libvmaf's
``VMAF_integer_feature_adm2`` extractor — the stages where quantisation is
actually measurable — and evaluates the smooth tail in float on the
integer-valued bands:

  integer (exact, pinned bit-for-bit by ops/adm_int.py):
    * 4-level db2 DWT with Q15 taps (golden/fixedpoint.py:DB2_LO_Q15),
      symmetric borders, (acc + 2^14) >> 15 rounding per 1-D pass.
      Band Q-schedule ADM_BAND_Q = (4,4,4,3): pixels enter at Q4 and level
      3's row pass drops one bit, keeping every accumulation
      sum(|q15 tap|) * |value| < 2^31.
    * decoupling: k = trunc((|t| << 15) / |o|) clipped to [0, 32768] (0 when
      signs differ or o == 0), restoration r = sign(o) * ((k*|o| + 2^14)
      >> 15), additive = t - r.  The < 1-degree angle test runs on the
      integer bands in float (its products need 64+ bits; boundary flips are
      measure-zero).

  float tail (identical formulas to golden/adm.py): Watson CSF, contrast
  masking (3x3, centre doubled, /30), cube-sum pooling with the n/32
  stabiliser, eps = 1e-10 * (w*h)/(1920*1080).

libvmaf runs the tail in fixed point too (for SIMD speed, with rounding
designed to be negligible); that residual is not modelled here — see
docs/CALIBRATION.md.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from pqa2_tpu.golden.adm import (
    COS_1DEG_SQ,
    NUM_LEVELS,
    apply_csf,
    cm_threshold,
    sum_cube,
)
from pqa2_tpu.golden.filters import symmetric_index
from pqa2_tpu.golden.fixedpoint import ADM_BAND_Q, DB2_HI_Q15, DB2_LO_Q15

_I64 = np.int64


def _dwt1d_axis0_int(x: np.ndarray, taps: np.ndarray, extra_shift: int = 0):
    """Integer filter + decimate along axis 0 (int64, exact):
    out[i] = (sum_f q15[f] * x[2i-1+f] + 2^(14+e)) >> (15 + e)."""
    n = x.shape[0]
    n2 = (n + 1) // 2
    js = 2 * np.arange(n2)[None, :] - 1 + np.arange(4)[:, None]
    js = symmetric_index(js, n)
    acc = np.zeros((n2,) + x.shape[1:], dtype=_I64)
    for t in range(4):
        acc += _I64(taps[t]) * x[js[t]]
    s = 15 + extra_shift
    return (acc + _I64(1 << (s - 1))) >> _I64(s)


def dwt2_db2_int(x: np.ndarray, extra_row_shift: int = 0):
    """One integer DWT level -> dict(a, h, v, d) (int64 bands)."""
    lo_c = _dwt1d_axis0_int(x, DB2_LO_Q15, extra_row_shift)
    hi_c = _dwt1d_axis0_int(x, DB2_HI_Q15, extra_row_shift)
    return {
        "a": _dwt1d_axis0_int(lo_c.T, DB2_LO_Q15).T,
        "v": _dwt1d_axis0_int(lo_c.T, DB2_HI_Q15).T,
        "h": _dwt1d_axis0_int(hi_c.T, DB2_LO_Q15).T,
        "d": _dwt1d_axis0_int(hi_c.T, DB2_HI_Q15).T,
    }


def dwt_pyramid_int(
    x: np.ndarray, bit_depth: int = 8
) -> List[Dict[str, np.ndarray]]:
    """Luma -> 4 levels of integer bands on the ADM_BAND_Q schedule.

    >8-bit codes carry their extra bits as fixed-point fraction: up to
    12-bit the initial shift narrows to ADM_BAND_Q[0] - (depth-8) so
    level 0 enters at Q4 on the 8-bit pixel scale. Depths 13..16 (round
    4) enter UNSHIFTED at Q(depth-8) and level 0's first 1-D pass folds
    the surplus into its rounding shift (extra = in_q - 4) — one exact
    rounding using every input bit, after which the bands are on the
    standard Q4 schedule. Device twins reproduce this bit-for-bit
    (ops/adm_int.py, ops/pallas_adm_int.py; at depth 16 their level-0
    first pass splits the i32 accumulator — value-identical)."""
    in_q = max(bit_depth - 8, 0)
    assert in_q <= 8, bit_depth
    cur = x.astype(_I64) << _I64(max(ADM_BAND_Q[0] - in_q, 0))
    out = []
    for lvl in range(NUM_LEVELS):
        if lvl:
            drop = ADM_BAND_Q[lvl - 1] - ADM_BAND_Q[lvl]
        else:
            drop = max(in_q - ADM_BAND_Q[0], 0)
        bands = dwt2_db2_int(cur, extra_row_shift=drop)
        peak = max(max(abs(int(b.min())), int(b.max()))
                   for b in bands.values())
        assert peak < (1 << 16), peak
        out.append(bands)
        cur = bands["a"]
    return out


def decouple_int(
    o: Dict[str, np.ndarray], t: Dict[str, np.ndarray], gain_limit: float
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Integer decoupling on same-Q bands; returns integer (rst, add)."""
    angle_flag = angle_flags_f32(o, t)

    rst: Dict[str, np.ndarray] = {}
    add: Dict[str, np.ndarray] = {}
    for band in ("h", "v", "d"):
        ob = o[band].astype(_I64)
        tb = t[band].astype(_I64)
        oa = np.abs(ob)
        ta = np.abs(tb)
        same_sign = (ob > 0) == (tb > 0)
        k = np.where(
            (oa > 0) & same_sign & (tb != 0),
            np.minimum((ta << _I64(15)) // np.maximum(oa, 1), 32768),
            0,
        )
        r = np.sign(ob) * ((k * oa + _I64(1 << 14)) >> _I64(15))
        if float(gain_limit) == 1.0:
            gained = r
        else:
            gained = np.rint(
                r.astype(np.float32) * np.float32(gain_limit)
            ).astype(_I64)
        r_flag = np.where(tb > 0, np.minimum(gained, tb),
                          np.where(tb < 0, np.maximum(gained, tb), tb))
        r = np.where(angle_flag, r_flag, r)
        rst[band] = r
        add[band] = tb - r
    return rst, add


def angle_flags_f32(
    o: Dict[str, np.ndarray], t: Dict[str, np.ndarray]
) -> np.ndarray:
    """The <1-degree angle test in float32 on the integer bands — the
    documented emulation spec shared by oracle and device (the exact
    products need >64 bits). tests/test_integer.py audits its agreement
    with :func:`exact_angle_flags`."""
    oh, ov = o["h"].astype(np.float32), o["v"].astype(np.float32)
    th, tv = t["h"].astype(np.float32), t["v"].astype(np.float32)
    ot_dp = oh * th + ov * tv
    cos_sq = np.float32(COS_1DEG_SQ)
    return (ot_dp >= 0.0) & (
        ot_dp * ot_dp >= cos_sq * (oh * oh + ov * ov) * (th * th + tv * tv)
    )


def exact_angle_flags(
    o: Dict[str, np.ndarray], t: Dict[str, np.ndarray]
) -> np.ndarray:
    """The <1-degree angle test evaluated with EXACT integer arithmetic.

    ``ot_dp >= 0 and ot_dp^2 >= cos^2(1deg) * |o|^2 * |t|^2`` where both
    sides need up to ~119 bits (bands are < 2^16, cos^2 is a 53-bit dyadic
    rational M/2^53). Python bignums over the flattened bands — an audit
    tool for tests (tests/test_integer.py measures how often the f32
    evaluation the production paths share disagrees with this), not a
    production path."""
    m, e = np.frexp(COS_1DEG_SQ)
    mant = int(m * (1 << 53))  # COS_1DEG_SQ = mant * 2^(e-53), exact
    shift = int(53 - int(e))  # plain int: a numpy shift would coerce int32
    oh = o["h"].astype(object).ravel()
    ov = o["v"].astype(object).ravel()
    th = t["h"].astype(object).ravel()
    tv = t["v"].astype(object).ravel()
    out = np.zeros(oh.shape[0], dtype=bool)
    for i in range(oh.shape[0]):
        dp = int(oh[i]) * int(th[i]) + int(ov[i]) * int(tv[i])
        if dp < 0:
            continue
        omag = int(oh[i]) ** 2 + int(ov[i]) ** 2
        tmag = int(th[i]) ** 2 + int(tv[i]) ** 2
        out[i] = (dp * dp) << shift >= mant * omag * tmag
    return out.reshape(o["h"].shape)


def adm_features_int(
    ref: np.ndarray, dist: np.ndarray, gain_limit: float = 100.0,
    bit_depth: int = 8,
) -> Tuple[float, List[float], float, float]:
    """Luma pair -> (adm2, [level scores], num, den), integer path."""
    ref_pyr = dwt_pyramid_int(np.asarray(ref), bit_depth)
    dist_pyr = dwt_pyramid_int(np.asarray(dist), bit_depth)
    h, w = np.asarray(ref).shape
    num = den = 0.0
    level_scores = []
    for lvl in range(NUM_LEVELS):
        o_i, t_i = ref_pyr[lvl], dist_pyr[lvl]
        rst_i, add_i = decouple_int(o_i, t_i, gain_limit)
        scale = 1.0 / (1 << ADM_BAND_Q[lvl])
        o_f = {b: o_i[b] * scale for b in ("h", "v", "d")}
        rst_f = {b: rst_i[b] * scale for b in ("h", "v", "d")}
        add_f = {b: add_i[b] * scale for b in ("h", "v", "d")}
        csf_o = apply_csf(o_f, lvl)
        csf_r = apply_csf(rst_f, lvl)
        csf_a = apply_csf(add_f, lvl)
        mt = cm_threshold(csf_a)
        num_l = den_l = 0.0
        for band in ("h", "v", "d"):
            masked = np.maximum(np.abs(csf_r[band]) - mt, 0.0)
            num_l += sum_cube(masked)
            den_l += sum_cube(csf_o[band])
        num += num_l
        den += den_l
        level_scores.append(num_l / den_l if den_l > 0 else 1.0)
    eps = 1e-10 * (w * h) / (1920.0 * 1080.0)
    return (num + eps) / (den + eps), level_scores, num, den
