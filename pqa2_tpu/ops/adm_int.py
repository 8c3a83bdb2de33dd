"""Integer fixed-point ADM2 — batched jnp implementation (TPU-safe int32).

Device twin of ``pqa2_tpu.golden.adm_int``, fixed point END TO END: integer
Q15 db2 DWT on the ADM_BAND_Q schedule, integer decoupling, fixed-point CSF
(per-level IRF rfactors), integer contrast masking (trunc(S/30)), and exact
uint64 cube-sum pooling — every integer stage bit-identical to the int64
oracle, with only the final cbrt + power-of-two rescale in f32 (the shared
digits4_to_f32 rounding chain; see golden/adm_int.py for the schedule).

The uint64 cube sums are computed without 64-bit integers: each v^3
(v <= 2^14) is split into base-2^16 digit columns that are row-summed in
int32, carry-folded per row, and column-summed — the same digit-cascade
style as the exact VIF statistic (ops/vif_int.py:_sum_pair).

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

from pqa2_tpu.golden.adm import COS_1DEG_SQ, NUM_LEVELS
from pqa2_tpu.golden.fixedpoint import (
    ADM_BAND_Q,
    ADM_CSF_SHIFT,
    ADM_TAIL_TABLES,
    DB2_HI_Q15,
    DB2_LO_Q15,
    adm_cube_shift,
)
from pqa2_tpu.ops.vif_int import to_native_grid

_I32 = jnp.int32
_M16 = jnp.int32(0xFFFF)


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
    """Exact trunc((ta << 15) / oa) for int32 0 <= ta < 2^24, oa < 2^24,
    on the callers' effective range (the result is clipped to [0, 32768]
    downstream, so only quotients <= 32769 must be exact).

    Biased-LOW f32 estimate + ONE conditional correction (the same shape
    as the VIF long division's digit step, ops/vif_int.py:_div_u64_u32):
    ta*32768 is EXACT in f32 (24-bit integer times a power of two), so
    the only estimate error is the hoisted reciprocal's ~2 ulp —
    < 0.004 absolute on a <= 32769 quotient — and subtracting 0.25 pins
    floor(estimate) to {q-1, q}. The wrapping-int32 residual is exact
    (|true residual| < 2*oa < 2^25); one compare adds the missing 1.
    Quotients past the clip range can land anywhere >= 32768 after the
    fixup — jnp.minimum(..., 32768) at the caller absorbs them. No
    integer division, no second f32 divide — Mosaic-safe, shared by the
    XLA twin and the fused kernel (bit-identical paths).
    """
    oa_safe = jnp.maximum(oa, 1)
    rdf = jnp.float32(1.0) / oa_safe.astype(jnp.float32)
    qf = jnp.floor(ta.astype(jnp.float32) * jnp.float32(32768.0) * rdf
                   - jnp.float32(0.25))
    q0 = jnp.clip(qf, 0.0, 65535.0).astype(_I32)
    rem = (ta << 15) - q0 * oa_safe  # wrapping int32; exact in range
    return q0 + (rem >= oa_safe).astype(_I32)


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


def _trim(w: int) -> int:
    return max(int(w * 0.1 - 0.5), 0)


def _icsf(band: jnp.ndarray, irf: int) -> jnp.ndarray:
    """Fixed-point CSF (golden/adm_int.py:_icsf): (band*IRF + 2^12) >> 13.
    |band| < 2^16 and IRF < 2^15 keep the product inside int32."""
    return (band * _I32(irf) + _I32(1 << (ADM_CSF_SHIFT - 1))) >> ADM_CSF_SHIFT


def _cm_thr_int_batched(icsf_a: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Integer masking threshold trunc(S/30) (golden/adm_int.py:_cm_thr_int);
    S < 30 * 2^18 fits int32 and lax.div is exact truncation."""
    total = None
    for band in ("h", "v", "d"):
        x = jnp.abs(icsf_a[band])
        p = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="symmetric")
        h, w = x.shape[-2], x.shape[-1]
        s = None
        for di in (0, 1, 2):
            for dj in (0, 1, 2):
                term = p[:, di : di + h, dj : dj + w]
                s = term if s is None else s + term
        s = s + x  # centre counted twice
        total = s if total is None else total + s
    return jax.lax.div(total, _I32(30))


def _cube_digit_sums(x: jnp.ndarray, d_shift: int) -> jnp.ndarray:
    """(N, Hc, Wc) i32 >= 0 (icsf domain) -> (N, 4) exact base-2^16 digits
    of sum(v^3), v = (x + 2^(D-1)) >> D <= 2^14 (golden/adm_int.py:
    _cube_digits). v^3 is split into 16-bit-aligned columns, row-summed in
    int32, carry-folded per row, column-summed, then normalised; every
    intermediate stays under 2^31 for W <= 2^13 and H <= 2^15 rows."""
    v = (x + _I32(1 << (d_shift - 1))) >> d_shift
    c = v * v                  # <= 2^28
    hi = (c >> 16) * v         # <= 2^26; v^3 = hi*2^16 + lo
    lo = (c & _M16) * v        # < 2^30
    s0 = jnp.sum(lo & _M16, axis=-1)
    s1 = jnp.sum((lo >> 16) + (hi & _M16), axis=-1)
    s2 = jnp.sum(hi >> 16, axis=-1)
    s1 = s1 + (s0 >> 16)
    s0 = s0 & _M16
    s2 = s2 + (s1 >> 16)
    s1 = s1 & _M16
    s3 = s2 >> 16
    s2 = s2 & _M16
    d0 = jnp.sum(s0, axis=-1)
    d1 = jnp.sum(s1, axis=-1)
    d2 = jnp.sum(s2, axis=-1)
    d3 = jnp.sum(s3, axis=-1)
    return normalize_digits4(d3, d2, d1, d0)


def normalize_digits4(d3, d2, d1, d0):
    """Carry-propagate raw base-2^16 digit column sums (each < 2^31) into
    normalised digits (..., 4) hi->lo, every digit < 2^16."""
    r0 = d0 & _M16
    t1 = d1 + (d0 >> 16)
    r1 = t1 & _M16
    t2 = d2 + (t1 >> 16)
    r2 = t2 & _M16
    t3 = d3 + (t2 >> 16)
    return jnp.stack([t3, r2, r1, r0], axis=-1)


def _digits4_to_f32(d: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) digits -> f32, the pinned high-to-low rounding chain
    (golden/fixedpoint.py:digits4_to_f32; the *2^16 steps are exact)."""
    f = d[..., 0].astype(jnp.float32)
    for k in (1, 2, 3):
        f = f * jnp.float32(65536.0) + d[..., k].astype(jnp.float32)
    return f


def _tail_level_digits(
    o_bands: Dict[str, jnp.ndarray],
    rst: Dict[str, jnp.ndarray],
    add: Dict[str, jnp.ndarray],
    lvl: int,
) -> jnp.ndarray:
    """One level's integer CSF/masking/pooling -> (N, 3, 2, 4) digit sums
    (bands h/v/d x num/den x base-2^16 digits)."""
    irf, _ = ADM_TAIL_TABLES[lvl]
    icsf_o = {b: _icsf(o_bands[b], irf[i]) for i, b in enumerate("hvd")}
    icsf_r = {b: _icsf(rst[b], irf[i]) for i, b in enumerate("hvd")}
    icsf_a = {b: _icsf(add[b], irf[i]) for i, b in enumerate("hvd")}
    thr = _cm_thr_int_batched(icsf_a)
    h2, w2 = o_bands["h"].shape[-2], o_bands["h"].shape[-1]
    th, tw = _trim(h2), _trim(w2)
    core = (slice(None), slice(th, h2 - th), slice(tw, w2 - tw))
    d = adm_cube_shift((h2 - 2 * th) * (w2 - 2 * tw))
    outs = []
    for band in "hvd":
        masked = jnp.maximum(jnp.abs(icsf_r[band]) - thr, 0)
        outs.append(jnp.stack(
            [_cube_digit_sums(masked[core], d),
             _cube_digit_sums(jnp.abs(icsf_o[band])[core], d)], axis=1))
    return jnp.stack(outs, axis=1)  # (N, 3, 2, 4)


def _band_pyramid_int(ref, dist, gain_limit, bit_depth):
    """Shared front half: per level (o_bands, rst, add) integer dicts."""
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
        yield o_bands, rst, add


def adm_pooled_digit_sums_batched(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    gain_limit: float = 100.0,
    bit_depth: int = 8,
) -> jnp.ndarray:
    """(N, H, W) pair -> (N, NUM_LEVELS, 3, 2, 4) int32 exact pooled cube
    sums — the bit-pinning surface vs golden/adm_int.py."""
    levels = [
        _tail_level_digits(o, r, a, lvl)
        for lvl, (o, r, a) in enumerate(
            _band_pyramid_int(ref, dist, gain_limit, bit_depth))
    ]
    return jnp.stack(levels, axis=1)


def adm_from_digit_sums_batched(
    digits: jnp.ndarray, h: int, w: int
) -> jnp.ndarray:
    """(N, NUM_LEVELS, 3, 2, 4) digit sums -> (N,) adm2 in f32, the same
    operation order as golden/adm_int.py:adm_from_digit_sums."""
    num = 0.0
    den = 0.0
    h2, w2 = h, w
    for lvl in range(NUM_LEVELS):
        h2, w2 = (h2 + 1) // 2, (w2 + 1) // 2
        th, tw = _trim(h2), _trim(w2)
        n_core = (h2 - 2 * th) * (w2 - 2 * tw)
        _, f_level = ADM_TAIL_TABLES[lvl]
        scale = float(2.0 ** (adm_cube_shift(n_core) - f_level))
        stab = float(n_core / 32.0) ** (1.0 / 3.0)
        for i in range(3):
            num = num + jnp.cbrt(_digits4_to_f32(digits[:, lvl, i, 0])) * scale + stab
            den = den + jnp.cbrt(_digits4_to_f32(digits[:, lvl, i, 1])) * scale + stab
    eps = 1e-10 * (w * h) / (1920.0 * 1080.0)
    return (num + eps) / (den + eps)


def adm_features_int_batched(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    gain_limit: float = 100.0,
    bit_depth: int = 8,
) -> jnp.ndarray:
    """(N, H, W) luma pair -> (N,) adm2, integer fixed-point path."""
    h, w = ref.shape[-2], ref.shape[-1]
    digits = adm_pooled_digit_sums_batched(ref, dist, gain_limit, bit_depth)
    return adm_from_digit_sums_batched(digits, h, w)
