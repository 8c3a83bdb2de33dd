"""Integer fixed-point VIF — batched jnp implementation (TPU-safe uint32).

Bit-exact device twin of the oracle ``pqa2_tpu.golden.vif_int`` (libvmaf's
``VMAF_integer_feature_vif*`` fixed-point moment pipeline): Q16 taps, the
same rounding schedule, integer sigma statistics.  TPUs have no native
64-bit integers, so every accumulation that exceeds 32 bits is done with
exact uint32 split arithmetic:

  * weighted sums needing ``(acc + 2^15) >> 16``: split each term t into
    (t >> 16, t & 0xffff); because the Q16 taps sum to exactly 65536, both
    partial sums fit uint32 and
    ``(total + 2^15) >> 16  ==  A + ((B + 2^15) >> 16)`` exactly.
  * ``(a*b + 2^31) >> 32`` (mu^2 / mu1*mu2): 16-bit limb products with
    explicit carry bits (_mul_shift32).

The num/den statistic is evaluated exactly as libvmaf's integer path
does (since round 3): Q11 log2-LUT lookups on truncating 16-bit mantissas
with exact integer accumulators, the double-precision gain chain
reproduced via an exact u64/u32 long division plus f32 epsilon-boundary
comparisons (see _statistic; golden/vif_int.py is the float64 oracle).
The round-2 smooth-f32-log statistic remains as _statistic_fast
(precision="integer_fast"). All Python loops below are over filter taps /
scales — static and unrolled at trace time; shapes stay (N, H, W).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pqa2_tpu.golden.fixedpoint import SIGMA_NSQ_Q16, VIF_FILTERS_Q16

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


def _pad_reflect(x: jnp.ndarray, half: int, axis: int) -> jnp.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (half, half)
    return jnp.pad(x, pad, mode="reflect")


def _slices(xp: jnp.ndarray, k: int, n: int, axis: int):
    for t in range(k):
        sl = [slice(None)] * xp.ndim
        sl[axis] = slice(t, t + n)
        yield xp[tuple(sl)]


def _conv_direct(x: jnp.ndarray, taps: np.ndarray, axis: int, shift: int):
    """Correlate along axis in uint32; optional rounding right-shift.

    Valid only when sum(taps)*max(x) < 2^32 (taps sum to 2^16, so max(x)
    must stay < 2^16) — asserted by the callers' Q-schedules.
    """
    k = len(taps)
    n = x.shape[axis]
    xp = _pad_reflect(x, k // 2, axis)
    acc = None
    for f, s in zip(taps, _slices(xp, k, n, axis)):
        term = _U32(int(f)) * s
        acc = term if acc is None else acc + term
    if shift:
        acc = (acc + _U32(1 << (shift - 1))) >> shift
    return acc


def _conv_split(x: jnp.ndarray, taps: np.ndarray, axis: int,
                shift: int = 16) -> jnp.ndarray:
    """Exact (sum_t f_t * x_t + 2^(shift-1)) >> shift for uint32 x.

    Splitting each term at the shift boundary keeps both partial sums in
    u32: 2^s*sum(f*hi) + sum(f*lo), and floor((2^s*A + B + 2^(s-1))/2^s)
    == A + ((B + 2^(s-1)) >> s) holds exactly for B >= 0. Caller contract:
    sum(f)*max(x)>>shift < 2^32 (the Q-schedules assert their bounds)."""
    k = len(taps)
    n = x.shape[axis]
    xp = _pad_reflect(x, k // 2, axis)
    mask = _U32((1 << shift) - 1)
    acc_hi = None
    acc_lo = None
    for f, s in zip(taps, _slices(xp, k, n, axis)):
        fc = _U32(int(f))
        hi = fc * (s >> shift)
        lo = fc * (s & mask)
        acc_hi = hi if acc_hi is None else acc_hi + hi
        acc_lo = lo if acc_lo is None else acc_lo + lo
    return acc_hi + ((acc_lo + _U32(1 << (shift - 1))) >> shift)


def _conv_split16(x: jnp.ndarray, taps: np.ndarray, axis: int) -> jnp.ndarray:
    """Exact (sum_t f_t * x_t + 2^15) >> 16 for uint32 x of any magnitude."""
    return _conv_split(x, taps, axis, 16)


def _mul_shift32(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact (a*b + 2^31) >> 32 for uint32 a, b (16-bit limbs + carries)."""
    ah, al = a >> 16, a & _MASK16
    bh, bl = b >> 16, b & _MASK16
    m1 = ah * bl
    m2 = al * bh
    mid = m1 + m2
    c_mid = (mid < m1).astype(_U32)
    low = al * bl
    t1 = (mid & _MASK16) << 16
    s1 = t1 + low
    c1 = (s1 < t1).astype(_U32)
    s2 = s1 + _U32(0x80000000)
    c2 = (s2 < s1).astype(_U32)
    return ah * bh + (c_mid << 16) + (mid >> 16) + c1 + c2


def _decimate2(x: jnp.ndarray, taps: np.ndarray, in_q: int) -> jnp.ndarray:
    """Blur + 2x decimation: Q{in_q} pixels -> Q8 pixels (uint32).

    Row stride + pair reshape for the column decimation (a double-strided
    slice lowers to a slow gather on TPU — same trick as ops/vif.py).
    """
    tmp = _conv_direct(x, taps, axis=-2, shift=8 + in_q)  # rows -> Q8
    out = _conv_direct(tmp, taps, axis=-1, shift=16)  # cols, Q24 -> Q8
    n, hh, ww = out.shape
    out = out[:, ::2, :]
    if ww % 2:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, 1)))
    return out.reshape(n, (hh + 1) // 2, (ww + 1) // 2, 2)[..., 0]


def _sigma_planes(
    ref: jnp.ndarray, dist: jnp.ndarray, taps: np.ndarray, in_q: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Integer sigma planes (int32, Q16 pixel^2) for one scale.

    Q-schedule (golden/vif_int.py:_moments_int): vertical mu -> Q8 pixels
    (fits u32 direct); vertical products >> 16 (needs the split for Q8
    inputs); horizontal mu -> Q24 (direct, no shift); horizontal products
    -> Q16 pixel^2 (split when a final >> 16 is due).
    """
    v_mu_shift = 8 + in_q

    mu1 = _conv_direct(_conv_direct(ref, taps, -2, v_mu_shift), taps, -1, 0)
    mu2 = _conv_direct(_conv_direct(dist, taps, -2, v_mu_shift), taps, -1, 0)

    def prod_plane(a, b):
        p = a * b  # exact in u32: operands < 2^16
        if in_q == 0:
            # p < 2^16 -> both passes accumulate within u32.
            t = _conv_direct(p, taps, -2, shift=16)
            return _conv_direct(t, taps, -1, shift=0)
        # Vertical rounds >> 16 (Q16 taps), horizontal >> 2*in_q back to
        # Q16 pixel^2. Split bounds: vertical hi = p>>16 <= 2^(2*in_q)-ish,
        # horizontal hi <= maxcode^2 >> 2*in_q < 2^16 — both partial sums
        # stay under 2^32 for in_q <= 8 (10/12-bit native and the Q8
        # decimated scales).
        t = _conv_split(p, taps, axis=-2, shift=16)
        return _conv_split(t, taps, axis=-1, shift=2 * in_q)

    xx = prod_plane(ref, ref)
    yy = prod_plane(dist, dist)
    xy = prod_plane(ref, dist)

    s1 = (xx - _mul_shift32(mu1, mu1)).astype(jnp.int32)
    s2 = (yy - _mul_shift32(mu2, mu2)).astype(jnp.int32)
    s12 = (xy - _mul_shift32(mu1, mu2)).astype(jnp.int32)
    return s1, s2, s12


def _statistic_fast(s1i, s2i, s12i, gain_limit: float):
    """num/den sums from int32 Q16 sigma planes — smooth f32 logs.

    The round-2 throughput statistic: identical branch structure and
    clamp order to the exact path but with jnp.log2 instead of the LUT
    quantisation. Pooled feature delta vs the exact statistic is
    ~1e-5..1e-4 (pinned in tests); selected via
    precision="integer_fast"."""
    s1 = jnp.maximum(s1i, 0).astype(jnp.float32) / 65536.0
    s2 = jnp.maximum(s2i, 0).astype(jnp.float32) / 65536.0
    s12 = s12i.astype(jnp.float32) / 65536.0

    log_branch = s1i >= SIGMA_NSQ_Q16
    g = jnp.where(s12 > 0.0, s12 / jnp.maximum(s1, 1e-10), 0.0)
    # NEG clamp after sv (libvmaf order; matches the exact statistic).
    sv_sq = jnp.maximum(s2 - g * s12, 0.0)
    g = jnp.minimum(g, gain_limit)
    num_log = jnp.log2(1.0 + g * g * s1 / (sv_sq + 2.0))
    den_log = jnp.log2(1.0 + s1 / 2.0)
    num = jnp.where(log_branch, num_log, 1.0 - s2 * (4.0 / (255.0 * 255.0)))
    den = jnp.where(log_branch, den_log, 1.0)
    axes = tuple(range(1, num.ndim))
    return jnp.sum(num, axis=axes), jnp.sum(den, axis=axes)


# -- exact LUT statistic (libvmaf integer semantics) ------------------------

_EPS64 = float(np.float64(65536.0) * np.float64(1.0e-10))  # libvmaf's eps


def _sum_pair(x: jnp.ndarray):
    """Exact sum of i32 values |x| < 2^17 over all but the batch axis.

    Returns (hi, lo) i32 with value = hi*65536 + lo, |hi| < 2^24,
    0 <= lo < 2^16 — every piece exactly representable in f32. Assumes
    H, W <= 4096 (row sums stay under 2^31; 8K frames are tiled upstream).
    """
    rs = jnp.sum(x, axis=-1)  # |rs| <= W * 2^17 < 2^29
    hi = rs >> 16  # arithmetic shift: floor division by 65536
    lo = rs & jnp.int32(0xFFFF)
    shi = jnp.sum(hi, axis=-1)  # |.| <= H * 2^13 < 2^25
    slo = jnp.sum(lo, axis=-1)  # <= H * 2^16 < 2^28
    shi = shi + (slo >> 16)
    slo = slo & jnp.int32(0xFFFF)
    return shi, slo


def _mul_split(a: jnp.ndarray, b: jnp.ndarray):
    """Exact u32 x u32 -> (hi, lo) u32 pair (16-bit limbs + carries)."""
    ah, al = a >> 16, a & _MASK16
    bh, bl = b >> 16, b & _MASK16
    lo = al * bl
    mid1 = ah * bl
    mid2 = al * bh
    mid = mid1 + mid2
    c_mid = (mid < mid1).astype(_U32)  # carry out of the mid sum
    lo2 = lo + ((mid & _MASK16) << 16)
    c_lo = (lo2 < lo).astype(_U32)
    hi = ah * bh + (mid >> 16) + (c_mid << 16) + c_lo
    return hi, lo2


def _mul_16x32(q: jnp.ndarray, d: jnp.ndarray):
    """Exact u32 x u32 -> (hi, lo) for q <= 2^16: two multiplies instead
    of _mul_split's four (q*dl and q*dh both stay under 2^32)."""
    lo_part = q * (d & _MASK16)
    mid = q * (d >> 16)
    lo = lo_part + ((mid & _MASK16) << 16)
    carry = (lo < lo_part).astype(_U32)
    hi = (mid >> 16) + carry
    return hi, lo


def _u32_f32(v: jnp.ndarray) -> jnp.ndarray:
    """u32 -> f32, Mosaic-safe (no direct u32<->f32 convert on TPU).

    hi*65536 is exact (hi < 2^16) and lo is exact, so the single f32 add
    rounds once — bit-identical to a direct correctly-rounded cast for
    every u32 value."""
    hi = (v >> 16).astype(jnp.int32).astype(jnp.float32)
    lo = (v & _MASK16).astype(jnp.int32).astype(jnp.float32)
    return hi * jnp.float32(65536.0) + lo


def _f32_u32(v: jnp.ndarray) -> jnp.ndarray:
    """f32 -> u32 for values in [0, 2^31): the i32 route is exact."""
    return v.astype(jnp.int32).astype(_U32)


def _pair_sub(a_hi, a_lo, b_hi, b_lo):
    """(a - b) on u32 pairs -> (hi, lo, borrow) with borrow in {0,1}."""
    lo = a_lo - b_lo
    borrow_lo = (a_lo < b_lo).astype(_U32)
    hi = a_hi - b_hi - borrow_lo
    borrow = ((a_hi < b_hi) | ((a_hi == b_hi) & (borrow_lo > 0))).astype(_U32)
    return hi, lo, borrow


def _div_u64_u32(p_hi: jnp.ndarray, p_lo: jnp.ndarray, d: jnp.ndarray):
    """Exact floor((p_hi*2^32 + p_lo) / d) with remainder, for d >= 2^17
    and p < 2^62 (the statistic's envelope: p = s12^2 with s12 < 2^31,
    d = s1 >= SIGMA_NSQ_Q16 = 2^17 on the log branch, 2^20 on masked
    lanes — pinned at the boundary in tests/test_log2lut.py).

    Base-2^16 schoolbook long division; each digit is an f32 estimate
    (error well under 1 for d >= 2^16) followed by an exact integer
    remainder check and a bounded +-1 fixup. Returns (q_hi, q_lo, r) —
    quotient as a u32 pair (it can exceed 32 bits when p ~ 2^62 and
    d ~ 2^17) and the final remainder r < d.

    THREE digit rounds, not four: q = p/d < 2^62/2^17 = 2^45, so the top
    base-2^16 digit (quotient bits 48..63) is identically zero, and the
    remainder entering round two is just p's top limb (p_hi >> 16 < 2^14
    < d — no reduction needed). A quarter of the division's VPU work
    drops out statically.

    The division is hoisted to ONE reciprocal per element (the three
    per-digit divides become multiplies): the estimate's relative error
    grows to a few ulp, i.e. < 0.05 absolute on a < 2^16 digit — still
    far inside the +-1 fixup's budget, and the fixup is exact-integer,
    so correctness is independent of how sloppy the backend's f32
    divide/rcp is (Mosaic, XLA:TPU and XLA:CPU all verified).
    """
    df = _u32_f32(d)
    rdf = jnp.float32(1.0) / df
    limbs = [p_hi & _MASK16, p_lo >> 16, p_lo & _MASK16]
    rem_hi = jnp.zeros_like(d)
    rem_lo = p_hi >> 16  # < 2^14 < d: the skipped round's exact remainder
    digits = []
    for limb in limbs:
        # rem = rem * 2^16 + limb  (rem < d*2^16 <= 2^47: hi has >=17
        # leading zeros before the shift, so no bits are lost)
        rem_hi = (rem_hi << 16) | (rem_lo >> 16)
        rem_lo = ((rem_lo & _MASK16) << 16) | limb
        # rem_hi < 2^15 (rem < d*2^16 <= 2^47), so its f32 convert is one
        # exact i32 cast — no 16-bit limb split needed.
        remf = (rem_hi.astype(jnp.int32).astype(jnp.float32)
                * jnp.float32(2.0**32) + _u32_f32(rem_lo))
        # Biased-LOW estimate: the unbiased error is < +-0.02 absolute
        # (remf rounding + hoisted-reciprocal looseness + one product
        # rounding, each <= 2^-7 on a < 2^16 digit), so subtracting a
        # 0.0625 bias pins the estimate to {q-1, q} — the fixup becomes
        # ONE conditional add instead of the former two-sided +-1 pair
        # (the 'over' branch with its carry plumbing drops out, and the
        # post-fixup remainder r < d < 2^31 makes u32 wraparound handle
        # the hi-word borrow for free).
        q = jnp.floor(remf * rdf - jnp.float32(0.0625))
        q = _f32_u32(jnp.clip(q, 0.0, 65535.0))
        qd_hi, qd_lo = _mul_16x32(q, d)
        r_hi, r_lo, _ = _pair_sub(rem_hi, rem_lo, qd_hi, qd_lo)  # >= 0
        under = (r_hi > 0) | (r_lo >= d)  # estimate was q-1
        q = q + under.astype(_U32)
        rem_hi = jnp.zeros_like(d)  # remainder < d < 2^31 after fixup
        rem_lo = r_lo - jnp.where(under, d, _U32(0))  # u32 wrap = borrow
        digits.append(q)
    # Reassemble q = d0*2^32 + d1*2^16 + d2 (each digit < 2^16, so the
    # low word needs no carry); the final remainder fits one limb.
    q_lo = digits[2] + (digits[1] << 16)
    q_hi = digits[0]  # quotient bits 48..63 are statically zero
    return q_hi, q_lo, rem_lo


def _bitlen32(v: jnp.ndarray) -> jnp.ndarray:
    """Exact bit length of u32 (0 -> 0) via the f32 exponent field.

    Used instead of jax.lax.clz so the identical code also lowers inside
    Mosaic kernels (ops/pallas_vif_int.py fused exact statistic).

    t = v >> 1 is i32-convert-safe; its f32 exponent gives the candidate
    bit length directly. Round-to-nearest can only push t's mantissa UP
    across a power-of-two boundary (overstating by exactly 1), so one
    exact integer compare fixes the result for every input — 4x fewer
    VPU ops than the former 5-round shift cascade."""
    v = v.astype(_U32)
    t = (v >> 1).astype(jnp.int32)  # < 2^31
    tf = t.astype(jnp.float32)
    e = (jax.lax.bitcast_convert_type(tf, jnp.int32) >> 23) - 126
    over = t.astype(_U32) < (_U32(1) << jnp.clip(e - 1, 0, 31).astype(_U32))
    bl_t = e - over.astype(jnp.int32)
    return jnp.where(v == 0, 0, jnp.where(t == 0, 1, bl_t + 1))


def _norm16_pair(v_hi: jnp.ndarray, v_lo: jnp.ndarray):
    """Truncating normalisation of a u32 pair (value >= 2^17) into
    [2^15, 2^16): returns (mantissa u32, shift k i32) — libvmaf's
    get_best16_from64."""
    bitlen = jnp.where(v_hi > 0, 32 + _bitlen32(v_hi), _bitlen32(v_lo))
    k = bitlen - 16  # >= 1 for v >= 2^17
    # m = v >> k, assembled from the two limbs (k in [1, 46])
    k_lo = jnp.clip(k, 0, 31).astype(_U32)
    from_lo = v_lo >> k_lo
    from_hi = jnp.where(
        k < 32,
        # hi contributes its low k bits shifted up; guard k==0 (shift 32)
        jnp.where(k > 0, v_hi << jnp.clip(32 - k, 0, 31).astype(_U32),
                  _U32(0)),
        v_hi >> jnp.clip(k - 32, 0, 31).astype(_U32),
    )
    m = jnp.where(k < 32, from_lo | from_hi, from_hi)
    return m, k


def _statistic_element(s1i, s2i, s12i, gain_limit: float):
    """Per-pixel element stage of the exact statistic — everything up to
    (but excluding) the Q11 table lookups and the reductions.

    Pure u32/f32 arithmetic with no gather and no clz, so the IDENTICAL
    code runs in the XLA twin (_statistic) and inside the fused Mosaic
    kernel (ops/pallas_vif_int.py).  Returns per-pixel tensors:

      lb, nb          log / numerator branch masks (bool)
      k_den (i32), m_den (u32)   den = table[m_den] + 2048*k_den
      num_k (i32), m1, m2 (u32)  num = table[m1] - table[m2] + 2048*num_k
      s2m (u32)       flat-branch sigma2 (0 on the log branch)
    """
    s1 = jnp.maximum(s1i, 0).astype(_U32)
    s2 = jnp.maximum(s2i, 0).astype(_U32)
    log_branch = s1i >= SIGMA_NSQ_Q16
    num_branch = log_branch & (s12i >= 0)
    s12 = jnp.where(num_branch, s12i, 0).astype(_U32)

    nsq = _U32(SIGMA_NSQ_Q16)

    # --- den: log2(sigma_nsq + s1) mantissa/shift -----------------------
    den_in = nsq + s1
    k_den = _bitlen32(den_in) - 16
    m_den = den_in >> jnp.clip(k_den, 0, 31).astype(_U32)

    # --- num: q, r = divmod(s12^2, s1); boundary-corrected truncations ---
    d = jnp.where(num_branch, s1, _U32(1) << 20)  # masked lanes: safe d
    p_hi, p_lo = _mul_split(s12, s12)
    if os.environ.get("PQA2_EXACT_ABLATE") == "nodiv":
        # Timing-only ablation (wrong values): one f32 division replaces
        # the exact u64/u32 long division, isolating its runtime share.
        pf = _u32_f32(p_hi) * jnp.float32(2.0**32) + _u32_f32(p_lo)
        q_lo = _f32_u32(jnp.clip(jnp.floor(pf / _u32_f32(d)), 0.0, 2.0**31))
        q_hi = jnp.zeros_like(q_lo)
        r = jnp.zeros_like(q_lo)
    else:
        q_hi, q_lo, r = _div_u64_u32(p_hi, p_lo, d)
    # q as f32 for the epsilon-boundary terms (exact integer compare uses
    # the pair form below)
    qf = _u32_f32(q_hi) * jnp.float32(2.0**32) + _u32_f32(q_lo)
    s1f = _u32_f32(d)
    rf = _u32_f32(r)
    epsf = jnp.float32(_EPS64)
    # One reciprocal feeds frac AND both epsilon-boundary thresholds
    # (divides are multi-pass on the VPU; eps/s1 differs from
    # eps/(s1+eps) by a relative 2^-34 — far inside the thresholds' own
    # f32 slack, which the boundary-flip measurement bounds end to end,
    # tests/test_boundary_flips.py).
    inv_s1 = jnp.float32(1.0) / s1f
    fracf = rf * inv_s1
    # c1 = (q+frac)*eps/(s1+eps): sv crosses one integer down iff frac > c1
    c1 = (qf + fracf) * (epsf * inv_s1)
    # c2 ~= 2*c1 (exact factor (2*s1*eps + eps^2)/(s1+eps)^2): t = q-1 iff
    # frac < c2
    c2 = c1 * ((2.0 * s1f + epsf) * inv_s1)
    # sv = trunc(s2 - g*s12) clamped >= 0. With v0 = s2 - q (integer):
    # v = v0 - frac + c1 -> floor = v0 - (frac > c1); negatives clamp to 0.
    # (q > s2 means v is deeply negative -> 0; q fits u32 there or not,
    # saturate via the pair compare.)
    q_gt_s2 = (q_hi > 0) | (q_lo > s2)
    v0 = jnp.where(q_gt_s2, _U32(0), s2 - jnp.where(q_gt_s2, _U32(0), q_lo))
    dec = (fracf > c1) & (v0 > 0) & ~q_gt_s2
    sv = jnp.where(q_gt_s2, _U32(0), v0 - dec.astype(_U32))

    # NEG clamp (after sv, libvmaf order): g > limit  <=>  s12 > limit*s1.
    # t = trunc(g^2 * s1): unclamped = q - (frac < c2); clamped =
    # trunc(limit^2 * s1) (exact for the shipped limit 1.0).
    t_lo = q_lo - ((fracf < c2) & ((q_lo > 0) | (q_hi > 0))).astype(_U32)
    t_hi = q_hi - ((q_lo == 0) & (q_hi > 0) &
                   (fracf < c2)).astype(_U32)  # borrow
    if np.isfinite(gain_limit):
        gl = jnp.float32(gain_limit)
        clamp = _u32_f32(s12) > gl * s1f
        gl2s1 = jnp.floor(gl * gl * s1f)  # exact when limit == 1.0
        t_lo = jnp.where(clamp, _f32_u32(gl2s1), t_lo)
        t_hi = jnp.where(clamp, _U32(0), t_hi)

    numer1 = sv + nsq  # < 2^31 + 2^17: fits u32
    nt_lo = t_lo + numer1
    nt_hi = t_hi + (nt_lo < t_lo).astype(_U32)
    m1, k1 = _norm16_pair(nt_hi, nt_lo)
    k2 = _bitlen32(numer1) - 16
    m2 = numer1 >> jnp.clip(k2, 0, 31).astype(_U32)
    num_k = k1 - k2

    s2m = jnp.where(log_branch, _U32(0), s2)
    return log_branch, num_branch, k_den, m_den, num_k, m1, m2, s2m


def _log2_q11_bp(m: jnp.ndarray, bp: jnp.ndarray) -> jnp.ndarray:
    """Exact t[m] = round(log2f(m) * 2048) for mantissas in [2^15, 2^16)
    WITHOUT the 65537-entry table gather: f32 candidate + three
    comparisons against the exact integer breakpoints
    (golden/log2lut.py:breakpoints_ext — correct for any candidate within
    +-1 of the true index, pinned exhaustively in tests/test_log2lut.py).

    Two wins over ``jnp.take(log2_table, m)``: the small table never
    triggers XLA:CPU's pathological big-constant-gather compiles
    (minutes per program), and it is the same scheme the fused Mosaic
    kernel uses (ops/pallas_vif_int.py), so twin and kernel share the
    proof."""
    mi = m.astype(jnp.int32)
    idx = jnp.clip(
        jnp.round(jnp.log2(mi.astype(jnp.float32)) * jnp.float32(2048.0))
        - jnp.float32(30720.0), 1.0, 2048.0
    ).astype(jnp.int32)
    u = (
        idx - 2
        + (mi >= jnp.take(bp, idx - 1)).astype(jnp.int32)
        + (mi >= jnp.take(bp, idx)).astype(jnp.int32)
        + (mi >= jnp.take(bp, idx + 1)).astype(jnp.int32)
    )
    return u + jnp.int32(30720)


def _statistic(s1i, s2i, s12i, gain_limit: float, bp: jnp.ndarray):
    """Exact libvmaf integer num/den statistic (golden/vif_int.py twin).

    Per-pixel logs through the Q11 LUT on truncating 16-bit mantissas with
    integer accumulation; the double-precision gain chain is reproduced
    with an exact u64/u32 integer division plus epsilon-boundary
    corrections evaluated in f32 (the only non-integer step — boundary
    flips need |frac - c| ~< 1e-6, measure-zero on real content; see
    docs/CALIBRATION.md).  ``bp`` is the breakpoint table from
    _breakpoints_device() (the LUT in gather-free form)."""
    lb, nb, k_den, m_den, num_k, m1, m2, s2m = _statistic_element(
        s1i, s2i, s12i, gain_limit
    )
    den_tab = _log2_q11_bp(m_den, bp)
    num_tab = _log2_q11_bp(m1, bp) - _log2_q11_bp(m2, bp)

    # --- exact integer accumulators, one f32 rounding at the end --------
    # Table values are 16-bit and frames are <= ~8.3M pixels, so a plain
    # i32 reduction overflows at 4K. _sum_pair keeps the sums exact as
    # (hi, lo) pairs (value = hi*65536 + lo) with hi < 2^24 — both pieces
    # exactly representable in f32, so the combined value rounds once.
    zero = jnp.int32(0)
    acc_num_tab = _sum_pair(jnp.where(nb, num_tab, zero))
    acc_den_tab = _sum_pair(jnp.where(lb, den_tab, zero))
    # Shift counts are <= 46 per pixel: a direct i32 sum is exact.
    axes = tuple(range(1, s1i.ndim))
    acc_num_k = jnp.sum(jnp.where(nb, num_k, zero), axis=axes)
    acc_den_k = jnp.sum(jnp.where(lb, k_den, zero), axis=axes)
    n_log = jnp.sum(lb.astype(jnp.int32), axis=axes)
    n_flat = jnp.int32(s1i[0].size) - n_log
    # Flat-branch sigma2 is a full u32: split 16/16 per pixel, pair-sum
    # each half exactly.
    flat_hi = _sum_pair((s2m >> 16).astype(jnp.int32))
    flat_lo = _sum_pair((s2m & _MASK16).astype(jnp.int32))

    def pf(pair):  # exact pieces -> f32 (single rounding)
        hi, lo = pair
        return hi.astype(jnp.float32) * 65536.0 + lo.astype(jnp.float32)

    acc_flat = pf(flat_hi) * 65536.0 + pf(flat_lo)
    num = (pf(acc_num_tab) / 2048.0
           + acc_num_k.astype(jnp.float32)
           + (n_flat.astype(jnp.float32)
              - (acc_flat / 16384.0) / 65025.0))
    den = (pf(acc_den_tab) / 2048.0
           + acc_den_k.astype(jnp.float32)
           - 17.0 * n_log.astype(jnp.float32)
           + n_flat.astype(jnp.float32))
    return num, den


def to_native_grid(x: jnp.ndarray, bit_depth: int = 8):
    """Luma -> (uint32 native codes, in_q) for the integer pipeline.

    Float input is on the 8-bit scale (the pipeline divides >8-bit codes by
    2^(depth-8)); multiplying back recovers the exact native code — f32
    represents code/2^k exactly — so no grid rounding occurs for real
    sources. in_q = depth-8 is the fixed-point fraction the codes carry on
    the 8-bit pixel scale. All depths up to 16 run natively (round 4):
    in_q = 8 puts scale 0 in the SAME Q8/<2^16-code domain the decimated
    scales have always run, so every VIF/motion accumulator bound is
    already proven; ADM's level-0 headroom is handled by its own entry
    schedule (ops/adm_int.py). The reference accepts any ffmpeg pixfmt
    (vmaf_analyzer.py:411-419).
    """
    if bit_depth > 16:
        raise ValueError(f"bit_depth {bit_depth} > 16 not supported")
    in_q = max(bit_depth - 8, 0)
    if jnp.issubdtype(x.dtype, jnp.floating):
        scale = float(1 << in_q)
        # HALF-UP (floor(x*scale + 0.5)), the (x + half) >> shift rule —
        # exact pass-through for true codes, deterministic for synthetic
        # fractional input.
        codes = jnp.floor(x * scale + 0.5)
        return jnp.clip(codes, 0, (1 << bit_depth) - 1).astype(_U32), in_q
    return x.astype(_U32), in_q


def to_u8_grid(x: jnp.ndarray, bit_depth: int = 8) -> jnp.ndarray:
    """Luma (any dtype, native code values) -> uint32 on the 8-bit grid."""
    if bit_depth > 8:
        shift = bit_depth - 8
        xi = x.astype(jnp.int32)
        xi = jnp.minimum((xi + (1 << (shift - 1))) >> shift, 255)
        return xi.astype(_U32)
    if jnp.issubdtype(x.dtype, jnp.floating):
        # The float pipeline hands us 8-bit-scale values; round to the grid
        # HALF-UP (floor(x + 0.5)) — the oracle's (x + half) >> shift rule —
        # not jnp.round's half-to-even, which would skew exact-.5 values
        # (native 10-bit codes ≡ 2 mod 4) by 1 LSB vs golden/vif_int.py.
        return jnp.clip(jnp.floor(x + 0.5), 0, 255).astype(_U32)
    return x.astype(_U32)


def _log2_table_device() -> jnp.ndarray:
    from pqa2_tpu.golden.log2lut import log2_table

    return jnp.asarray(log2_table().astype(np.int32))


def _breakpoints_device() -> jnp.ndarray:
    """The Q11 log2 LUT in breakpoint form for _statistic/_log2_q11_bp."""
    from pqa2_tpu.golden.log2lut import breakpoints_ext

    return jnp.asarray(breakpoints_ext())


@functools.partial(
    jax.jit, static_argnames=("gain_limit", "bit_depth", "exact")
)
def _vif_features_int_impl(ref, dist, bp, gain_limit, bit_depth, exact):
    ref, in_q = to_native_grid(ref, bit_depth)
    dist, _ = to_native_grid(dist, bit_depth)
    feats = []
    for scale in range(4):
        taps = VIF_FILTERS_Q16[scale]
        if scale > 0:
            ref = _decimate2(ref, taps, in_q)
            dist = _decimate2(dist, taps, in_q)
            in_q = 8
        planes = _sigma_planes(ref, dist, taps, in_q)
        if exact:
            num, den = _statistic(*planes, gain_limit, bp)
        else:
            num, den = _statistic_fast(*planes, gain_limit)
        feats.append(jnp.where(den > 0, num / den, 1.0))
    return jnp.stack(feats, axis=-1)


def vif_features_int_batched(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    gain_limit: float = float("inf"),
    bit_depth: int = 8,
    exact: bool = True,
) -> jnp.ndarray:
    """(N, H, W) luma pair -> (N, 4) [vif_scale0..3], integer path.

    exact=True (default) evaluates the statistic with libvmaf's LUT log2
    quantisation and integer accumulators (bit-faithful to
    golden/vif_int.py); exact=False keeps the smooth-f32-log throughput
    statistic (precision="integer_fast"). >8-bit sources run natively
    (in_q = depth-8 fixed-point codes; golden/vif_int.py docstring).

    Jitted as one program with the breakpoint table as an ARGUMENT:
    eager per-op dispatch of the ~1k-op exact statistic costs minutes on
    slow hosts, and a trace-constant LUT triggers XLA:CPU's pathological
    big-constant-gather compiles."""
    return _vif_features_int_impl(
        ref, dist, _breakpoints_device(),
        gain_limit=gain_limit, bit_depth=bit_depth, exact=exact,
    )
