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

The final num/den log statistic runs in f32 on the integer sigma planes
(golden/vif_int.py documents why that last stage's quantisation is not
modelled). All Python loops below are over filter taps / scales — static
and unrolled at trace time; shapes stay (N, H, W) throughout.
"""

from __future__ import annotations

from typing import Tuple

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


def _conv_split16(x: jnp.ndarray, taps: np.ndarray, axis: int) -> jnp.ndarray:
    """Exact (sum_t f_t * x_t + 2^15) >> 16 for uint32 x of any magnitude."""
    k = len(taps)
    n = x.shape[axis]
    xp = _pad_reflect(x, k // 2, axis)
    acc_hi = None
    acc_lo = None
    for f, s in zip(taps, _slices(xp, k, n, axis)):
        fc = _U32(int(f))
        hi = fc * (s >> 16)  # <= (2^16-1)^2 per term; sum bound by taps sum
        lo = fc * (s & _MASK16)
        acc_hi = hi if acc_hi is None else acc_hi + hi
        acc_lo = lo if acc_lo is None else acc_lo + lo
    return acc_hi + ((acc_lo + _U32(1 << 15)) >> 16)


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
        t = _conv_split16(p, taps, axis=-2)
        return _conv_split16(t, taps, axis=-1)

    xx = prod_plane(ref, ref)
    yy = prod_plane(dist, dist)
    xy = prod_plane(ref, dist)

    s1 = (xx - _mul_shift32(mu1, mu1)).astype(jnp.int32)
    s2 = (yy - _mul_shift32(mu2, mu2)).astype(jnp.int32)
    s12 = (xy - _mul_shift32(mu1, mu2)).astype(jnp.int32)
    return s1, s2, s12


def _statistic(s1i, s2i, s12i, gain_limit: float):
    """num/den sums from int32 Q16 sigma planes (f32 logs)."""
    s1 = jnp.maximum(s1i, 0).astype(jnp.float32) / 65536.0
    s2 = jnp.maximum(s2i, 0).astype(jnp.float32) / 65536.0
    s12 = s12i.astype(jnp.float32) / 65536.0

    log_branch = s1i >= SIGMA_NSQ_Q16
    g = jnp.where(s12 > 0.0, s12 / jnp.maximum(s1, 1e-10), 0.0)
    g = jnp.minimum(g, gain_limit)
    sv_sq = jnp.maximum(s2 - g * s12, 0.0)
    num_log = jnp.log2(1.0 + g * g * s1 / (sv_sq + 2.0))
    den_log = jnp.log2(1.0 + s1 / 2.0)
    num = jnp.where(log_branch, num_log, 1.0 - s2 * (4.0 / (255.0 * 255.0)))
    den = jnp.where(log_branch, den_log, 1.0)
    axes = tuple(range(1, num.ndim))
    return jnp.sum(num, axis=axes), jnp.sum(den, axis=axes)


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


def vif_features_int_batched(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    gain_limit: float = float("inf"),
    bit_depth: int = 8,
) -> jnp.ndarray:
    """(N, H, W) luma pair -> (N, 4) [vif_scale0..3], integer path."""
    ref = to_u8_grid(ref, bit_depth)
    dist = to_u8_grid(dist, bit_depth)
    feats = []
    in_q = 0
    for scale in range(4):
        taps = VIF_FILTERS_Q16[scale]
        if scale > 0:
            ref = _decimate2(ref, taps, in_q)
            dist = _decimate2(dist, taps, in_q)
            in_q = 8
        num, den = _statistic(*_sigma_planes(ref, dist, taps, in_q), gain_limit)
        feats.append(jnp.where(den > 0, num / den, 1.0))
    return jnp.stack(feats, axis=-1)
