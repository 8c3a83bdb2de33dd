"""Integer fixed-point VIF — float64-free oracle for the integer path.

Emulates the fixed-point moment pipeline of libvmaf's default
``VMAF_integer_feature_vif_scale{0..3}`` extractors (the features every
integer model names in its feature_dict — models/vmaf_v0.6.1.json; invoked
by the reference via ffmpeg lavfi, app/vmaf_analyzer.py:406):

  * Q16 filter taps (golden/fixedpoint.py), reflect borders.
  * Vertical pass:  mu rounds to Q8 pixels  ((acc + 2^(s-1)) >> s with
    s = 8 + in_q); squared products round with >> 16.
  * Horizontal pass: mu accumulates to Q24 pixels (no rounding); products
    round back to Q16 pixel^2 for Q8 inputs.
  * mu^2 and mu1*mu2 round with (p + 2^31) >> 32 into Q16 pixel^2 —
    the same domain as the filtered products, so the sigma statistics are
    exact int32 differences.
  * Decimation between scales: blur with the next scale's Q16 window,
    rounding to Q8 pixels, keep even rows/columns.

The num/den log statistic is then evaluated in float64 on the integer
sigma values with the integer-path branch structure (flat-reference branch
for sigma1^2 < 2 — golden/vif.py:_vif_statistic_default).  libvmaf's last
quantisation (log2 via a 2048-step LUT over a truncated 16-bit mantissa)
contributes < 1e-5 to the pooled features and is not modelled; everything
upstream of the logs — where the measurable fixed-point error lives — is
integer-exact. See docs/CALIBRATION.md.

All arithmetic uses uint64 (bounds are asserted), so this oracle is exact
by construction and pins the device implementation (ops/vif_int.py).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from pqa2_tpu.golden.fixedpoint import SIGMA_NSQ_Q16, VIF_FILTERS_Q16
from pqa2_tpu.golden.filters import reflect_index

_U64 = np.uint64


def _reflect_rows(img: np.ndarray, half: int) -> np.ndarray:
    n = img.shape[0]
    js = reflect_index(np.arange(-half, n + half), n)
    return img[js]


def _filt_v(img: np.ndarray, taps: np.ndarray, shift: int) -> np.ndarray:
    """Vertical Q16 correlation with rounding >> shift. img uint64 (H, W)."""
    half = len(taps) // 2
    xp = _reflect_rows(img, half).astype(_U64)
    h = img.shape[0]
    acc = np.zeros_like(img, dtype=_U64)
    for t, f in enumerate(taps):
        acc += _U64(f) * xp[t : t + h]
    if shift == 0:
        return acc
    return (acc + _U64(1 << (shift - 1))) >> _U64(shift)


def _filt_h(img: np.ndarray, taps: np.ndarray, shift: int) -> np.ndarray:
    return _filt_v(img.T, taps, shift).T


def _decimate(img: np.ndarray, taps: np.ndarray, in_q: int) -> np.ndarray:
    """Blur + 2x decimation, Q{in_q} pixels in -> Q8 pixels out (uint64)."""
    tmp = _filt_v(img, taps, 8 + in_q)  # -> Q8 rows
    out = _filt_h(tmp, taps, 16)  # Q16*Q8 -> Q8
    return out[::2, ::2]


def _moments_int(
    ref: np.ndarray, dist: np.ndarray, taps: np.ndarray, in_q: int
) -> Tuple[np.ndarray, ...]:
    """Integer moment planes in Q16 pixel^2 (+ mu in Q24 pixels)."""
    v_mu_shift = 8 + in_q  # Q16*Qin -> Q8
    v_p_shift = 16  # Q16*Q(2in) -> Q(2in)
    h_p_shift = 2 * in_q  # Q16*Q(2in) -> Q16 pixel^2

    mu1 = _filt_h(_filt_v(ref, taps, v_mu_shift), taps, 0)  # Q24 pixels
    mu2 = _filt_h(_filt_v(dist, taps, v_mu_shift), taps, 0)
    xx = _filt_h(_filt_v(ref * ref, taps, v_p_shift), taps, h_p_shift)
    yy = _filt_h(_filt_v(dist * dist, taps, v_p_shift), taps, h_p_shift)
    xy = _filt_h(_filt_v(ref * dist, taps, v_p_shift), taps, h_p_shift)

    assert mu1.max(initial=0) < (1 << 32) and xx.max(initial=0) < (1 << 32)

    def sq32(a, b):  # (a*b + 2^31) >> 32 -> Q16 pixel^2
        return (a * b + _U64(1 << 31)) >> _U64(32)

    mu1_sq = sq32(mu1, mu1)
    mu2_sq = sq32(mu2, mu2)
    mu12 = sq32(mu1, mu2)
    return mu1_sq, mu2_sq, mu12, xx, yy, xy


def sigma_planes_int(
    ref: np.ndarray, dist: np.ndarray, taps: np.ndarray, in_q: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Integer sigma planes (int64, Q16 pixel^2 domain)."""
    mu1_sq, mu2_sq, mu12, xx, yy, xy = _moments_int(ref, dist, taps, in_q)
    sigma1 = xx.astype(np.int64) - mu1_sq.astype(np.int64)
    sigma2 = yy.astype(np.int64) - mu2_sq.astype(np.int64)
    sigma12 = xy.astype(np.int64) - mu12.astype(np.int64)
    return sigma1, sigma2, sigma12


def _statistic(sigma1, sigma2, sigma12, gain_limit: float) -> Tuple[float, float]:
    """Integer-path num/den statistic on Q16 sigma planes (float64 logs)."""
    s1 = np.maximum(sigma1, 0) / 65536.0
    s2 = np.maximum(sigma2, 0) / 65536.0
    s12 = sigma12 / 65536.0

    log_branch = sigma1 >= SIGMA_NSQ_Q16
    g = np.where(s12 > 0.0, s12 / np.maximum(s1, 1e-10), 0.0)
    g = np.minimum(g, gain_limit)
    sv_sq = np.maximum(s2 - g * s12, 0.0)
    num_log = np.log2(1.0 + g * g * s1 / (sv_sq + 2.0))
    den_log = np.log2(1.0 + s1 / 2.0)
    num = np.where(log_branch, num_log, 1.0 - s2 * (4.0 / (255.0 * 255.0)))
    den = np.where(log_branch, den_log, 1.0)
    return float(num.sum()), float(den.sum())


def vif_features_int(
    ref: np.ndarray,
    dist: np.ndarray,
    gain_limit: float = np.inf,
    bit_depth: int = 8,
) -> List[float]:
    """uint8/uint16 luma pair -> [vif_scale0..3], integer fixed-point path.

    >8-bit input is rounded to the 8-bit grid first (the f32 path normalises
    the same way; a native 10-bit integer pipeline is a documented future
    tightening, docs/CALIBRATION.md).
    """
    ref = np.asarray(ref)
    dist = np.asarray(dist)
    if bit_depth > 8:
        half = 1 << (bit_depth - 9)
        ref = np.minimum((ref.astype(np.int64) + half) >> (bit_depth - 8), 255)
        dist = np.minimum((dist.astype(np.int64) + half) >> (bit_depth - 8), 255)
    ref = ref.astype(_U64)
    dist = dist.astype(_U64)

    scores = []
    in_q = 0
    for scale in range(4):
        taps = VIF_FILTERS_Q16[scale]
        if scale > 0:
            ref = _decimate(ref, taps, in_q)
            dist = _decimate(dist, taps, in_q)
            in_q = 8
        num, den = _statistic(
            *sigma_planes_int(ref, dist, taps, in_q), gain_limit
        )
        scores.append(num / den if den > 0 else 1.0)
    return scores
