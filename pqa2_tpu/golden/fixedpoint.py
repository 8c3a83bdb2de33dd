"""Fixed-point constants for the integer feature path.

libvmaf's default extractors are the ``VMAF_integer_feature_*`` family
(models/vmaf_v0.6.1.json feature_dict; invoked by the reference through the
lavfi filter string, app/vmaf_analyzer.py:406): uint pixel pipelines with
Q16 filter taps and explicit rounding shifts.  This module holds the Q16
tables and the rounding-schedule constants shared by the integer oracles
(golden/vif_int.py, golden/motion_int.py, golden/adm_int.py) and the device
ops (ops/*_int.py).

Derivation of the tables: each is the per-scale Gaussian window
(n = 2^(4-scale)+1 taps, sigma = n/5 — golden/filters.py:vif_filter)
quantised to Q16 (round(tap * 65536)) with the centre tap adjusted by +-1..2
so each window sums to exactly 65536 — the scheme libvmaf's integer tables
follow.  ``_check_tables`` asserts both properties against the analytic
filters at import, so the fixed-point bank can never drift from the float
bank.
"""

from __future__ import annotations

import numpy as np

from pqa2_tpu.golden.filters import DB2_HI, DB2_LO, vif_filter

Q16_ONE = 65536

# Q16 VIF filter bank, scales 0..3 (17/9/5/3 taps). The 5-tap scale-2 window
# doubles as the motion blur filter (same sharing as the float bank,
# golden/filters.py:motion_filter).
VIF_FILTERS_Q16 = {
    0: np.array(
        [489, 935, 1640, 2640, 3896, 5274, 6547, 7455, 7784,
         7455, 6547, 5274, 3896, 2640, 1640, 935, 489],
        dtype=np.int64,
    ),
    1: np.array(
        [1244, 3663, 7925, 12590, 14692, 12590, 7925, 3663, 1244],
        dtype=np.int64,
    ),
    2: np.array([3571, 16004, 26386, 16004, 3571], dtype=np.int64),
    3: np.array([10904, 43728, 10904], dtype=np.int64),
}

MOTION_FILTER_Q16 = VIF_FILTERS_Q16[2]

# Q16 pixel^2 representation of the VIF noise floor sigma_nsq = 2.0
# (golden/vif.py:SIGMA_NSQ).
SIGMA_NSQ_Q16 = 2 * Q16_ONE

# Q15 Daubechies-2 pair for the integer ADM DWT: round(tap * 32768) of the
# float bank (golden/filters.py:DB2_LO/DB2_HI) — the same quantisation
# libvmaf's integer ADM tables use.
Q15_ONE = 32768


def _q15(taps: np.ndarray) -> np.ndarray:
    return np.round(taps * Q15_ONE).astype(np.int64)


# Integer ADM DWT Q-schedule: band fractional bits per level (input pixels
# are shifted to Q4; level 3's row pass drops one bit so every accumulation
# Σ |q15 tap| * value stays inside int32 — see golden/adm_int.py).
ADM_BAND_Q = (4, 4, 4, 3)


DB2_LO_Q15 = _q15(DB2_LO)
DB2_HI_Q15 = _q15(DB2_HI)


def _check_tables() -> None:
    for scale, q in VIF_FILTERS_Q16.items():
        if int(q.sum()) != Q16_ONE:
            raise AssertionError(f"Q16 VIF table scale {scale} sum {q.sum()}")
        analytic = np.round(vif_filter(scale) * Q16_ONE)
        if np.max(np.abs(q - analytic)) > 2:
            raise AssertionError(
                f"Q16 VIF table scale {scale} drifts from the analytic "
                f"Gaussian: {q - analytic}"
            )


_check_tables()
