"""Correctly-rounded float32 log2 for 16-bit mantissas — double-f32, no LUT.

The exact integer VIF statistic needs t[m] = round(log2f(m) * 2048) for
mantissas m in [2^15, 2^16) (golden/log2lut.py), where log2f is the
CORRECTLY-ROUNDED f32 log2. Hardware/compiler log2 is only faithful
(+-1 ulp): measured 1909/32768 mantissas off by one table step on TPU
Mosaic and 34 on XLA:CPU. The round-3/4 fallback fetches exact integer
breakpoints through a one-hot MXU matmul — correct, but ~46% of the whole
4K exact-VIF frame time (measured 4.9 of 10.6 ms/frame).

This module computes y32 = RN_f32(log2(m)) EXACTLY, from which

    u(m) = floor(y32 * 2048 + 0.5) - 30720

reproduces the table with no lookup at all (y32*2048 is exact — power-of-
two scale; +0.5 lands on the same 2^-9 grid; floor of an exact value is
C round() for positive x).

Method: Dekker/Knuth double-f32 (no FMA, no tables):

    r  = m * 2^-15                   exact (power-of-two scale)
    s  = (r-1)/(r+1) as a hi+lo pair (numerator exact by Sterbenz; r+1
                                      itself exact — a 17-bit integer on
                                      the 2^-15 grid; one reciprocal, a
                                      Dekker residual, one correction)
    log2(r) = (2/ln2) * (s + s^3/3 + s^5/5 + ...)
       - s^2 as a pair (two_prod); the s^2/3 and (s^2)^2/5 terms in pair
         arithmetic; s^7/7 .. s^15/15 in plain f32 (magnitude <= 2^-18)
    y  = 15 + (2/ln2 split) * S      accumulated as a pair, rounded once

Why this is EXACT and not merely accurate: over the 32768 relevant
mantissas the true log2(m) never comes closer than 2^-35.8 to an f32
rounding midpoint (exhaustively computed in 80-bit — the table-maker
margin), while the pair evaluation's error is ~2^-40. Correctness does
NOT rest on that analysis: tests/test_log2lut.py re-runs this EXACT op
sequence in IEEE numpy float32 over every mantissa against the golden
table, and ops/pallas_vif_int.py:log2_direct_ok probes the same sequence
inside a compiled kernel per backend (catching e.g. FMA contraction that
would break Dekker's error-free transforms), falling back to the MXU
breakpoint fetch if a backend fails the probe.

The implementation is array-module generic: pass numpy float32 arrays for
the host-side exhaustive verification, jnp arrays (inside jit or a Pallas
kernel) for device execution — the op sequence is identical.
"""

from __future__ import annotations

import numpy as np

_F = np.float32

# 2/ln2 split into an exact-sum f32 pair.
_C_HI = _F(2.0 / np.log(2.0))
_C_LO = _F(2.0 / np.log(2.0) - np.float64(_C_HI))
# 1/3 and 1/5 splits (leading series terms evaluated in pair arithmetic).
_F3_HI = _F(1.0 / 3.0)
_F3_LO = _F(1.0 / 3.0 - np.float64(_F3_HI))
_F5_HI = _F(1.0 / 5.0)
_F5_LO = _F(1.0 / 5.0 - np.float64(_F5_HI))
# Plain-f32 tail coefficients (terms <= 2^-18 — f32 headroom is ample).
_C7 = _F(1.0 / 7.0)
_C9 = _F(1.0 / 9.0)
_C11 = _F(1.0 / 11.0)
_C13 = _F(1.0 / 13.0)
_C15 = _F(1.0 / 15.0)

_SPLITTER = _F(4097.0)  # 2^12 + 1 (Dekker split for f32)


def _split(a):
    """Veltkamp split a = ah + al (ah: top 12 mantissa bits)."""
    ca = a * _SPLITTER
    ah = ca - (ca - a)
    return ah, a - ah


def _two_prod(a, b):
    """Exact a*b = p + e (Dekker/Veltkamp, FMA-free, pure IEEE f32)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _two_prod_ps(a, ah, al, b, bh, bl):
    """Exact a*b = p + e with both operands PRE-SPLIT — lets callers cache
    a value's split across several products and fold constant splits to
    trace time (the error expression is Dekker's, unchanged)."""
    p = a * b
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# Trace-time Veltkamp splits of the constant product operands.
_npsplit = lambda c: _split(np.float32(c))
_C_HI_H, _C_HI_L = _npsplit(_C_HI)
_F3_HI_H, _F3_HI_L = _npsplit(_F3_HI)
_F5_HI_H, _F5_HI_L = _npsplit(_F5_HI)


def _fast2sum(a, b):
    """Exact a+b = s + e for |a| >= |b| (Dekker)."""
    s = a + b
    z = s - a
    e = b - z
    return s, e


def log2_q11_light(m):
    """Integer-valued f32 mantissas in [2^15, 2^16) -> u = t[m] - 30720,
    the TRIMMED direct sequence (~68 VPU ops vs ~115).

    Same target as log2_q11_direct — the table value through the
    correctly-rounded f32 y32 = RN(log2 m). (The table is NOT
    round(log2(m)*2048) of the infinitely-precise log2: libvmaf rounds
    log2 to f32 FIRST, and that double rounding moves 38 of the 32768
    entries — tests/test_log2lut.py pins this trap.) The y32 midpoint
    margin is 2^-35.8 while the full sequence evaluates to ~2^-40, a 16x
    budget surplus this variant spends on dropped refinements:

      * the quotient's Dekker residual (s = q1 alone — the reciprocal's
        2^-45-level correction never decides a midpoint here);
      * the series tail ends at s^13/13 and s^2 is one plain multiply;
      * s^4/5 in plain f32 (t2 <= 2^-8.7: its rounding sits ~2^-33,
        inside the margin);
      * the two mid-chain renormalising fast2sums.

    Exhaustive IEEE-f32 result: exactly ONE mantissa (64841) lands one
    step off — inside the audit's compare-add budget.
    ops/pallas_vif_int.py:log2_direct_exceptions probes THIS sequence
    first per backend and falls back to log2_q11_direct, then to the MXU
    breakpoint fetch, if a backend exceeds the budget; correctness never
    rests on the error analysis above."""
    one = _F(1.0)
    r = m * _F(2.0 ** -15)  # exact
    n = r - one  # exact (Sterbenz)
    dh = r + one  # exact (17-bit integer on the 2^-15 grid)
    rdh = one / dh
    q1 = n * rdh  # s, faithful (no residual — see docstring)
    q1h, q1l = _split(q1)
    zh = q1 * q1  # s^2, plain
    # Tail s^7/7 .. s^13/13 plain; s^4/5 plain; s^2/3 with its low word.
    t3 = (zh * zh * zh) * (
        _C7 + zh * (_C9 + zh * (_C11 + zh * _C13))
    )
    t2 = (zh * zh) * _F5_HI
    t1h = zh * _F3_HI
    t1l = zh * _F3_LO
    th, te = _fast2sum(t1h, t2 + t3)
    tl = te + t1l
    thh, thl = _split(th)
    wh, we = _two_prod_ps(q1, q1h, q1l, th, thh, thl)
    wl = we + q1 * tl
    sh, se = _fast2sum(q1, wh)
    sl = se + wl
    shh, shl = _split(sh)
    gh, ge = _two_prod_ps(sh, shh, shl, _C_HI, _C_HI_H, _C_HI_L)
    gl = ge + (sh * _C_LO + sl * _C_HI)
    yh, ye = _fast2sum(_F(15.0), gh)
    y32 = yh + (ye + gl)  # the correctly-rounded f32 log2(m) (1 exc)
    return (y32 * _F(2048.0) + _F(0.5)) // one - _F(30720.0)


def log2_q11_direct(m):
    """Integer-valued f32 mantissas in [2^15, 2^16) -> u = t[m] - 30720.

    Returns the Q11 quantised-log index as f32 integers in [0, 2048]
    (cast at the caller; values outside the mantissa range produce
    finite garbage — callers mask invalid lanes, as with the LUT path).
    Works on numpy f32 (host verification) and jnp f32 (device) alike.
    """
    one = _F(1.0)
    r = m * _F(2.0 ** -15)  # exact
    n = r - one  # exact (Sterbenz: r in [1, 2))
    # r + 1 is EXACT in one f32: r = (m)*2^-15 with m < 2^16, so r + 1 =
    # (m + 2^15)*2^-15 is a 17-bit integer on the 2^-15 grid — well inside
    # f32's 24 bits. No pair needed (the former dl was identically 0).
    dh = r + one
    # ONE reciprocal instead of two divides: q1 = n*rdh is only
    # faithful-ish (a couple ulp), but the Dekker residual below measures
    # n - q1*dh EXACTLY (p within Sterbenz range of n), so q2 absorbs the
    # estimate's looseness; the q2 = e*rdh rounding sits at ~2^-45 of s.
    # Exactness is not analytic anyway: the exhaustive audits
    # (tests/test_log2lut.py, log2_direct_exceptions) re-verify every
    # mantissa per backend — numpy IEEE: 0 exceptions for this sequence.
    rdh = one / dh
    q1 = n * rdh
    q1h, q1l = _split(q1)
    dhh, dhl = _split(dh)
    p, pe = _two_prod_ps(q1, q1h, q1l, dh, dhh, dhl)
    e = (n - p) - pe
    q2 = e * rdh  # s = q1 + q2

    zh, ze = _two_prod_ps(q1, q1h, q1l, q1, q1h, q1l)
    zl = ze + _F(2.0) * (q1 * q2)  # s^2 as a pair
    z = zh + zl

    # Plain tail: z^3 * (1/7 + z*(1/9 + z*(1/11 + z*(1/13 + z/15)))).
    t3 = (z * z * z) * (
        _C7 + z * (_C9 + z * (_C11 + z * (_C13 + z * _C15)))
    )
    # (s^2)^2 / 5 in pair arithmetic.
    zhh, zhl = _split(zh)
    z2h, z2e = _two_prod_ps(zh, zhh, zhl, zh, zhh, zhl)
    z2l = z2e + _F(2.0) * (zh * zl)
    z2hh, z2hl = _split(z2h)
    t2h, t2e = _two_prod_ps(z2h, z2hh, z2hl, _F5_HI, _F5_HI_H, _F5_HI_L)
    t2l = t2e + (z2h * _F5_LO + z2l * _F5_HI)
    # s^2 / 3 in pair arithmetic.
    t1h, t1e = _two_prod_ps(zh, zhh, zhl, _F3_HI, _F3_HI_H, _F3_HI_L)
    t1l = t1e + (zh * _F3_LO + zl * _F3_HI)
    # tau = t1 + t2 + t3 (descending magnitudes).
    th, te = _fast2sum(t1h, t2h)
    tl = te + (t1l + t2l + t3)
    th, te = _fast2sum(th, tl)
    tl = te
    # w = s * tau.
    thh2, thl2 = _split(th)
    wh, we = _two_prod_ps(q1, q1h, q1l, th, thh2, thl2)
    wl = we + (q1 * tl + q2 * th)
    # S = s + w.
    sh, se = _fast2sum(q1, wh)
    sl = se + (q2 + wl)
    sh, se = _fast2sum(sh, sl)
    sl = se
    # g = (2/ln2) * S;  y = 15 + g.
    shh, shl = _split(sh)
    gh, ge = _two_prod_ps(sh, shh, shl, _C_HI, _C_HI_H, _C_HI_L)
    gl = ge + (sh * _C_LO + sl * _C_HI)
    yh, ye = _fast2sum(_F(15.0), gh)
    yl = ye + gl
    y32 = yh + yl  # the correctly-rounded f32 log2(m)
    return (y32 * _F(2048.0) + _F(0.5)) // one - _F(30720.0)
