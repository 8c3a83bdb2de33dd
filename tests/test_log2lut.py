"""libvmaf log2-LUT statistic: oracle <-> device bit-equality (round-3).

The integer VIF statistic's log stages are pure integer arithmetic
(truncating 16-bit normalisation + Q11 table lookup + integer
accumulation) and must agree bit-for-bit between the numpy oracle
(golden/log2lut.py, golden/vif_int.py) and the XLA twin helpers
(ops/vif_int.py). The double-precision gain chain is reproduced with an
exact u64/u32 division — pinned here against python bignum divmod.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from pqa2_tpu.golden.log2lut import LOG2_SCALE, log2_table, normalize16

pytestmark = pytest.mark.smoke  # fast tier (run_tests.py --quick)


def test_table_shape_and_endpoints():
    t = log2_table()
    assert t.shape == (65537,)
    assert t.dtype == np.uint16
    assert t[32768] == 15 * LOG2_SCALE  # log2(2^15) exactly
    assert t[65536] == 16 * LOG2_SCALE
    # Monotone non-decreasing over the defined range, steps of 0/1.
    d = np.diff(t[32767:].astype(np.int64))
    assert d.min() >= 0 and d.max() <= 1


def test_table_values_match_float32_log2f_semantics():
    # round(float32(log2f(i)) * 2048) with C half-away rounding.
    i = np.arange(32767, 65537)
    y = (np.log2(i.astype(np.float64)).astype(np.float32)
         * np.float32(2048)).astype(np.float32)
    want = np.floor(y.astype(np.float64) + 0.5).astype(np.uint16)
    assert np.array_equal(log2_table()[32767:], want)


def test_normalize16_matches_bit_length(rng):
    vals = np.concatenate([
        rng.integers(1 << 17, 1 << 32, 200).astype(np.uint64),
        rng.integers(1 << 17, 1 << 62, 200).astype(np.uint64),
        np.array([1 << 17, (1 << 17) + 1, (1 << 62) - 1, 0xFFFFFFFF],
                 dtype=np.uint64),
    ])
    m, k = normalize16(vals)
    for v, mi, ki in zip(vals.tolist(), m.tolist(), k.tolist()):
        assert ki == max(int(v).bit_length() - 16, 0)
        assert mi == v >> ki
        assert 1 << 15 <= mi < 1 << 16


def test_device_div_u64_u32_exact(rng):
    from pqa2_tpu.ops.vif_int import _div_u64_u32, _mul_split

    d = np.concatenate([
        rng.integers(1 << 17, 1 << 31, 300),
        np.full(4, 1 << 17), np.full(4, (1 << 31) - 1),
    ]).astype(np.uint32)
    s12 = rng.integers(0, 1 << 31, d.size).astype(np.uint32)
    ph, pl_ = _mul_split(jnp.asarray(s12), jnp.asarray(s12))
    qh, ql, r = _div_u64_u32(ph, pl_, jnp.asarray(d))
    qh, ql, r = (np.asarray(x) for x in (qh, ql, r))
    for i in range(d.size):
        p = int(s12[i]) ** 2
        q_want, r_want = divmod(p, int(d[i]))
        q_got = (int(qh[i]) << 32) | int(ql[i])
        assert q_got == q_want, (i, s12[i], d[i], q_got, q_want)
        assert int(r[i]) == r_want


def test_device_normalization_and_gather_bit_equal(rng):
    """The LUT stage itself: device mantissa/shift/table value ==
    oracle, bit for bit, across the value range both statistics feed it."""
    import jax

    from pqa2_tpu.ops.vif_int import _log2_table_device, _norm16_pair

    vals = np.concatenate([
        rng.integers(1 << 17, 1 << 32, 500),
        rng.integers(1 << 32, 1 << 34, 100),  # numer1_tmp can pass 2^32
        np.array([1 << 17, 0xFFFFFFFF, 1 << 32, (1 << 34) - 1]),
    ]).astype(np.uint64)
    m_o, k_o = normalize16(vals)
    tab_o = log2_table()[m_o]

    v_hi = jnp.asarray((vals >> 32).astype(np.uint32))
    v_lo = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32))
    m_d, k_d = _norm16_pair(v_hi, v_lo)
    tab_d = jnp.take(_log2_table_device(), m_d.astype(jnp.int32))
    assert np.array_equal(np.asarray(m_d), m_o.astype(np.uint32))
    assert np.array_equal(np.asarray(k_d), k_o.astype(np.int32))
    assert np.array_equal(np.asarray(tab_d), tab_o.astype(np.int32))


def test_breakpoints_ext_recovers_table_exhaustively():
    """The gather-free device scheme (golden/log2lut.py:breakpoints_ext)
    recovers t[m] EXACTLY for every mantissa and every candidate within
    +-1 of the true index — the property the fused Pallas statistic
    relies on (ops/pallas_vif_int.py:_fused_exact_slots)."""
    from pqa2_tpu.golden.log2lut import breakpoints_ext

    t = log2_table().astype(np.int64)
    ext = breakpoints_ext().astype(np.int64)
    assert ext.shape == (2050,)
    assert ext[0] == 32768 and ext[2049] == 65536
    # B[j] is the smallest mantissa with t[m] = 30720 + j.
    for j in (1, 2, 1024, 2047, 2048):
        b = int(ext[j])
        assert t[b] == 30720 + j and t[b - 1] == 30720 + j - 1
    # Step sizes: every (B>>8, B&255, dB) packs bf16-exact (<= 256).
    d = np.diff(ext[1:])
    assert d.min() >= 6 and d.max() <= 23

    m_all = np.arange(32768, 65536, dtype=np.int64)
    u_true = t[m_all] - 30720
    for delta in (-1, 0, 1):
        idx = np.clip(u_true + delta, 1, 2048)
        u_rec = (
            idx - 2
            + (m_all >= ext[idx - 1]).astype(np.int64)
            + (m_all >= ext[idx]).astype(np.int64)
            + (m_all >= ext[idx + 1]).astype(np.int64)
        )
        assert np.array_equal(u_rec, u_true), f"delta={delta}"

    # The f32 candidate the kernel computes really is within +-1 (with
    # ~1e3x margin: f32 log2 relative error ~1e-7 -> index error ~3e-3).
    mf = m_all.astype(np.float32)
    cand = np.round(np.log2(mf) * np.float32(2048)).astype(np.float64)
    cand -= 30720.0
    assert np.abs(cand - u_true).max() <= 1

    # ONE-FETCH floor form (the production kernel,
    # ops/pallas_vif_int.py:_bp_planes): for BOTH floors the +-0.52
    # window allows, u = f + [m >= B(f+1)] recovers u exactly.
    for f_try in (u_true - 1, u_true):
        f = np.clip(f_try, 0, 2047)
        u_rec = f + (m_all >= ext[f + 1]).astype(np.int64)
        assert np.array_equal(u_rec, u_true)
    # And the kernel's actual f32 floor candidate lands in that window.
    cand_f = np.floor(
        np.log2(mf) * np.float32(2048) - np.float32(30720)
    ).astype(np.int64)
    assert np.all((cand_f >= u_true - 1) & (cand_f <= u_true))


def test_device_log2_q11_bp_exhaustive():
    """The twin's gather-free LUT evaluation (ops/vif_int.py:_log2_q11_bp)
    equals the full table for EVERY 16-bit mantissa on this backend."""
    from pqa2_tpu.ops.vif_int import _breakpoints_device, _log2_q11_bp

    m = jnp.asarray(np.arange(32768, 65536, dtype=np.int32))
    got = np.asarray(_log2_q11_bp(m, _breakpoints_device()))
    want = log2_table()[32768:65536].astype(np.int32)
    assert np.array_equal(got, want)


def test_statistic_twin_adversarial_planes(rng):
    """Full-statistic agreement on hand-built sigma planes covering every
    branch: flat, log+negative-covariance, identity-like, huge values,
    NEG clamp active."""
    from pqa2_tpu.golden.vif_int import _statistic as oracle_stat
    from pqa2_tpu.ops.vif_int import _breakpoints_device
    from pqa2_tpu.ops.vif_int import _statistic as dev_stat

    n = 512
    s1 = np.concatenate([
        rng.integers(0, 131072, n // 4),            # flat branch
        rng.integers(131072, 1 << 31, n // 2),      # log branch
        np.full(n // 4, 131072),                    # boundary
    ]).astype(np.int64)
    s2 = rng.integers(0, 1 << 31, n).astype(np.int64)
    s12 = np.concatenate([
        rng.integers(-(1 << 30), 1 << 30, n - 64),
        np.zeros(32, np.int64),                     # g == 0
        s1[-32:],                                   # identity-ish g ~ 1
    ]).astype(np.int64)
    # keep |s12| <= sqrt(s1*s2) plausibility for the huge rows
    cap = np.sqrt(np.maximum(s1, 1).astype(np.float64)
                  * np.maximum(s2, 1).astype(np.float64)).astype(np.int64)
    s12 = np.clip(s12, -cap, cap)

    shaped = [x.reshape(1, 16, 32) for x in (s1, s2, s12)]
    table = _breakpoints_device()
    for gl in (float("inf"), 1.0):
        no, do = oracle_stat(*[x[0] for x in shaped], gl)
        nd, dd = dev_stat(*[jnp.asarray(x, jnp.int32) for x in shaped], gl,
                          table)
        np.testing.assert_allclose(float(np.asarray(nd)[0]), no,
                                   rtol=3e-7, atol=1e-4)
        np.testing.assert_allclose(float(np.asarray(dd)[0]), do,
                                   rtol=3e-7, atol=1e-4)


def test_crlog2_direct_exhaustive_numpy():
    """ops/crlog2.py's double-f32 sequence reproduces the golden Q11 table
    on EVERY mantissa under strict IEEE numpy float32 — the host-side leg
    of the per-backend in-kernel audit
    (ops/pallas_vif_int.py:log2_direct_exceptions). Zero exceptions here:
    numpy never contracts the Dekker transforms."""
    from pqa2_tpu.ops.crlog2 import log2_q11_direct

    m = np.arange(2**15, 2**16, dtype=np.float32)
    u = log2_q11_direct(m).astype(np.int64)
    want = log2_table().astype(np.int64)[2**15:2**16] - 30720
    np.testing.assert_array_equal(u, want)


def test_crlog2_light_exhaustive_numpy():
    """The ~68-op TRIMMED sequence (ops/crlog2.py:log2_q11_light) misses
    the golden Q11 table on exactly 1 of 32768 mantissas under IEEE numpy
    float32, by one step — inside the audit's compare-add budget
    (_LOG2_DIRECT_MAX_EXC = 8), which is what lets the tiered audit ship
    it as the default exact-statistic engine."""
    from pqa2_tpu.ops.crlog2 import log2_q11_light
    from pqa2_tpu.ops.pallas_vif_int import _LOG2_DIRECT_MAX_EXC

    m = np.arange(2**15, 2**16, dtype=np.float32)
    u = log2_q11_light(m).astype(np.int64)
    want = log2_table().astype(np.int64)[2**15:2**16] - 30720
    bad = np.nonzero(u != want)[0]
    assert len(bad) <= _LOG2_DIRECT_MAX_EXC, len(bad)
    assert np.all(np.abs(u[bad] - want[bad]) == 1), (
        u[bad] - want[bad])


def test_table_is_f32_double_rounded():
    """The golden table is NOT round(log2(m)*2048) of the infinitely
    precise log2 — libvmaf quantises log2 to FLOAT32 first, and that
    double rounding moves exactly 38 of the 32768 entries (80-bit
    exhaustive). Pinned so nobody "simplifies" an engine against the
    single-rounded values: any sequence matching the table must
    reproduce the correctly-rounded f32 y32 (2^-35.8 midpoint margin),
    which is what both crlog2 sequences target."""
    m = np.arange(2**15, 2**16, dtype=np.int64)
    t = np.log2(m.astype(np.longdouble)) * 2048.0
    single = np.floor(t + np.longdouble(0.5)).astype(np.int64)
    table = log2_table().astype(np.int64)[2**15:2**16]
    moved = int(np.sum(single != table))
    assert moved == 38, moved
