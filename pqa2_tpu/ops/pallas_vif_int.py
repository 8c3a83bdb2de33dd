"""Fused integer fixed-point VIF Pallas kernel (+ fused integer motion).

The throughput variant of the integer feature path. ops/vif_int.py (the
bit-exact XLA twin of golden/vif_int.py) materialises every filtered moment
in HBM between passes; here — as in the f32 cascade ops/pallas_vif.py —
each scale's moments, statistic and the next scale's decimated inputs are
produced from one VMEM-resident tile read, all in exact uint32 split
arithmetic (same Q-schedule: Q16 taps, vertical mu >> (8+q), Q24 horizontal
mu, ``(a*b + 2^31) >> 32`` mean products, int32 Q16-pixel^2 sigma planes).

Numerics vs the XLA twin: every integer stage is bit-identical per pixel.
The only deviations are float reassociation in the final reductions —
per-tile f32 partial sums of the (f32) num/den statistic instead of one
whole-frame reduce, and the motion SAD accumulated as exact per-tile
integer partials recombined in f32 (~6e-8 relative, the same recombination
error ops/motion_int.py documents). Pinned against the XLA twin in
tests/test_pallas_int.py.

Layout/grid structure matches ops/pallas_vif.py (host reflect-pad, row
tiles + 128-lane row-filter halo, (8, 128) accumulator block revisited per
frame, MXU one-hot decimation — exact here because Q8 values < 2^24
round-trip f32 losslessly).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pqa2_tpu.golden.fixedpoint import (
    MOTION_FILTER_Q16,
    SIGMA_NSQ_Q16,
    VIF_FILTERS_Q16,
)
# Exact arithmetic shared with the XLA twin (pure jnp, lowers fine inside
# Mosaic kernels): (a*b + 2^31) >> 32 in 16-bit limbs, and the per-pixel
# element stage of the exact LUT statistic (u32 split math, no gather).
from pqa2_tpu.ops.vif_int import _mul_shift32, _statistic_element

DEFAULT_TILE_H = 64
TILE_W = 512

# Profiling-only ablation knob (tools/; NOT a correctness switch): "nofetch"
# skips the breakpoint-fetch correction inside the exact statistic (wrong
# scores, isolates the MXU fetch's runtime share), any other value is
# ignored. Timing harnesses set it per-subprocess.
_ABLATE = os.environ.get("PQA2_EXACT_ABLATE", "")

_MASK16 = np.uint32(0xFFFF)


def _exact_fused_max_tiles(tile_h: int, tile_w: int) -> int:
    """Per-frame tile-count bound for the fused exact statistic: beyond it
    the flat accumulator's reassembled hi word can pass 2^24 and the final
    f32 cast in _recombine_exact would round (see its docstring).

    Strict worst case per tile: the flat-branch split_sum total is
    <= nlan*65535, so its top 12-bit piece is <= that >> 24; the hi word
    reassembled from T tiles is bounded by T*(p2max*256 + 256) (the p1
    piece contributes <= 4095*T/16 < 256*T).  64x512 tiles -> 511,
    128x512 -> 255 — both cover DCI 4K (136 tiles at 128x512)."""
    nlan = tile_h * tile_w
    per_tile_hi = ((nlan * 65535) >> 24) * 256 + 256
    return (1 << 24) // per_tile_hi - 1


def _exact_fused_in_bounds(h: int, w: int, tile_h: int,
                           emit_next: bool) -> bool:
    """True when the fused exact statistic's f32 piece recombination is
    proven exact for this frame geometry (mirror of
    vif_int_scale_pallas's tile computation; see _recombine_exact)."""
    min_th = 16 if emit_next else 8
    th = max(min(tile_h, _round_up(h, min_th)) // min_th * min_th, min_th)
    wmult = 256 if emit_next else 128
    tw = min(TILE_W, _round_up(w, wmult))
    tiles = (-(-h // th)) * (-(-w // tw))
    return tiles <= _exact_fused_max_tiles(th, tw) and h * w < (1 << 24)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


_LOG2_DIRECT_EXC: dict = {}
_LOG2_DIRECT_ENGINE: dict = {}  # (backend, interpret) -> "light"|"direct"
_LOG2_DIRECT_MAX_EXC = 8


def log2_direct_exceptions(interpret: bool = False):
    """Exhaustive on-device audit of ops/crlog2.py's double-f32 log2
    against golden/log2lut.py's Q11 table

        u(m) = round(log2f(m) * 2048) - 30720   (log2f correctly rounded)

    for EVERY mantissa m in [2^15, 2^16) — evaluated INSIDE a Pallas
    kernel so the probed sequence is the exact lowering the statistic
    kernel uses.  The hardware log2 itself is only faithful (1909/32768
    mantissas off by one step on TPU Mosaic, 34 on XLA:CPU), which is why
    the sequence is built from Dekker error-free transforms instead; the
    in-kernel probe catches any backend whose compiler breaks those
    transforms (FMA contraction, reassociation, flush-to-zero).

    Returns a tuple of per-backend corrections ((mantissa, delta), ...) —
    empty when the sequence is already exact (TPU Mosaic: 0/32768), tiny
    when a compiler contraction nudges isolated near-ties (XLA: exactly
    one, m=61340, off by one step) — or None when the backend misses more
    than _LOG2_DIRECT_MAX_EXC mantissas and the direct engine must not be
    used.  With a non-None answer the fused exact statistic computes the
    table value directly per pixel (plus one compare-add per exception)
    and drops the breakpoint-fetch machinery entirely (the MXU fetch
    measured 4.9 of 10.6 ms per 4K frame); on None the proven one-hot MXU
    fetch remains the fallback.  Probed once per backend and cached.  The
    probe itself must execute EAGERLY (it reads device results back); if
    first queried while an outer jit is tracing, it conservatively
    answers None (fetch path) WITHOUT caching — eager call sites
    (pipeline/scoring, the parallel scorer builders, bench) probe up
    front so the fast answer is cached before any traced query."""
    if jax.default_backend() != "tpu":
        interpret = True  # compiled pallas exists only on TPU here
    key = (jax.default_backend(), bool(interpret))
    if key in _LOG2_DIRECT_EXC:
        return _LOG2_DIRECT_EXC[key]
    try:
        from jax._src.core import trace_state_clean  # not re-exported >=0.9
    except ImportError:  # pragma: no cover - future jax renames
        def trace_state_clean():
            return True
    if not trace_state_clean():
        return None

    from pqa2_tpu.golden.log2lut import log2_table
    from pqa2_tpu.ops.crlog2 import log2_q11_direct, log2_q11_light

    m_host = (32768.0 + np.arange(32768.0)).reshape(256, 128)
    want = log2_table()[32768:65536].astype(np.int64) - 30720
    # Tiered probe: the ~68-op trimmed sequence first (1 exception on
    # IEEE f32 — see crlog2.log2_q11_light), the full correctly-rounded
    # ~115-op sequence second, the MXU breakpoint fetch as the
    # always-correct floor.
    for engine_name, engine_fn in (("light", log2_q11_light),
                                   ("direct", log2_q11_direct)):
        def kernel(m_ref, o_ref, fn=engine_fn):
            o_ref[...] = fn(m_ref[...]).astype(jnp.int32)

        got = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
            interpret=interpret,
        )(jnp.asarray(m_host, jnp.float32))
        got = np.asarray(got).reshape(-1).astype(np.int64)
        bad = np.nonzero(got != want)[0]
        if len(bad) <= _LOG2_DIRECT_MAX_EXC:
            exc = tuple(
                (int(i) + 32768, int(want[i] - got[i])) for i in bad
            )
            _LOG2_DIRECT_EXC[key] = exc
            _LOG2_DIRECT_ENGINE[key] = engine_name
            return exc
    _LOG2_DIRECT_EXC[key] = None
    _LOG2_DIRECT_ENGINE[key] = None
    return None


def log2_direct_ok(interpret: bool = False) -> bool:
    """True when the direct double-f32 table engine is usable on this
    backend (see log2_direct_exceptions)."""
    return log2_direct_exceptions(interpret) is not None


def log2_direct_engine_name(interpret: bool = False) -> str:
    """Which audited engine log2_direct_exceptions' correction list
    belongs to on this backend ("light" or "direct"). Answered from the
    probe cache; a missing entry (exceptions forced externally, e.g.
    tests) conservatively maps to the full direct sequence."""
    if jax.default_backend() != "tpu":
        interpret = True
    return _LOG2_DIRECT_ENGINE.get(
        (jax.default_backend(), bool(interpret)), "direct")


def log2_direct_engine_fn(interpret: bool = False):
    """The audited per-pixel table-value engine callable (see
    log2_direct_engine_name)."""
    from pqa2_tpu.ops.crlog2 import log2_q11_direct, log2_q11_light

    name = log2_direct_engine_name(interpret)
    return log2_q11_light if name == "light" else log2_q11_direct


_BP_PLANES = None


def _bp_planes() -> jnp.ndarray:
    """(128, 128) bf16 pack of the log2-LUT breakpoints for the in-kernel
    one-hot MXU fetch (golden/log2lut.py:breakpoints_ext).

    The kernel uses the ONE-FETCH floor form: the unrounded f32 candidate
    c = log2(m)*2048 - 30720 lies within +-0.52 of the table's rounding
    target, so f = clip(floor(c), 0, 2047) is u-1 or u exactly, and

        u = f + [m >= B(f + 1)]

    needs a single breakpoint.  The fetch is PACKED TWO PER STREAMED
    COLUMN: the MXU streams one rhs column per output lane regardless of
    how much of the 128x128 array the operands cover, so the round-3
    (32, 128) plane pack left 3/4 of every pass idle.  Decomposing
    f = 32*q + r (q < 64, r < 32) and block-diagonalising two copies of
    the (64, 64) byte pack

        P1[32*b + r, q] = byte_b(B(32*q + r + 1))   b in {0: hi, 1: lo}

    lets ONE (128, 128) @ (128, wc) pass fetch breakpoints for TWO index
    streams (K rows 0:64 carry stream a's one-hot(q), rows 64:128 stream
    b's; output rows 0:64 hold stream a's bytes, 64:128 stream b's).
    The statistic needs three fetches per log pixel (m_den, m1, m2):
    m1/m2 pair naturally and the den plane pairs with its own second
    half, so the fetch streams 1.5 MXU columns per pixel instead of 3.
    All entries are bf16-exact integers (<= 255); B(f+1) is recovered
    exactly and u from one integer comparison (pinned exhaustively in
    tests/test_log2lut.py and on-silicon by bench parity).
    """
    global _BP_PLANES
    if _BP_PLANES is None:
        from pqa2_tpu.golden.log2lut import breakpoints_ext

        ext = breakpoints_ext().astype(np.int64)
        cur = ext[np.arange(2048) + 1]
        p1 = np.zeros((64, 64), dtype=np.float32)
        for b, plane in enumerate((cur >> 8, cur & 255)):
            # [32*b + r, q] = plane[32*q + r]
            p1[32 * b:32 * (b + 1), :] = plane.reshape(64, 32).T
        pack = np.zeros((128, 128), dtype=np.float32)
        pack[0:64, 0:64] = p1
        pack[64:128, 64:128] = p1
        _BP_PLANES = pack  # cache host-side: callers may be inside a jit
    return jnp.asarray(_BP_PLANES, dtype=jnp.bfloat16)


def _pieces3(s):  # i32 (signed-safe): s = p2*2^24 + p1*2^12 + p0
    f32 = jnp.float32
    return [
        (s >> 24).astype(f32),
        ((s >> 12) & 4095).astype(f32),
        (s & 4095).astype(f32),
    ]


def _pieces2(s):  # i32 in [0, 2^24)
    f32 = jnp.float32
    return [(s >> 12).astype(f32), (s & 4095).astype(f32)]


def _split_sum(vals, rows):
    """u32 values < 2^16 over the tile -> 12-bit pieces of the exact
    total (the total can reach 2^31.3: reduce halves in i32, combine
    in u32 — Mosaic has no u32 reduction or u32<->f32 casts)."""
    i32 = jnp.int32
    f32 = jnp.float32
    half = rows // 2
    a = jnp.sum(vals[:half].astype(i32))
    b = jnp.sum(vals[half:].astype(i32))
    tot = a.astype(jnp.uint32) + b.astype(jnp.uint32)
    return [
        (tot >> 24).astype(i32).astype(f32),
        ((tot >> 12) & jnp.uint32(4095)).astype(i32).astype(f32),
        (tot & jnp.uint32(4095)).astype(i32).astype(f32),
    ]


def _fused_exact_slots(s1, s2, s12, gain_limit, valid, tile_w, planes,
                       direct_exc=None, log2_engine="direct"):
    """Exact LUT statistic fully inside the kernel.

    Runs the twin's element stage (ops/vif_int.py:_statistic_element) on
    the tile, evaluates the three Q11 log lookups per log-branch pixel,
    and reduces everything to per-tile integer partial sums split into
    12-bit pieces so the f32 accumulator block stays exact across the
    _exact_fused_max_tiles bound.  vif_int_scale_pallas recombines the
    pieces into _statistic's exact (hi, lo) pairs — the final f32
    num/den are bit-identical to the XLA twin.

    Two lookup engines, both exact:

    * ``direct_exc is not None`` (the fast path, gated per backend by
      log2_direct_exceptions, whose audited correction list this is):
      ops/crlog2.py computes the correctly-rounded f32 log2 in double-f32
      arithmetic, from which the Q11 table value follows by one rounding
      — pure VPU work, no table, no MXU pass — plus one compare-add per
      audited exception mantissa (0 on TPU Mosaic, 1 on XLA).
    * ``direct_exc is None`` (fallback): f32 log2 candidate, +-1-safe,
      corrected by integer comparisons against the exact breakpoints
      fetched TWO-PER-COLUMN with a block-diagonal one-hot bf16 matmul
      (see _bp_planes).

    Both accumulate the OFFSET table value u = t[m] - 30720 in [0, 2048]:
    the den sum then stays <= 2048 * 2^16 = 2^27 per 128x512 tile — the
    raw t sum could reach 32768 * 2^16 = 2^31 EXACTLY (11 mantissas hit
    t = 32768), one past i32's ceiling.  The offsets cancel in num
    (t1 - t2 = u1 - u2) and _recombine_exact restores den's 30720*n_log
    term exactly.

    Returns [(acc column, f32 scalar), ...] for columns 4..20.
    """
    lb, nb, k_den, m_den, num_k, m1, m2, s2m = _statistic_element(
        s1, s2, s12, gain_limit
    )
    i32 = jnp.int32
    f32 = jnp.float32
    tw = tile_w
    rows = s1.shape[0]
    lbv = lb & valid
    nbv = nb & valid
    zero = i32(0)
    nlan = rows * tw

    if direct_exc is not None:
        # Direct engine: the lookup is PURE ELEMENTWISE VPU work, so run
        # it on the native (rows, tw) tile layout at full vreg occupancy.
        # (The (1, nlan) flat streams below exist for the MXU fetch
        # engine's one-hot matmul columns; a (1, N) vector leaves 7/8 of
        # every (8, 128) vreg idle, which made the double-f32 evaluation
        # look ~8x more expensive than its op count.)
        from pqa2_tpu.ops.crlog2 import log2_q11_direct, log2_q11_light

        log2_fn = (log2_q11_light if log2_engine == "light"
                   else log2_q11_direct)

        def u2d(mu):  # u32 mantissas (rows, twp) -> exact u values (i32)
            mf = mu[:, :tw].astype(i32).astype(f32)
            u = log2_fn(mf)
            for m_e, d_e in direct_exc:
                u = u + jnp.where(mf == np.float32(m_e),
                                  f32(d_e), f32(0.0))
            return jnp.clip(u, 0.0, 2048.0).astype(i32)

        # Same i32 soundness as the flat path: |u1-u2| <= 2048 and
        # u <= 2048 over <= 65536 lanes keep both totals under 2^27.
        u1, u2_, udn = u2d(m1), u2d(m2), u2d(m_den)
        num_tab_s = jnp.sum(
            jnp.where(nbv[:, :tw], u1 - u2_, zero))
        den_tab_s = jnp.sum(jnp.where(lbv[:, :tw], udn, zero))

        num_k_s = jnp.sum(jnp.where(nbv, num_k, zero))
        den_k_s = jnp.sum(jnp.where(lbv, k_den, zero))
        n_log_s = jnp.sum(lbv.astype(i32))

        s2mv = jnp.where(valid, s2m, jnp.uint32(0))
        vals = (
            _pieces3(num_tab_s)
            + _pieces3(den_tab_s)
            + _pieces2(num_k_s)
            + _pieces2(den_k_s)
            + [n_log_s.astype(f32)]
            + _split_sum(s2mv >> 16, rows)
            + _split_sum(s2mv & jnp.uint32(0xFFFF), rows)
        )
        return [(4 + i, v) for i, v in enumerate(vals)]

    # Mosaic lowers jnp.reshape (rows, tw) -> (1, rows*tw) value-exactly
    # (lane dim a 128-multiple; verified per-value on silicon), so the
    # three mantissa planes and their branch masks flatten to lane
    # vectors for free — no row-extract matmuls.  Mantissas < 2^16 are
    # exact in f32; the masks multiply the fetched t values so masked
    # lanes contribute exactly 0 (log2 of a masked lane's garbage
    # mantissa is clipped/NaN but never reaches the sum).
    def flat(x):  # (rows, twp) -> (1, nlan) f32, halo columns dropped
        x = x[:, :tw]
        if x.dtype == jnp.bool_:
            x = x.astype(f32)
        elif x.dtype != jnp.float32:
            x = x.astype(i32).astype(f32)
        return jnp.reshape(x, (1, nlan))

    def fetch2(mfa, mfb):
        """Paired lookups: exact OFFSET table values u = t[m] - 30720
        (i32 in [0, 2048]) for two mantissa streams, via ONE streamed MXU
        pass (the _bp_planes block-diag pack) correcting the +-1-safe f32
        log2 candidate. (The direct engine returned above — it never
        reaches these flat streams.)"""
        wc = mfa.shape[1]
        mf = jnp.concatenate([mfa, mfb], axis=0)  # (2, wc)
        # One-fetch floor form (see _bp_planes): f in {u-1, u} exactly.
        idxf = jnp.clip(
            jnp.floor(jnp.log2(mf) * 2048.0 - 30720.0), 0.0, 2047.0
        )
        if _ABLATE == "nofetch":  # timing-only: skip the correction
            t_ = idxf.astype(i32)
            return [t_[0:1], t_[1:2]]
        jdx = idxf.astype(i32)
        q = jdx >> 5
        r = jdx & 31
        qi = jax.lax.broadcasted_iota(i32, (64, wc), 0)
        rhs = jnp.concatenate(
            [(qi == q[0:1]).astype(jnp.bfloat16),
             (qi == q[1:2]).astype(jnp.bfloat16)], axis=0)  # (128, wc)
        at = jax.lax.dot_general(
            planes, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (128, wc): rows 32b+r / 64+32b+r hold the two byte planes
        ri = jax.lax.broadcasted_iota(i32, (32, wc), 0)
        tvs = []
        for s_, base in ((0, 0), (1, 64)):
            rsel = (ri == r[s_:s_ + 1]).astype(f32)
            v0 = jnp.sum(at[base:base + 32] * rsel, axis=0, keepdims=True)
            v1 = jnp.sum(at[base + 32:base + 64] * rsel, axis=0,
                         keepdims=True)
            bcur = v0 * 256.0 + v1  # B(f + 1), exact
            u = idxf[s_:s_ + 1] + (mf[s_:s_ + 1] >= bcur).astype(f32)
            tvs.append(u.astype(i32))  # t[m] - 30720, exact
        return tvs

    # Chunked lookups bound the (128, CH) operands so the bf16 MXU pass
    # (or the direct path's double-f32 temporaries) stay VMEM-friendly at
    # any tile size.
    CH = 8192
    # Numerator: t[m1] - t[m2] = u1 - u2 per num-branch pixel (the 30720
    # offsets cancel) — the two streams pair into one lookup.
    # |u1 - u2| <= 2048, so the i32 total stays under 2^28 even at
    # 128x512 tiles.
    m1f, m2f = flat(m1), flat(m2)
    nbi = flat(nbv).astype(i32)
    num_tab_s = zero
    for c0 in range(0, nlan, CH):
        tva, tvb = fetch2(m1f[:, c0:c0 + CH], m2f[:, c0:c0 + CH])
        num_tab_s = num_tab_s + jnp.sum((tva - tvb) * nbi[:, c0:c0 + CH])
    # Denominator: one stream, paired with its own second half.  OFFSET
    # values u <= 2048 keep the total over <= 65536 lanes at <= 2^27 —
    # sound in i32 (the raw t sum would touch 2^31 exactly; see the
    # function docstring). _recombine_exact restores 30720*n_log.
    hl = nlan // 2
    mdf = flat(m_den)
    lbi = flat(lbv).astype(i32)
    den_tab_s = zero
    for c0 in range(0, hl, CH):
        c1 = min(c0 + CH, hl)
        tva, tvb = fetch2(mdf[:, c0:c1], mdf[:, hl + c0:hl + c1])
        den_tab_s = (den_tab_s
                     + jnp.sum(tva * lbi[:, c0:c1])
                     + jnp.sum(tvb * lbi[:, hl + c0:hl + c1]))

    num_k_s = jnp.sum(jnp.where(nbv, num_k, zero))
    den_k_s = jnp.sum(jnp.where(lbv, k_den, zero))
    n_log_s = jnp.sum(lbv.astype(i32))

    s2mv = jnp.where(valid, s2m, jnp.uint32(0))
    vals = (
        _pieces3(num_tab_s)
        + _pieces3(den_tab_s)
        + _pieces2(num_k_s)
        + _pieces2(den_k_s)
        + [n_log_s.astype(f32)]
        + _split_sum(s2mv >> 16, rows)
        + _split_sum(s2mv & jnp.uint32(0xFFFF), rows)
    )
    return [(4 + i, v) for i, v in enumerate(vals)]


def _statistic_int(s1i, s2i, s12i, gain_limit):
    """int32 Q16 sigma planes -> per-pixel (num, den) f32 maps
    (ops/vif_int.py:_statistic, element stage only)."""
    s1 = jnp.maximum(s1i, 0).astype(jnp.float32) / 65536.0
    s2 = jnp.maximum(s2i, 0).astype(jnp.float32) / 65536.0
    s12 = s12i.astype(jnp.float32) / 65536.0
    log_branch = s1i >= np.int32(SIGMA_NSQ_Q16)
    g = jnp.where(s12 > 0.0, s12 / jnp.maximum(s1, 1e-10), 0.0)
    # NEG clamp after sv (libvmaf order; matches the exact statistic).
    sv_sq = jnp.maximum(s2 - g * s12, 0.0)
    if math.isfinite(gain_limit):  # inf literals can break Mosaic
        g = jnp.minimum(g, gain_limit)
    num_log = jnp.log2(1.0 + g * g * s1 / (sv_sq + 2.0))
    den_log = jnp.log2(1.0 + s1 / 2.0)
    num = jnp.where(log_branch, num_log, 1.0 - s2 * (4.0 / (255.0 * 255.0)))
    den = jnp.where(log_branch, den_log, 1.0)
    return num, den


def _make_int_kernel(taps: np.ndarray, tile_h: int, tile_w: int,
                     h: int, w: int, gain_limit: float, in_q: int,
                     next_taps=None, with_motion=False, emit_sigma=False,
                     exact_fused=False, exact_direct_exc=None,
                     exact_log2_engine="direct"):
    k = len(taps)
    half = k // 2
    rows = tile_h + 2 * half
    rows8 = _round_up(rows, 8)
    twp = tile_w + 128
    taps_u = [int(t) for t in taps]
    u32 = jnp.uint32

    def kernel(ref_hbm, dist_hbm, *rest):
        rest = list(rest)
        bp_ref = rest.pop(0) if exact_fused and exact_direct_exc is None else None
        acc_ref = rest.pop(0)
        if emit_sigma:
            s1_out = rest.pop(0)
            s2_out = rest.pop(0)
            s12_out = rest.pop(0)
        if next_taps is not None:
            ref_next, dist_next, vmem, sem = rest
        else:
            vmem, sem = rest
        n = pl.program_id(0)
        t = pl.program_id(1)
        j = pl.program_id(2)
        nn = pl.num_programs(0)
        nt = pl.num_programs(1)
        nj = pl.num_programs(2)
        streams = 3 if with_motion else 2

        # Double-buffered input pipeline: each grid step waits on the tiles
        # the PREVIOUS step prefetched into its slot and immediately starts
        # the NEXT step's DMAs into the other slot, so HBM reads overlap
        # compute instead of serialising at the top of every step.
        def start_copies(slot, ni, ti, ji):
            srcs = [
                ref_hbm.at[ni, pl.ds(ti * tile_h, rows8),
                           pl.ds(ji * tile_w, twp)],
                dist_hbm.at[ni, pl.ds(ti * tile_h, rows8),
                            pl.ds(ji * tile_w, twp)],
            ]
            if with_motion:
                srcs.append(
                    ref_hbm.at[jnp.maximum(ni - 1, 0),
                               pl.ds(ti * tile_h, rows8),
                               pl.ds(ji * tile_w, twp)]
                )
            for k_s, src in enumerate(srcs):
                pltpu.make_async_copy(
                    src, vmem.at[slot, k_s, pl.ds(0, rows8), :],
                    sem.at[slot, k_s],
                ).start()

        def wait_copies(slot):
            for k_s in range(streams):
                # The descriptor only sizes the semaphore wait; any
                # shape-matched src works.
                pltpu.make_async_copy(
                    ref_hbm.at[0, pl.ds(0, rows8), pl.ds(0, twp)],
                    vmem.at[slot, k_s, pl.ds(0, rows8), :],
                    sem.at[slot, k_s],
                ).wait()

        step = (n * nt + t) * nj + j
        slot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _():
            start_copies(0, n, t, j)

        j1 = j + 1
        cj = j1 == nj
        j1 = jnp.where(cj, 0, j1)
        t1 = jnp.where(cj, t + 1, t)
        ct = t1 == nt
        t1 = jnp.where(ct, 0, t1)
        n1 = jnp.where(ct, n + 1, n)

        @pl.when(n1 < nn)
        def _():
            start_copies(1 - slot, n1, t1, j1)

        wait_copies(slot)

        r = vmem[slot, 0, :rows, :]
        d = vmem[slot, 1, :rows, :]

        # -- exact uint32 separable convs (ops/vif_int.py Q-schedule) -----
        # All VIF/motion taps are SYMMETRIC (golden/fixedpoint.py), so each
        # pass folds mirror slices before multiplying: c*(x_i + x_j) equals
        # c*x_i + c*x_j exactly in mod-2^32 u32 arithmetic, and the
        # accumulated totals are the SAME integers as the unfolded loop
        # (tap-sum 2^16 bounds every true total below 2^32), so every
        # downstream value is bit-identical to the XLA twin while the
        # multiply count halves (17 -> 9 at scale 0).
        def _fold_plan(taps_l):
            k = len(taps_l)
            if all(taps_l[i] == taps_l[k - 1 - i] for i in range(k)):
                return [(i, k - 1 - i) for i in range(k // 2)], (
                    k // 2 if k % 2 else None)
            return None, None

        def col_direct(x, taps_l, shift, off=0):
            pairs, center = _fold_plan(taps_l)
            if pairs is None:
                acc = None
                for i, c in enumerate(taps_l):
                    term = u32(c) * x[off + i : off + i + tile_h, :]
                    acc = term if acc is None else acc + term
            else:
                acc = None
                for i, j in pairs:
                    s_ = (x[off + i : off + i + tile_h, :]
                          + x[off + j : off + j + tile_h, :])
                    term = u32(taps_l[i]) * s_
                    acc = term if acc is None else acc + term
                if center is not None:
                    acc = acc + u32(taps_l[center]) * x[
                        off + center : off + center + tile_h, :]
            if shift:
                acc = (acc + u32(1 << (shift - 1))) >> shift
            return acc

        # The horizontal (lane-direction) filters run TRANSPOSED: Mosaic's
        # 2-D transpose costs ~2 elementwise passes while pltpu.roll costs
        # ~10, so transposing each vertically-filtered plane once and
        # sliding along SUBLANES (plain slices, like the vertical stage)
        # replaces the 9-roll lane filter. Per output pixel the ops and
        # their order are identical, so every value stays bit-exact; the
        # transposed outputs are (tile_w, tile_h) with no junk columns
        # (slices yield exactly tile_w outputs — sublane = frame column).
        def rowT_direct(x, taps_l, shift, off=0):
            xT = x.T  # (twp, tile_h)
            pairs, center = _fold_plan(taps_l)
            if pairs is None:
                acc = None
                for i, c in enumerate(taps_l):
                    s_ = off + i
                    term = u32(c) * xT[s_ : s_ + tile_w, :]
                    acc = term if acc is None else acc + term
            else:
                acc = None
                for i, j in pairs:
                    s_ = (xT[off + i : off + i + tile_w, :]
                          + xT[off + j : off + j + tile_w, :])
                    term = u32(taps_l[i]) * s_
                    acc = term if acc is None else acc + term
                if center is not None:
                    acc = acc + u32(taps_l[center]) * xT[
                        off + center : off + center + tile_w, :]
            if shift:
                acc = (acc + u32(1 << (shift - 1))) >> shift
            return acc

        # Split variants pre-split the padded plane ONCE (slice-of-shift ==
        # shift-of-slice) instead of shifting/masking every tap slice.
        def col_split(x, taps_l, shift=16):
            mask = u32((1 << shift) - 1)
            xh, xl = x >> shift, x & mask
            pairs, center = _fold_plan(taps_l)
            hi = lo = None
            if pairs is None:
                idx = [(i, None) for i in range(len(taps_l))]
            else:
                idx = pairs + ([(center, None)] if center is not None
                               else [])
            for i, j in idx:
                c = u32(taps_l[i])
                sh = xh[i : i + tile_h, :]
                sl = xl[i : i + tile_h, :]
                if j is not None:
                    sh = sh + xh[j : j + tile_h, :]
                    sl = sl + xl[j : j + tile_h, :]
                thi = c * sh
                tlo = c * sl
                hi = thi if hi is None else hi + thi
                lo = tlo if lo is None else lo + tlo
            return hi + ((lo + u32(1 << (shift - 1))) >> shift)

        def rowT_split(x, taps_l, shift=16):
            xT = x.T  # (twp, tile_h)
            mask = u32((1 << shift) - 1)
            xh, xl = xT >> shift, xT & mask
            pairs, center = _fold_plan(taps_l)
            hi = lo = None
            if pairs is None:
                idx = [(i, None) for i in range(len(taps_l))]
            else:
                idx = pairs + ([(center, None)] if center is not None
                               else [])
            for i, j in idx:
                c = u32(taps_l[i])
                sh = xh[i : i + tile_w, :]
                sl = xl[i : i + tile_w, :]
                if j is not None:
                    sh = sh + xh[j : j + tile_w, :]
                    sl = sl + xl[j : j + tile_w, :]
                thi = c * sh
                tlo = c * sl
                hi = thi if hi is None else hi + thi
                lo = tlo if lo is None else lo + tlo
            return hi + ((lo + u32(1 << (shift - 1))) >> shift)

        v_mu_shift = 8 + in_q
        mu1 = rowT_direct(col_direct(r, taps_u, v_mu_shift), taps_u, 0)
        mu2 = rowT_direct(col_direct(d, taps_u, v_mu_shift), taps_u, 0)

        def prod_plane(a, b):
            p = a * b  # exact in u32: operands < 2^16
            if in_q == 0:
                return rowT_direct(col_direct(p, taps_u, 16), taps_u, 0)
            # ops/vif_int.py:_sigma_planes schedule: vertical >> 16,
            # horizontal >> 2*in_q back to Q16 pixel^2 (both coincide at
            # 16 for the Q8 decimated scales; 10/12-bit native scale 0
            # uses in_q = 2/4).
            return rowT_split(col_split(p, taps_u, 16), taps_u, 2 * in_q)

        xx = prod_plane(r, r)
        yy = prod_plane(d, d)
        xy = prod_plane(r, d)

        s1 = (xx - _mul_shift32(mu1, mu1)).astype(jnp.int32)
        s2 = (yy - _mul_shift32(mu2, mu2)).astype(jnp.int32)
        s12 = (xy - _mul_shift32(mu1, mu2)).astype(jnp.int32)

        if next_taps is not None:
            # Next scale's inputs: blur with the NEXT scale's Q16 taps and
            # 2x-decimate — ops/vif_int.py:_decimate2 (rows -> Q8, cols
            # Q24 -> Q8). Q8 outputs < 2^16 round-trip f32 exactly, so the
            # MXU one-hot decimation (pallas_vif.py trick) stays bit-exact.
            k_n = len(next_taps)
            half_n = k_n // 2
            off = half - half_n
            taps_n = [int(c) for c in next_taps]

            blur = rowT_direct(
                col_direct(r, taps_n, 8 + in_q, off=off), taps_n, 16, off=off
            )
            blur_d = rowT_direct(
                col_direct(d, taps_n, 8 + in_q, off=off), taps_n, 16, off=off
            )

            th2, tw2 = tile_h // 2, tile_w // 2
            sub_r = jax.lax.broadcasted_iota(jnp.int32, (tw2, tile_w), 0)
            sub_c = jax.lax.broadcasted_iota(jnp.int32, (tw2, tile_w), 1)
            subsel = (sub_c == 2 * sub_r).astype(jnp.float32)
            lane_r = jax.lax.broadcasted_iota(jnp.int32, (tile_h, th2), 0)
            lane_c = jax.lax.broadcasted_iota(jnp.int32, (tile_h, th2), 1)
            lanesel = (lane_r == 2 * lane_c).astype(jnp.float32)

            subsel_b = subsel.astype(jnp.bfloat16)
            lanesel_b = lanesel.astype(jnp.bfloat16)

            def _dec_dots(xb):
                y = jax.lax.dot(subsel_b, xb,
                                preferred_element_type=jnp.float32)
                return jax.lax.dot(y.astype(jnp.bfloat16), lanesel_b,
                                   preferred_element_type=jnp.float32)

            def decimate_u32(xT):
                # Byte-split DEFAULT-precision MXU picks (exact: the
                # one-hot side is 0/1, each byte operand <= 255 is
                # bf16-exact, f32 accumulation of single picks is exact;
                # ~3x cheaper than HIGHEST f32 dots, equality pinned on
                # silicon). xT is the TRANSPOSED blur (sublane = frame
                # column): the even-column pick contracts sublanes, then
                # the small (tw2, th2) transpose restores standard layout.
                hi = (xT >> 8).astype(jnp.int32).astype(jnp.float32)
                lo = (xT & u32(255)).astype(jnp.int32).astype(jnp.float32)
                dh = _dec_dots(hi.astype(jnp.bfloat16))
                dl = _dec_dots(lo.astype(jnp.bfloat16))
                out = (dh.astype(jnp.int32) << 8) + dl.astype(jnp.int32)
                return out.T.astype(jnp.uint32)

            ref_next[0] = decimate_u32(blur)
            dist_next[0] = decimate_u32(blur_d)

        # Transposed mask: sublane = frame column, lane = frame row.
        sub_id = jax.lax.broadcasted_iota(jnp.int32, s1.shape, 0)
        lane_id = jax.lax.broadcasted_iota(jnp.int32, s1.shape, 1)
        valid = (
            (sub_id + j * tile_w < w)
            & (lane_id + t * tile_h < h)
        )
        exact_slots = []
        if emit_sigma:
            # Hybrid exact mode: the per-pixel int32 sigma planes go to
            # HBM; the LUT statistic (ops/vif_int.py:_statistic) consumes
            # them in XLA with the table gather. num/den are not computed
            # here. (Fallback path — exact_fused replaces it.)
            s1_out[0] = s1.T
            s2_out[0] = s2.T
            s12_out[0] = s12.T
            num_s = den_s = jnp.float32(0.0)
        elif exact_fused:
            if _ABLATE == "nostat":  # timing-only: statistic scaffolding
                exact_slots = [(4 + i, jnp.float32(0.0)) for i in range(17)]
            elif exact_direct_exc is not None:
                # Direct engine: elementwise + whole-tile sums only, so it
                # is layout-agnostic — run it straight on the kernel's
                # transposed planes (sublane = frame column), no
                # restore-layout transposes.
                exact_slots = _fused_exact_slots(
                    s1, s2, s12, gain_limit, valid, s1.shape[1],
                    None, direct_exc=exact_direct_exc,
                    log2_engine=exact_log2_engine,
                )
            else:
                # The MXU fetch statistic needs 128-multiple lane dims for
                # its value-exact flat reshape; restore standard layout
                # (three small transposes, exact data movement).
                colv = jax.lax.broadcasted_iota(
                    jnp.int32, (tile_h, tile_w), 1)
                rowv = jax.lax.broadcasted_iota(
                    jnp.int32, (tile_h, tile_w), 0)
                valid_std = (colv + j * tile_w < w) & (rowv + t * tile_h < h)
                exact_slots = _fused_exact_slots(
                    s1.T, s2.T, s12.T, gain_limit, valid_std, tile_w,
                    bp_ref[...], direct_exc=None,
                )
            num_s = den_s = jnp.float32(0.0)
        else:
            num, den = _statistic_int(s1, s2, s12, gain_limit)
            num_s = jnp.sum(jnp.where(valid, num, 0.0))
            den_s = jnp.sum(jnp.where(valid, den, 0.0))

        sad_hi = sad_lo = None
        if with_motion:
            # Integer motion blur (Q16 5-tap -> Q8, ops/motion_int.py) on
            # ref[n] and ref[n-1]; exact per-tile integer SAD partials in a
            # hi/lo byte split (whole-tile sums stay far inside u32).
            k_m = len(MOTION_FILTER_Q16)
            half_m = k_m // 2
            off_m = half - half_m
            taps_m = [int(c) for c in MOTION_FILTER_Q16]

            def blur_m(x):
                tmp = col_direct(x, taps_m, 8 + in_q, off=off_m)
                return rowT_direct(tmp, taps_m, 16, off=off_m)

            ba = blur_m(r)
            bb = blur_m(vmem[slot, 2, :rows, :])
            diff = jnp.where(ba >= bb, ba - bb, bb - ba)
            diff = jnp.where(valid, diff, u32(0))
            # u32 -> i32 -> f32 (Mosaic lacks the direct u32 cast; both
            # byte-split halves are < 2^16 so i32 is lossless).
            sad_hi = jnp.sum((diff >> 8).astype(jnp.int32).astype(jnp.float32))
            sad_lo = jnp.sum(
                (diff & u32(0xFF)).astype(jnp.int32).astype(jnp.float32))

        row_id = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        col_id = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        writes = [(0, num_s), (1, den_s)]
        if sad_hi is not None:
            writes += [(2, sad_hi), (3, sad_lo)]
        writes += exact_slots
        blk = jnp.zeros((8, 128), jnp.float32)
        for col, val in writes:
            blk = jnp.where((row_id == 0) & (col_id == col), val, blk)

        first = (t == 0) & (j == 0)

        @pl.when(first)
        def _():
            acc_ref[0] = blk

        @pl.when(jnp.logical_not(first))
        def _():
            acc_ref[0] = acc_ref[0] + blk

    return kernel, rows


def _recombine_exact(a: jnp.ndarray, h: int, w: int):
    """Accumulator row (n, 128) of 12-bit piece sums -> per-frame exact
    (num, den), reproducing ops/vif_int.py:_statistic's final reduction
    BIT-FOR-BIT.

    The reassembled (hi, lo) pair need not be _sum_pair's normalised pair
    (piece sums carry unpropagated carries), but both decompose the same
    exact integer into two f32-exact addends, so the single f32 rounding
    of ``hi*65536 + lo`` matches the twin — PROVIDED every cast stays
    exact.  That holds when |hi| < 2^24, i.e. per-frame tile count
    <= _exact_fused_max_tiles(...) and frame pixels < 2^24 (the flat
    accumulator's hi word grows <= ~2^15 per 64x512 flat tile, <= ~2^16
    per 128x512 tile).  The caller
    (vif_features_int_pallas) enforces the bound by falling back to the
    emit_sigma hybrid — equally exact — for larger geometries."""
    i32 = jnp.int32
    f32 = jnp.float32

    def geti(c):
        return a[:, c].astype(i32)

    def rec3(c):
        # s = p2*2^24 + p1*2^12 + p0 (p1, p0 in [0, 4096)): the exact
        # (hi, lo) pair is hi = p2*256 + (p1>>4), lo = (p1&15)*4096 + p0
        # (lo < 2^16 always, so no carry).
        p2, p1, p0 = geti(c), geti(c + 1), geti(c + 2)
        return p2 * 256 + (p1 >> 4), ((p1 & 15) << 12) + p0

    def rec2(c):
        return (geti(c) << 12) + geti(c + 1)

    def pf(pair):
        hi, lo = pair
        return hi.astype(f32) * 65536.0 + lo.astype(f32)

    acc_num_tab = rec3(4)
    den_hi, den_lo = rec3(7)  # pieces of S_u = sum of (t[m] - 30720)
    acc_num_k = rec2(10)
    acc_den_k = rec2(12)
    n_log = geti(14)
    n_flat = jnp.int32(h * w) - n_log
    flat_hi = rec3(15)
    flat_lo = rec3(18)
    acc_flat = pf(flat_hi) * 65536.0 + pf(flat_lo)
    num = (pf(acc_num_tab) / 2048.0
           + acc_num_k.astype(f32)
           + (n_flat.astype(f32)
              - (acc_flat / 16384.0) / 65025.0))
    # Restore den's 30720*n_log offset (the kernel accumulates the offset
    # table values; see _fused_exact_slots): 30720*n_log = a*2^11 with
    # a = 15*n_log < 2^28, and a*2^11 = (a>>5)*2^16 + (a&31)*2^11 folds
    # into the (hi, lo) pair without breaking f32-exactness — hi stays
    # < 2^24 (tile bound) and lo < 2^24, so the single rounding of
    # hi*65536 + lo still yields RN(S_t), identical to the twin's pair.
    a = n_log * 15
    den_hi = den_hi + (a >> 5)
    den_lo = den_lo + ((a & 31) << 11)
    den = (pf((den_hi, den_lo)) / 2048.0
           + acc_den_k.astype(f32)
           - 17.0 * n_log.astype(f32)
           + n_flat.astype(f32))
    return num, den


@functools.partial(
    jax.jit,
    static_argnames=("scale", "gain_limit", "in_q", "tile_h", "interpret",
                     "emit_next", "with_motion", "emit_sigma",
                     "exact_fused", "exact_direct_exc",
                     "exact_log2_engine"),
)
def vif_int_scale_pallas(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    scale: int,
    gain_limit: float = float("inf"),
    in_q: int = 0,
    tile_h: int = DEFAULT_TILE_H,
    interpret: bool = False,
    emit_next: bool = False,
    with_motion: bool = False,
    emit_sigma: bool = False,
    exact_fused: bool = False,
    exact_direct_exc: tuple = None,
    exact_log2_engine: str = "direct",
):
    """uint32 (N, H, W) pair (Q{in_q} pixels) at this scale's resolution ->
    (num, den[, sad][, ref', dist']) — or, with ``emit_sigma``,
    (s1, s2, s12[, sad][, ref', dist']) int32 sigma planes for the exact
    XLA LUT statistic.  ``exact_fused`` computes the exact LUT statistic
    inside the kernel (gather-free breakpoint scheme) and returns
    (num, den, ...) bit-identical to ops/vif_int.py:_statistic."""
    taps = VIF_FILTERS_Q16[scale]
    n, h, w = ref.shape
    min_th = 16 if emit_next else 8
    tile_h = max(min(tile_h, _round_up(h, min_th)) // min_th * min_th, min_th)
    num_tiles = -(-h // tile_h)
    half = len(taps) // 2
    wmult = 256 if emit_next else 128
    tile_w = min(TILE_W, _round_up(w, wmult))
    num_w_tiles = -(-w // tile_w)
    wpad = num_w_tiles * tile_w + 128

    rows8 = _round_up(tile_h + 2 * half, 8)
    extra_rows = (num_tiles - 1) * tile_h + rows8 - (h + 2 * half)

    def pad(x):
        x = x.astype(jnp.uint32)
        x = jnp.pad(x, ((0, 0), (half, half), (half, half)), mode="reflect")
        return jnp.pad(
            x,
            ((0, 0), (0, max(extra_rows, 0)), (0, wpad - (w + 2 * half))),
        )

    ref_p = pad(ref)
    dist_p = pad(dist)

    next_taps = VIF_FILTERS_Q16[scale + 1] if emit_next else None
    kernel, rows = _make_int_kernel(
        taps, tile_h, tile_w, h, w, gain_limit, in_q,
        next_taps=next_taps, with_motion=with_motion, emit_sigma=emit_sigma,
        exact_fused=exact_fused, exact_direct_exc=exact_direct_exc,
        exact_log2_engine=exact_log2_engine,
    )
    out_specs = [
        pl.BlockSpec((1, 8, 128), lambda i, j, k2: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((n, 8, 128), jnp.float32)]
    if emit_sigma:
        hp, wp = num_tiles * tile_h, num_w_tiles * tile_w
        out_specs += [
            pl.BlockSpec((1, tile_h, tile_w), lambda i, j, k2: (i, j, k2),
                         memory_space=pltpu.VMEM),
        ] * 3
        out_shape += [jax.ShapeDtypeStruct((n, hp, wp), jnp.int32)] * 3
    if emit_next:
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        th2, tw2 = tile_h // 2, tile_w // 2
        out_specs += [
            pl.BlockSpec((1, th2, tw2), lambda i, j, k2: (i, j, k2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th2, tw2), lambda i, j, k2: (i, j, k2),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [jax.ShapeDtypeStruct((n, h2, w2), jnp.uint32)] * 2

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [ref_p, dist_p]
    if exact_fused and exact_direct_exc is None:
        in_specs.append(
            pl.BlockSpec((128, 128), lambda i, j, k2: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(_bp_planes())

    out = pl.pallas_call(
        kernel,
        grid=(n, num_tiles, num_w_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 3 if with_motion else 2, _round_up(rows, 8),
                        tile_w + 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 3 if with_motion else 2)),
        ],
        interpret=interpret,
    )(*inputs)

    acc = out[0]
    nxt = 1
    if emit_sigma:
        # Padded tile grids -> the true (n, h, w) planes.
        res = [out[nxt + i][:, :h, :w] for i in range(3)]
        nxt += 3
    elif exact_fused:
        res = list(_recombine_exact(acc[:, 0, :], h, w))
    else:
        res = [acc[:, 0, 0], acc[:, 0, 1]]
    if with_motion:
        # Recombine the hi/lo byte-split partials (ops/motion_int.py
        # semantics: mean |diff| in pixel units of the Q8 planes).
        total = acc[:, 0, 2] * 256.0 + acc[:, 0, 3]
        res.append(total / (float(h * w) * 256.0))
    if emit_next:
        res.extend([out[nxt], out[nxt + 1]])
    return tuple(res)


def vif_features_int_pallas(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    gain_limit: float = float("inf"),
    interpret: bool = False,
    with_motion: bool = False,
    bit_depth: int = 8,
    exact: bool = True,
    exact_impl: str = "fused",
):
    """(N, H, W) luma pair -> (N, 4) integer-path VIF via the fused cascade.

    Drop-in equivalent of ops.vif_int.vif_features_int_batched (each scale's
    kernel emits the next scale's Q8 decimated inputs from VMEM). With
    ``with_motion`` the scale-0 kernel also accumulates the integer motion
    SAD of the reference luma and the return becomes ((N, 4), (N,) sad)
    — sad[i] = mean |blur(ref[i]) - blur(ref[i-1])|, sad[0] = 0.

    exact=True (default) evaluates libvmaf's LUT log quantisation with
    integer accumulators, bit-identical to the XLA twin.  exact_impl
    picks how: "fused" (default) runs the whole statistic inside the
    kernels via the gather-free breakpoint scheme (round 3 — the per-
    pixel table gather that forced the old hybrid has no Mosaic lowering
    AND is ~10 ns/elt in XLA); "hybrid" keeps the round-3 fallback that
    emits int32 sigma planes for the XLA take-based statistic.
    exact=False keeps the round-2 fully-fused f32-log statistic
    (precision="integer_fast").
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    from pqa2_tpu.ops.vif_int import (
        _breakpoints_device,
        _statistic,
        to_native_grid,
    )

    ref, in_q = to_native_grid(ref, bit_depth)
    dist, _ = to_native_grid(dist, bit_depth)
    table = None
    feats = []
    sad = None
    # Interpret mode (CPU tests): small tiles — the kernel's unrolled
    # row loop makes trace/compile time scale with tile_h, and there is
    # no VMEM-efficiency reason to use big tiles off-chip.
    # On silicon BOTH modes run 128-row tiles (halves per-tile fixed
    # costs; measured -10% on scale 0). 128x512 is the exact statistic's
    # ceiling: its den LUT accumulator reaches 32767 * nlan = 2^31 - 2^16
    # — inside i32 exactly at nlan = 2^16 lanes, beyond it over
    # (_fused_exact_slots; _exact_fused_max_tiles re-derives the
    # cross-tile piece bound for the larger tiles).
    if interpret:
        tile_h = 16
    else:
        tile_h = int(os.environ.get("PQA2_VIF_TILE_H", 2 * DEFAULT_TILE_H))

    # Per-backend engine choice for the exact statistic (see
    # log2_direct_exceptions): direct double-f32 table values when the
    # backend proves them, breakpoint fetch otherwise.  Answered from
    # cache when this call is itself inside a jit trace.
    # PQA2_EXACT_ENGINE=fetch forces the fallback (A/B, timing).
    force_fetch = os.environ.get("PQA2_EXACT_ENGINE", "auto") == "fetch"
    direct_exc = (log2_direct_exceptions(interpret)
                  if exact and not force_fetch else None)
    log2_engine = log2_direct_engine_name(interpret)

    for scale in range(4):
        hybrid = exact and (
            exact_impl == "hybrid"
            or not _exact_fused_in_bounds(ref.shape[1], ref.shape[2],
                                          tile_h, emit_next=scale < 3)
        )
        if hybrid and table is None:
            table = _breakpoints_device()
        out = vif_int_scale_pallas(
            ref, dist, scale, gain_limit=gain_limit, in_q=in_q,
            tile_h=tile_h,
            interpret=interpret, emit_next=scale < 3,
            with_motion=with_motion and scale == 0,
            emit_sigma=hybrid,
            exact_fused=exact and not hybrid,
            exact_direct_exc=None if hybrid else direct_exc,
            exact_log2_engine=log2_engine,
        )
        if hybrid:
            s1, s2, s12 = out[0], out[1], out[2]
            rest = list(out[3:])
            num, den = _statistic(s1, s2, s12, gain_limit, table)
        else:
            num, den = out[0], out[1]
            rest = list(out[2:])
        if with_motion and scale == 0:
            sad = rest.pop(0)
        if scale < 3:
            ref, dist = rest
            in_q = 8
        feats.append(jnp.where(den > 0, num / den, 1.0))
    vif = jnp.stack(feats, axis=-1)
    if with_motion:
        return vif, sad
    return vif
