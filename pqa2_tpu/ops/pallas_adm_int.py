"""Fused integer ADM2 Pallas kernel (one Q15 DWT level per pass).

Integer twin of ops/pallas_adm.py, completing the fully-fused integer
feature path (with ops/pallas_vif_int.py): per band-row tile resident in
VMEM — the integer db2 DWT of ref and dist on the ADM_BAND_Q rounding
schedule (ops/adm_int.py:_dwt1d_axis_int: int32 Q15 taps, per-axis
``(acc + 2^(s-1)) >> s`` rounding — the two 1-D passes CANNOT be fused
into one separable sum like the f32 kernel because the schedule rounds
between them), exact integer decoupling (k = trunc((|t|<<15)/|o|) via an
f32 quotient estimate + exact int32 floor correction — Mosaic-safe, no
integer division), then the FIXED-POINT CSF/masking/pooling tail
(golden/adm_int.py schedule): IRF rfactor multiplies, trunc(S/30)
threshold (f32 reciprocal estimate + exact fixup), and exact uint64
cube-sum pooling as base-2^16 digit columns accumulated in the int32
(8, 128) accumulator block across tiles.

EVERY stage through the pooled digit sums is bit-identical to the XLA
twin and the int64 oracle; the final cbrt + power-of-two rescale is the
shared f32 combine (ops/adm_int.py:adm_from_digit_sums_batched). Pinned
in tests/test_pallas_int.py.

Host-side polyphase split, tile/halo geometry, the 3x3 threshold's
roll+clamp scheme and the (8, 128) accumulator block are identical to
ops/pallas_adm.py (see its docstring for the Mosaic derivation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pqa2_tpu.golden.adm import BORDER_FACTOR, COS_1DEG_SQ, NUM_LEVELS
from pqa2_tpu.golden.fixedpoint import (
    ADM_BAND_Q,
    ADM_CSF_SHIFT,
    ADM_TAIL_TABLES,
    DB2_HI_Q15,
    DB2_LO_Q15,
    adm_cube_shift,
)

DEFAULT_TILE_B = 32

_I32 = jnp.int32


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _trim(w: int) -> int:
    return max(int(w * BORDER_FACTOR - 0.5), 0)


def _make_int_kernel(tile_b: int, w2: int, w2p: int, h2: int, level: int,
                     gain_limit: float, extra_row_shift: int,
                     in_split: bool = False, out_i16: bool = False):
    lo = [int(c) for c in DB2_LO_Q15]
    hi = [int(c) for c in DB2_HI_Q15]
    nb = tile_b + 2
    comp_rows = nb + 1
    comp_rows8 = _round_up(comp_rows, 8)
    irf, _ = ADM_TAIL_TABLES[level]
    trim_h = _trim(h2)
    trim_w = _trim(w2)
    d_shift = adm_cube_shift((h2 - 2 * trim_h) * (w2 - 2 * trim_w))
    s_row = 15 + extra_row_shift  # vertical-pass rounding shift

    def kernel(ree, reo, roe, roo, dee, deo, doe, doo,
               acc_ref, a_ref_out, a_dist_out, vmem, sem):
        t = pl.program_id(1)
        n = pl.program_id(0)
        nn = pl.num_programs(0)
        nt = pl.num_programs(1)

        comps = (ree, reo, roe, roo, dee, deo, doe, doo)

        # Double-buffered input pipeline (ops/pallas_vif.py shape): wait
        # on the 8 component tiles the previous step prefetched into this
        # slot, start the next step's copies into the other slot — the 8
        # per-step DMAs were the kernel's dominant serial stall
        # (~34 grid steps per 4K frame at level 0).
        def start_copies(slot, ni, ti):
            for idx in range(8):
                pltpu.make_async_copy(
                    comps[idx].at[ni, pl.ds(ti * tile_b, comp_rows8), :],
                    vmem.at[slot, idx, pl.ds(0, comp_rows8), :],
                    sem.at[slot, idx],
                ).start()

        def wait_copies(slot):
            for idx in range(8):
                pltpu.make_async_copy(
                    comps[idx].at[0, pl.ds(0, comp_rows8), :],
                    vmem.at[slot, idx, pl.ds(0, comp_rows8), :],
                    sem.at[slot, idx],
                ).wait()

        step = n * nt + t
        slot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _():
            start_copies(0, n, t)

        t1 = t + 1
        ct = t1 == nt
        t1 = jnp.where(ct, 0, t1)
        n1 = jnp.where(ct, n + 1, n)

        @pl.when(n1 < nn)
        def _():
            start_copies(1 - slot, n1, t1)

        wait_copies(slot)

        def rshift(acc, s):
            return (acc + _I32(1 << (s - 1))) >> s

        def dwt2(base):
            ee = vmem[slot, base + 0, :comp_rows, :]
            eo = vmem[slot, base + 1, :comp_rows, :]
            oe = vmem[slot, base + 2, :comp_rows, :]
            oo = vmem[slot, base + 3, :comp_rows, :]

            def col_pass(taps):
                # Vertical (row-tap) pass with the schedule's intermediate
                # rounding (ops/adm_int.py:_dwt1d_axis_int, axis=-2).
                if not in_split:
                    e_lo = (_I32(taps[0]) * ee[:nb]
                            + _I32(taps[2]) * ee[1 : nb + 1])
                    o_lo = (_I32(taps[1]) * oe[:nb]
                            + _I32(taps[3]) * oe[1 : nb + 1])
                    e_hi = (_I32(taps[0]) * eo[:nb]
                            + _I32(taps[2]) * eo[1 : nb + 1])
                    o_hi = (_I32(taps[1]) * oo[:nb]
                            + _I32(taps[3]) * oo[1 : nb + 1])
                    return (rshift(e_lo + o_lo, s_row),
                            rshift(e_hi + o_hi, s_row))

                # Depth-16 level 0: codes < 2^16 overflow the plain i32
                # accumulator (sum|q15 tap| * 65535 ~ 2^31.74). Byte-split
                # exactly as ops/adm_int.py:_dwt1d_axis_int_split.
                def acc_split(pairs):
                    acc_h = acc_l = None
                    for c, plane in pairs:
                        ch = _I32(c) * (plane >> 8)
                        cl = _I32(c) * (plane & _I32(255))
                        acc_h = ch if acc_h is None else acc_h + ch
                        acc_l = cl if acc_l is None else acc_l + cl
                    a1 = acc_h >> (s_row - 8)
                    a0 = acc_h & _I32((1 << (s_row - 8)) - 1)
                    return a1 + (((a0 << 8) + acc_l
                                  + _I32(1 << (s_row - 1))) >> s_row)

                out_lo = acc_split([
                    (taps[0], ee[:nb]), (taps[2], ee[1 : nb + 1]),
                    (taps[1], oe[:nb]), (taps[3], oe[1 : nb + 1]),
                ])
                out_hi = acc_split([
                    (taps[0], eo[:nb]), (taps[2], eo[1 : nb + 1]),
                    (taps[1], oo[:nb]), (taps[3], oo[1 : nb + 1]),
                ])
                return out_lo, out_hi

            lo_e, lo_o = col_pass(lo)
            hi_e, hi_o = col_pass(hi)

            def row_pass(pe, po, taps):
                pe1 = pltpu.roll(pe, w2p - 1, axis=1)
                po1 = pltpu.roll(po, w2p - 1, axis=1)
                acc = (_I32(taps[0]) * pe + _I32(taps[1]) * po
                       + _I32(taps[2]) * pe1 + _I32(taps[3]) * po1)
                return rshift(acc, 15)

            return {
                "a": row_pass(lo_e, lo_o, lo),
                "v": row_pass(lo_e, lo_o, hi),
                "h": row_pass(hi_e, hi_o, lo),
                "d": row_pass(hi_e, hi_o, hi),
            }

        o = dwt2(0)
        td = dwt2(4)

        # -- integer decouple (ops/adm_int.py:decouple_int_batched) ---------
        ohf = o["h"].astype(jnp.float32)
        ovf = o["v"].astype(jnp.float32)
        thf = td["h"].astype(jnp.float32)
        tvf = td["v"].astype(jnp.float32)
        ot_dp = ohf * thf + ovf * tvf
        angle = (ot_dp >= 0.0) & (
            ot_dp * ot_dp
            >= COS_1DEG_SQ * (ohf * ohf + ovf * ovf)
            * (thf * thf + tvf * tvf)
        )

        shape = o["h"].shape
        row_g = (jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                 + t * tile_b - 1)
        col_g = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

        # Decouple division: the shared biased-low estimate + one-fixup
        # scheme (ops/adm_int.py:_div_q15_trunc — identical op sequence
        # in the XLA twin, one reciprocal, no correction divide).
        from pqa2_tpu.ops.adm_int import _div_q15_trunc as div_q15_trunc

        def icsf(band, f):
            # Fixed-point CSF (golden/adm_int.py:_icsf); |band| < 2^16 and
            # IRF < 2^15 keep the product inside int32.
            return (band * _I32(f)
                    + _I32(1 << (ADM_CSF_SHIFT - 1))) >> ADM_CSF_SHIFT

        bands = []
        for ob, tb, f in ((o["h"], td["h"], irf[0]),
                          (o["v"], td["v"], irf[1]),
                          (o["d"], td["d"], irf[2])):
            oa = jnp.abs(ob)
            ta = jnp.abs(tb)
            same_sign = (ob > 0) == (tb > 0)
            k = jnp.where(
                (oa > 0) & same_sign & (tb != 0),
                jnp.minimum(div_q15_trunc(ta, oa), 32768),
                0,
            )
            r = jnp.sign(ob) * ((k * oa + _I32(1 << 14)) >> 15)
            if float(gain_limit) == 1.0:
                gained = r
            else:
                gained = jnp.round(
                    r.astype(jnp.float32) * gain_limit).astype(_I32)
            r_flag = jnp.where(tb > 0, jnp.minimum(gained, tb),
                               jnp.where(tb < 0, jnp.maximum(gained, tb), tb))
            r = jnp.where(angle, r_flag, r)
            a = tb - r
            bands.append((icsf(ob, f), icsf(r, f), jnp.abs(icsf(a, f))))

        # -- fixed-point tail: trunc(S/30) threshold + digit cube sums ------
        abs_sum = bands[0][2] + bands[1][2] + bands[2][2]
        n_rows = shape[0]

        def shift_row(x, delta):
            y = pltpu.roll(x, (n_rows - delta) % n_rows, axis=0)
            if delta == 1:
                return jnp.where(row_g >= h2 - 1, x, y)
            return jnp.where(row_g <= 0, x, y)

        def shift_col(x, delta):
            y = pltpu.roll(x, (w2p - delta) % w2p, axis=1)
            if delta == 1:
                return jnp.where(col_g >= w2 - 1, x, y)
            return jnp.where(col_g <= 0, x, y)

        band3 = shift_row(abs_sum, -1) + abs_sum + shift_row(abs_sum, 1)
        ssum = (shift_col(band3, -1) + band3 + shift_col(band3, 1)
                + abs_sum)  # < 30 * 2^18 < 2^23: exact in f32
        # trunc(ssum / 30): biased-LOW f32 reciprocal estimate + ONE
        # conditional fixup (ssum < 2^23 is exact in f32 and the
        # reciprocal product's error is < 0.02 absolute, so -0.25 pins
        # floor to {q-1, q}) — Mosaic-safe, no integer division,
        # bit-identical to the oracle's // 30.
        q0 = jnp.floor(ssum.astype(jnp.float32) * jnp.float32(1.0 / 30.0)
                       - jnp.float32(0.25)).astype(_I32)
        rem = ssum - q0 * 30
        mt = q0 + (rem >= 30).astype(_I32)

        core = ((row_g >= t * tile_b) & (row_g < t * tile_b + tile_b)
                & (row_g >= trim_h) & (row_g < h2 - trim_h)
                & (col_g >= trim_w) & (col_g < w2 - trim_w))

        m16 = _I32(0xFFFF)

        def cube_digits(x):
            # Per-tile exact cube-sum digits (ops/adm_int.py:
            # _cube_digit_sums): v <= 2^14, v^3 split into 16-bit-aligned
            # columns, lane-summed, carry-folded per row, row-summed. Each
            # per-tile digit < rows * 2^16 < 2^22; the int32 accumulator
            # block then holds sums over every tile (< 2^22 * num_tiles).
            v = (x + _I32(1 << (d_shift - 1))) >> d_shift
            v = jnp.where(core, v, 0)
            c = v * v
            hi = (c >> 16) * v
            lo = (c & m16) * v
            s0 = jnp.sum(lo & m16, axis=1, keepdims=True)
            s1 = jnp.sum((lo >> 16) + (hi & m16), axis=1, keepdims=True)
            s2 = jnp.sum(hi >> 16, axis=1, keepdims=True)
            s1 = s1 + (s0 >> 16)
            s0 = s0 & m16
            s2 = s2 + (s1 >> 16)
            s1 = s1 & m16
            s3 = s2 >> 16
            s2 = s2 & m16
            return [jnp.sum(s3), jnp.sum(s2), jnp.sum(s1), jnp.sum(s0)]

        sums = []
        for icsf_o, icsf_r, _ in bands:
            masked = jnp.maximum(jnp.abs(icsf_r) - mt, 0)
            sums.extend(cube_digits(masked))
            sums.extend(cube_digits(jnp.abs(icsf_o)))

        r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        blk = jnp.zeros((8, 128), jnp.int32)
        for i, s in enumerate(sums):
            blk = blk + jnp.where((r8 == 0) & (c8 == i), s, 0)

        @pl.when(t == 0)
        def _():
            acc_ref[0] = blk

        @pl.when(t != 0)
        def _():
            acc_ref[0] = acc_ref[0] + blk

        if out_i16:
            # Levels <= 12-bit: |approx| <= Q4-input * db2-L1^2 < 2^14, so
            # the level-0 output (the ADM's single biggest HBM stream —
            # ~285 MB per 16-frame 4K batch in i32) stores as int16.
            a_ref_out[0] = o["a"][1 : 1 + tile_b, :].astype(jnp.int16)
            a_dist_out[0] = td["a"][1 : 1 + tile_b, :].astype(jnp.int16)
        else:
            a_ref_out[0] = o["a"][1 : 1 + tile_b, :]
            a_dist_out[0] = td["a"][1 : 1 + tile_b, :]

    return kernel, comp_rows


@functools.partial(jax.jit, static_argnames=(
    "level", "gain_limit", "tile_b", "interpret", "extra_row_shift",
    "in_split", "out_i16"))
def adm_int_level_pallas(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    level: int,
    gain_limit: float = 100.0,
    tile_b: int = DEFAULT_TILE_B,
    interpret: bool = False,
    extra_row_shift: int = 0,
    in_split: bool = False,
    out_i16: bool = False,
):
    """One integer ADM level. ref/dist: (N, H, W) int32 approx bands at
    Q(ADM_BAND_Q[level-1] or input Q). Returns (sums, a_ref, a_dist)."""
    n, h, w = ref.shape
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    tile_b = min(tile_b, h2)
    num_tiles = -(-h2 // tile_b)

    w2p = _round_up(w2 + 1, 128)
    wp = 2 * w2p
    comp_rows8 = _round_up(tile_b + 3, 8)
    comp_rows_total = (num_tiles - 1) * tile_b + comp_rows8
    rows_needed = 2 * comp_rows_total

    def components(x):
        x = x.astype(_I32)
        sym_b = min(h, max(rows_needed - 3 - h, 0))
        sym_r = min(w, max(wp - 1 - w, 0))
        x = jnp.pad(x, ((0, 0), (3, sym_b), (1, sym_r)), mode="symmetric")
        zh = rows_needed - x.shape[1]
        zw = wp - x.shape[2]
        if zh > 0 or zw > 0:
            x = jnp.pad(x, ((0, 0), (0, max(zh, 0)), (0, max(zw, 0))))
        x = x[:, :rows_needed, :wp]
        nn = x.shape[0]
        xe = x[:, ::2].reshape(nn, rows_needed // 2, wp // 2, 2)
        xo = x[:, 1::2].reshape(nn, rows_needed // 2, wp // 2, 2)
        return xe[..., 0], xe[..., 1], xo[..., 0], xo[..., 1]

    r_comps = components(ref)
    d_comps = components(dist)

    kernel, comp_rows = _make_int_kernel(
        tile_b, w2, w2p, h2, level, gain_limit, extra_row_shift, in_split,
        out_i16=out_i16)
    acc, a_ref, a_dist = pl.pallas_call(
        kernel,
        grid=(n, num_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
        out_specs=(
            pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, w2p), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, w2p), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((n, num_tiles * tile_b, w2p),
                                 jnp.int16 if out_i16 else _I32),
            jax.ShapeDtypeStruct((n, num_tiles * tile_b, w2p),
                                 jnp.int16 if out_i16 else _I32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, _round_up(comp_rows, 8), w2p), _I32),
            pltpu.SemaphoreType.DMA((2, 8)),
        ],
        interpret=interpret,
    )(*r_comps, *d_comps)

    from pqa2_tpu.ops.adm_int import normalize_digits4

    raw = acc[:, 0, :24].reshape(n, 3, 2, 4)
    digits = normalize_digits4(raw[..., 0], raw[..., 1], raw[..., 2],
                               raw[..., 3])
    return digits, a_ref[:, :h2, :w2], a_dist[:, :h2, :w2]


def adm_pooled_digit_sums_pallas(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    gain_limit: float = 100.0,
    interpret: bool = False,
    bit_depth: int = 8,
) -> jnp.ndarray:
    """(N, H, W) pair -> (N, NUM_LEVELS, 3, 2, 4) int32 pooled cube-sum
    digits via the fused level kernels — bit-identical to
    ops.adm_int.adm_pooled_digit_sums_batched and the int64 oracle."""
    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    from pqa2_tpu.ops.vif_int import to_native_grid

    # Native >8-bit grid: codes carry in_q fractional bits. Up to Q4 the
    # initial shift keeps level 0 at Q4 on the 8-bit scale; 13..16-bit
    # codes enter unshifted and level 0's vertical pass folds the surplus
    # into its rounding shift; depth 16 splits that pass's accumulator
    # (golden/adm_int.py:dwt_pyramid_int, ops/adm_int.py).
    ref_c, in_q = to_native_grid(ref, bit_depth)
    dist_c, _ = to_native_grid(dist, bit_depth)
    cur_r = ref_c.astype(_I32) << max(ADM_BAND_Q[0] - in_q, 0)
    cur_d = dist_c.astype(_I32) << max(ADM_BAND_Q[0] - in_q, 0)
    levels = []
    for lvl in range(NUM_LEVELS):
        if lvl:
            drop = ADM_BAND_Q[lvl - 1] - ADM_BAND_Q[lvl]
        else:
            drop = max(in_q - ADM_BAND_Q[0], 0)
        digits, cur_r, cur_d = adm_int_level_pallas(
            cur_r, cur_d, lvl, gain_limit=gain_limit, interpret=interpret,
            extra_row_shift=drop, in_split=in_q >= 8 and lvl == 0,
            # Level 0 carries the biggest approx stream; <= 12-bit inputs
            # (Q4 grid, < 2^12) bound it under 2^14 — int16-safe. Deeper
            # levels compound the db2 L1 gain (level-3 worst case passes
            # 2^16), and >= 13-bit codes enter unshifted — both keep i32.
            out_i16=lvl == 0 and in_q < 8,
        )
        levels.append(digits)
    return jnp.stack(levels, axis=1)


def adm_features_int_pallas(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    gain_limit: float = 100.0,
    interpret: bool = False,
    bit_depth: int = 8,
) -> jnp.ndarray:
    """(N, H, W) luma pair -> (N,) adm2 via the fused integer level kernels.

    Drop-in equivalent of ops.adm_int.adm_features_int_batched (the digit
    sums are bit-identical; the f32 combine is the shared code path)."""
    from pqa2_tpu.ops.adm_int import adm_from_digit_sums_batched

    h, w = ref.shape[-2], ref.shape[-1]
    digits = adm_pooled_digit_sums_pallas(
        ref, dist, gain_limit=gain_limit, interpret=interpret,
        bit_depth=bit_depth)
    return adm_from_digit_sums_batched(digits, h, w)
