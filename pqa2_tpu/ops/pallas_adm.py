"""Fused ADM2 Pallas kernel (one DWT level per pass).

Per level, for a band-row tile resident in VMEM: the db2 DWT of ref and
dist, decoupling into restoration/additive, Watson-CSF weighting, the 3x3
contrast-masking threshold, per-band cube sums of the masked restoration
(numerator) and CSF'd reference bands (denominator), plus the next-level
approximation bands written back to HBM.

The jnp op (ops/adm.py) materialises ~25 band-sized arrays in HBM per
level; here the HBM traffic is the polyphase tile reads, the two a-band
writes and one small accumulator.

Mosaic strategy — no lane-dimension reshapes or arbitrary-offset slices:
  * the host splits each (padded) input into its four polyphase components
    (even/odd rows x even/odd cols) via a single-axis stride + pair-reshape
    (a double-strided slice lowers to a ~8x slower gather). In-kernel the
    DWT then only needs unit-offset sublane slices (rows l, l+1) and
    single-lane rolls (cols j, j+1):
        band(g, j) = sum_ab taps[a] taps[b] x_sym[2g-1+a, 2j-1+b]
    with row tap a -> component row parity a&1, offset g + 1 + (a>>1),
    col tap b -> component col parity b&1, offset j + (b>>1);
  * one halo band row each side feeds the 3x3 threshold; global band edges
    duplicate the edge row (the oracle pads the *band* symmetrically);
  * cube-sum border trims, width crop and the H2 lift are iota masks;
  * six partial sums (num/den x h/v/d) accumulate into an (8, 128) block
    revisited by every row tile.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pqa2_tpu.golden.adm import BORDER_FACTOR, COS_1DEG_SQ, NUM_LEVELS, csf_rfactors
from pqa2_tpu.golden.filters import DB2_HI, DB2_LO

DEFAULT_TILE_B = 32  # band rows per tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _trim(w: int) -> int:
    return max(int(w * BORDER_FACTOR - 0.5), 0)


def _make_kernel(tile_b: int, w2: int, w2p: int, h2: int, level: int,
                 gain_limit: float):
    lo = [float(c) for c in DB2_LO]
    hi = [float(c) for c in DB2_HI]
    nb = tile_b + 2       # band rows computed per tile (core + 1 halo each side)
    comp_rows = nb + 1    # polyphase component rows needed
    comp_rows8 = _round_up(comp_rows, 8)  # Mosaic: 8-aligned DMA extents
    fh, fv, fd = csf_rfactors(level)
    trim_h = _trim(h2)
    trim_w = _trim(w2)

    def kernel(ree, reo, roe, roo, dee, deo, doe, doo,
               acc_ref, a_ref_out, a_dist_out, vmem, sem):
        t = pl.program_id(1)
        n = pl.program_id(0)

        comps = (ree, reo, roe, roo, dee, deo, doe, doo)
        for idx in range(8):
            cp = pltpu.make_async_copy(
                comps[idx].at[n, pl.ds(t * tile_b, comp_rows8), :],
                vmem.at[idx, pl.ds(0, comp_rows8), :],
                sem.at[idx],
            )
            cp.start()
        for idx in range(8):
            pltpu.make_async_copy(
                comps[idx].at[n, pl.ds(t * tile_b, comp_rows8), :],
                vmem.at[idx, pl.ds(0, comp_rows8), :],
                sem.at[idx],
            ).wait()

        def dwt2(base):
            """Polyphase components base..base+3 -> bands (nb, w2p)."""
            ee = vmem[base + 0, :comp_rows, :]
            eo = vmem[base + 1, :comp_rows, :]
            oe = vmem[base + 2, :comp_rows, :]
            oo = vmem[base + 3, :comp_rows, :]

            def col_pass(taps):
                # Row taps: a=0 -> even row l, a=1 -> odd row l,
                #           a=2 -> even row l+1, a=3 -> odd row l+1.
                e_lo = taps[0] * ee[:nb] + taps[2] * ee[1 : nb + 1]
                o_lo = taps[1] * oe[:nb] + taps[3] * oe[1 : nb + 1]
                e_hi = taps[0] * eo[:nb] + taps[2] * eo[1 : nb + 1]
                o_hi = taps[1] * oo[:nb] + taps[3] * oo[1 : nb + 1]
                return e_lo + o_lo, e_hi + o_hi  # (even-col, odd-col) planes

            lo_e, lo_o = col_pass(lo)
            hi_e, hi_o = col_pass(hi)

            def row_pass(pe, po, taps):
                # Col taps: b=0 -> even col j, b=1 -> odd col j,
                #           b=2 -> even col j+1, b=3 -> odd col j+1 (rolls).
                pe1 = pltpu.roll(pe, w2p - 1, axis=1)
                po1 = pltpu.roll(po, w2p - 1, axis=1)
                return (taps[0] * pe + taps[1] * po
                        + taps[2] * pe1 + taps[3] * po1)

            return {
                "a": row_pass(lo_e, lo_o, lo),
                "v": row_pass(lo_e, lo_o, hi),
                "h": row_pass(hi_e, hi_o, lo),
                "d": row_pass(hi_e, hi_o, hi),
            }

        o = dwt2(0)
        td = dwt2(4)

        # -- decouple (golden/adm.py:decouple) on all nb band rows ----------
        oh, ov, od_b = o["h"], o["v"], o["d"]
        th, tv, td_b = td["h"], td["v"], td["d"]
        ot_dp = oh * th + ov * tv
        o_mag = oh * oh + ov * ov
        t_mag = th * th + tv * tv
        angle = (ot_dp >= 0.0) & (ot_dp * ot_dp >= COS_1DEG_SQ * o_mag * t_mag)

        shape = oh.shape
        row_g = (jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                 + t * tile_b - 1)  # global band row of each local row
        col_g = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

        def decouple(ob, tb):
            kk = jnp.where(ob != 0.0, tb / jnp.where(ob != 0.0, ob, 1.0), 0.0)
            kk = jnp.clip(kk, 0.0, 1.0)
            r = kk * ob
            gained = r * gain_limit
            r_flag = jnp.where(tb > 0.0, jnp.minimum(gained, tb),
                               jnp.where(tb < 0.0, jnp.maximum(gained, tb), tb))
            return jnp.where(angle, r_flag, r)

        bands = []
        for ob, tb, f in ((oh, th, fh), (ov, tv, fv), (od_b, td_b, fd)):
            r = decouple(ob, tb)
            a = tb - r
            bands.append((ob * f, r * f, jnp.abs(a) * f))  # csf_o, csf_r, |csf_a|

        # -- contrast-masking threshold (3x3 sum, centre doubled, /30) ------
        abs_sum = bands[0][2] + bands[1][2] + bands[2][2]
        n_rows = shape[0]

        def shift_row(x, delta):  # x[l] <- x[l+delta] with global-edge clamp
            y = pltpu.roll(x, (n_rows - delta) % n_rows, axis=0)
            if delta == 1:  # row l+1; invalid when global row == h2-1
                return jnp.where(row_g >= h2 - 1, x, y)
            return jnp.where(row_g <= 0, x, y)

        def shift_col(x, delta):
            y = pltpu.roll(x, (w2p - delta) % w2p, axis=1)
            if delta == 1:
                return jnp.where(col_g >= w2 - 1, x, y)
            return jnp.where(col_g <= 0, x, y)

        band3 = shift_row(abs_sum, -1) + abs_sum + shift_row(abs_sum, 1)
        mt = (shift_col(band3, -1) + band3 + shift_col(band3, 1)
              + abs_sum) / 30.0  # centre counted twice

        # -- cube sums over the central region of core rows -----------------
        core = ((row_g >= t * tile_b) & (row_g < t * tile_b + tile_b)
                & (row_g >= trim_h) & (row_g < h2 - trim_h)
                & (col_g >= trim_w) & (col_g < w2 - trim_w))

        sums = []
        for csf_o, csf_r, _ in bands:
            masked = jnp.maximum(jnp.abs(csf_r) - mt, 0.0)
            sums.append(jnp.sum(jnp.where(core, masked ** 3, 0.0)))  # num
            sums.append(jnp.sum(jnp.where(core, jnp.abs(csf_o) ** 3, 0.0)))

        r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        blk = jnp.zeros((8, 128), jnp.float32)
        for i, s in enumerate(sums):
            blk = blk + jnp.where((r8 == 0) & (c8 == i), s, 0.0)

        @pl.when(t == 0)
        def _():
            acc_ref[0] = blk

        @pl.when(t != 0)
        def _():
            acc_ref[0] = acc_ref[0] + blk

        # -- next-level approximation bands (core rows only) ----------------
        a_ref_out[0] = o["a"][1 : 1 + tile_b, :]
        a_dist_out[0] = td["a"][1 : 1 + tile_b, :]

    return kernel, comp_rows


@functools.partial(jax.jit, static_argnames=("level", "gain_limit", "tile_b",
                                             "interpret"))
def adm_level_pallas(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    level: int,
    gain_limit: float = 100.0,
    tile_b: int = DEFAULT_TILE_B,
    interpret: bool = False,
):
    """One ADM level. ref/dist: (N, H, W) approx bands entering the level.

    Returns (sums, a_ref, a_dist): sums (N, 6) per-band cube totals in the
    order [num_h, den_h, num_v, den_v, num_d, den_d]; a_* are the (N, H2, W2)
    next-level inputs.
    """
    n, h, w = ref.shape
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    tile_b = min(tile_b, h2)
    num_tiles = -(-h2 // tile_b)

    # Strictly more than w2 lanes (roll wraps junk into the masked tail).
    w2p = _round_up(w2 + 1, 128)
    wp = 2 * w2p
    # Component rows needed: band rows -1..T*bt, +1 for the (a>>1) offset,
    # lifted so the last tile's 8-aligned DMA extent stays in bounds.
    comp_rows8 = _round_up(tile_b + 3, 8)
    comp_rows_total = (num_tiles - 1) * tile_b + comp_rows8
    rows_needed = 2 * comp_rows_total

    def components(x):
        """Padded polyphase split: band(g,j) taps read component rows g+1,
        g+2 and cols j, j+1 (see module docstring)."""
        x = x.astype(jnp.float32)
        # X[r, c] = x_sym[r - 2, c - 1]: row tap a=0 reads x_sym[2g-1]
        # = X[2g+1] = odd component row g... chosen so component row offset
        # for band row g is g+0/g+1 with parity (a+1)&1. To keep the kernel
        # mapping (even row first), pad rows by 3 like the derivation:
        # X[r] = x_sym[r - 3] -> x_sym[2g-1+a] = X[2(g+1)+a].
        sym_b = min(h, max(rows_needed - 3 - h, 0))
        sym_r = min(w, max(wp - 1 - w, 0))
        x = jnp.pad(x, ((0, 0), (3, sym_b), (1, sym_r)), mode="symmetric")
        zh = rows_needed - x.shape[1]
        zw = wp - x.shape[2]
        if zh > 0 or zw > 0:
            x = jnp.pad(x, ((0, 0), (0, max(zh, 0)), (0, max(zw, 0))))
        x = x[:, :rows_needed, :wp]
        # Row tap a for band row g reads X[2(g+1)+a]; with components
        # E[i]=X[2i], O[i]=X[2i+1]: a=0 -> E[g+1], a=1 -> O[g+1],
        # a=2 -> E[g+2], a=3 -> O[g+2]. The kernel indexes component row
        # l = g - (t*tile_b - 1), so shift by one tile-local row: slice the
        # components starting at row 1 relative to band row -1 of tile 0,
        # i.e. E/O row (g+1) for g = t*tile_b - 1 + l equals row
        # t*tile_b + l of E/O.
        # Single-axis stride + pair-reshape; the double-strided form
        # x[:, ::2, ::2] lowers to a slow gather on TPU (~8x this form).
        nn = x.shape[0]
        xe = x[:, ::2].reshape(nn, rows_needed // 2, wp // 2, 2)
        xo = x[:, 1::2].reshape(nn, rows_needed // 2, wp // 2, 2)
        return xe[..., 0], xe[..., 1], xo[..., 0], xo[..., 1]

    r_comps = components(ref)
    d_comps = components(dist)

    kernel, comp_rows = _make_kernel(tile_b, w2, w2p, h2, level, gain_limit)
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
            jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, num_tiles * tile_b, w2p), jnp.float32),
            jax.ShapeDtypeStruct((n, num_tiles * tile_b, w2p), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, _round_up(comp_rows, 8), w2p), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
    )(*r_comps, *d_comps)

    sums = acc[:, 0, :6]
    return sums, a_ref[:, :h2, :w2], a_dist[:, :h2, :w2]


def adm_features_pallas(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    gain_limit: float = 100.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, H, W) luma pair -> (N,) adm2 via the fused level kernels.

    Drop-in equivalent of ops.adm.adm_features_batched."""
    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    h, w = ref.shape[-2], ref.shape[-1]
    cur_r = ref.astype(jnp.float32)
    cur_d = dist.astype(jnp.float32)
    num = 0.0
    den = 0.0
    for lvl in range(NUM_LEVELS):
        h2, w2 = (cur_r.shape[1] + 1) // 2, (cur_r.shape[2] + 1) // 2
        sums, cur_r, cur_d = adm_level_pallas(
            cur_r, cur_d, lvl, gain_limit=gain_limit, interpret=interpret
        )
        # Per-band cbrt + stabiliser (golden/adm.py:sum_cube).
        th, tw = _trim(h2), _trim(w2)
        n_core = (h2 - 2 * th) * (w2 - 2 * tw)
        stab = float(n_core / 32.0) ** (1.0 / 3.0)
        for b in range(3):
            num = num + jnp.cbrt(sums[:, 2 * b]) + stab
            den = den + jnp.cbrt(sums[:, 2 * b + 1]) + stab
    eps = 1e-10 * (w * h) / (1920.0 * 1080.0)
    return (num + eps) / (den + eps)
