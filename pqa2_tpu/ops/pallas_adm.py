"""Fused ADM2 Pallas kernel (one DWT level per pass).

Per level, for a band-row tile resident in VMEM: the db2 DWT of ref and
dist pixel tiles (column pass via even/odd row split, row pass via even/odd
column split), decoupling into restoration/additive, Watson-CSF weighting,
the 3x3 contrast-masking threshold, per-band cube sums of the masked
restoration (numerator) and CSF'd reference bands (denominator), plus the
next-level approximation bands written back to HBM.

The jnp op (ops/adm.py) materialises ~25 band-sized arrays in HBM per
level; here the only HBM traffic is the two pixel-tile reads, the two
a-band writes and one small accumulator.

Layout notes (same Mosaic conventions as pallas_vif.py):
  * pixel inputs pre-padded: 3 symmetric rows on top, symmetric + zero
    lift at the bottom so every tile DMA is contiguous; 1 symmetric column
    left, then lifted to a multiple of 256 (so band width W2p = Wp/2 is a
    multiple of 128);
  * the 3x3 threshold needs one halo band row on each side: each tile
    computes bt+2 band rows and keeps the middle bt; global band edges
    duplicate the edge row (the oracle pads the *band* symmetrically,
    which pixel-domain extension would not reproduce);
  * cube-sum border trims and the H2 lift are applied as iota masks;
  * six partial sums (num/den x h/v/d) accumulate into an (8, 128) block.
"""

from __future__ import annotations

import functools
from typing import Tuple

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
    rows_in = 2 * tile_b + 6  # pixel rows per tile (covers bt+2 band rows)
    fh, fv, fd = csf_rfactors(level)
    trim_h = _trim(h2)
    trim_w = _trim(w2)

    def kernel(ref_hbm, dist_hbm, acc_ref, a_ref_out, a_dist_out, vmem, sem):
        n = pl.program_id(0)
        t = pl.program_id(1)

        rt = vmem.at[0, pl.ds(0, rows_in), :]
        dt = vmem.at[1, pl.ds(0, rows_in), :]
        cp1 = pltpu.make_async_copy(
            ref_hbm.at[n, pl.ds(t * 2 * tile_b, rows_in), :], rt, sem.at[0]
        )
        cp2 = pltpu.make_async_copy(
            dist_hbm.at[n, pl.ds(t * 2 * tile_b, rows_in), :], dt, sem.at[1]
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

        def dwt2(x):
            """Pixel tile (rows_in, 2*w2p) -> bands (tile_b+2, w2p)."""
            # Column (H) pass via even/odd row split: band row l uses pixel
            # rows 2l..2l+3 of the tile.
            xr = x.reshape(rows_in // 2, 2, 2 * w2p)
            even = xr[:, 0, :]  # pixel rows 0,2,4,... -> (rows_in/2, 2*w2p)
            odd = xr[:, 1, :]
            nb = tile_b + 2

            def col_pass(taps):
                return (taps[0] * even[:nb] + taps[1] * odd[:nb]
                        + taps[2] * even[1 : nb + 1] + taps[3] * odd[1 : nb + 1])

            lo_r = col_pass(lo)
            hi_r = col_pass(hi)

            # Row (W) pass via even/odd column split: band col j uses pixel
            # cols 2j..2j+3.
            def row_pass(y, taps):
                yr = y.reshape(nb, w2p, 2)
                ev = yr[:, :, 0]
                od = yr[:, :, 1]
                # ev[:, j+1] / od[:, j+1]: negative shifts are unsupported,
                # so roll by dim-1 (junk wraps into the last, masked, col).
                ev1 = pltpu.roll(ev, w2p - 1, axis=1)
                od1 = pltpu.roll(od, w2p - 1, axis=1)
                return taps[0] * ev + taps[1] * od + taps[2] * ev1 + taps[3] * od1

            return {
                "a": row_pass(lo_r, lo),
                "v": row_pass(lo_r, hi),
                "h": row_pass(hi_r, lo),
                "d": row_pass(hi_r, hi),
            }

        o = dwt2(vmem[0, :rows_in, :])
        td = dwt2(vmem[1, :rows_in, :])

        # -- decouple (golden/adm.py:decouple) on all bt+2 band rows --------
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
        # Build the 3-band |csf_a| total, then sum a 3x3 neighbourhood with
        # band-edge duplication via rolls + edge masks.
        abs_sum = bands[0][2] + bands[1][2] + bands[2][2]

        n_rows = oh.shape[0]

        def shift_row(x, delta):  # x[l] <- x[l+delta] with global-edge clamp
            y = pltpu.roll(x, (n_rows - delta) % n_rows, axis=0)
            if delta == 1:  # row l+1; invalid when global row == h2-1
                return jnp.where(row_g >= h2 - 1, x, y)
            # delta == -1 -> row l-1; invalid when global row == 0
            return jnp.where(row_g <= 0, x, y)

        def shift_col(x, delta):
            y = pltpu.roll(x, (w2p - delta) % w2p, axis=1)
            if delta == 1:
                return jnp.where(col_g >= w2 - 1, x, y)
            return jnp.where(col_g <= 0, x, y)

        up = shift_row(abs_sum, -1)
        down = shift_row(abs_sum, 1)
        band3 = up + abs_sum + down  # vertical 3-sum with edge clamp
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
            ao = jnp.abs(csf_o)
            sums.append(jnp.sum(jnp.where(core, ao ** 3, 0.0)))  # den

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

    return kernel, rows_in


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

    # Strictly more than w2 lanes: band col w2-1 reads ev/od[w2] via roll,
    # which would wrap junk if w2 == w2p.
    w2p = _round_up(w2 + 1, 128)
    wp = 2 * w2p  # padded pixel width
    rows_needed = 2 * (num_tiles * tile_b) + 6

    def pad(x):
        x = x.astype(jnp.float32)
        # H: 3 symmetric on top (covers band row -1), symmetric tail + zero
        # lift; W: 1 symmetric left, symmetric + zero lift to wp.
        sym_bottom = min(h, max(rows_needed - 3 - h, 0))
        sym_right = min(w, max(wp - 1 - w, 0))
        x = jnp.pad(x, ((0, 0), (3, sym_bottom), (1, sym_right)),
                    mode="symmetric")
        zh = rows_needed - x.shape[1]
        zw = wp - x.shape[2]
        if zh > 0 or zw > 0:
            x = jnp.pad(x, ((0, 0), (0, max(zh, 0)), (0, max(zw, 0))))
        return x[:, :rows_needed, :wp]

    ref_p = pad(ref)
    dist_p = pad(dist)

    kernel, rows_in = _make_kernel(tile_b, w2, w2p, h2, level, gain_limit)
    acc, a_ref, a_dist = pl.pallas_call(
        kernel,
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
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
            pltpu.VMEM((2, _round_up(rows_in, 8), wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ref_p, dist_p)

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
