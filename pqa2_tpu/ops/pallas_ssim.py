"""Fused SSIM(+PSNR) Pallas kernel (ffmpeg 8x8-block variant).

One pass per (frame, row-tile, lane-tile): the 4x4 integer block sums of
ref/dist/ref^2/dist^2/ref*dist, 2x2 grouping into overlapping 8x8 windows,
the SSIM window formula, the plane SSE (the PSNR statistic — free in the
same pass), and masked tile-partial sums. The jnp ops (ops/ssim.py,
ops/psnr.py) materialise the block-sum arrays in HBM and read the planes
twice; here each plane tile is read once and only (8, 128) accumulator
blocks are written.

Reference consumes these metrics from ffmpeg's ssim/psnr lavfi filters
(app/vmaf_analyzer.py:996-1092); constants/window semantics follow the
x264/ffmpeg 8x8 variant pinned by pqa2_tpu.golden.ssim.

Mosaic layout notes (same conventions as pallas_vif.py):
  * lane tiles of 512 px + one extra 128-lane group as the window halo;
  * 4x4 block sums via banded one-hot MXU dots (strided slices/lane
    reshapes don't lower; 0/1 matrices at HIGHEST precision are exact);
  * per-frame partials accumulate into an (8, 128) block revisited by
    every tile: lane 0 = SSIM window sum, lane 1 = SSE.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pqa2_tpu.golden.ssim import SSIM_C1, SSIM_C2

DEFAULT_TILE_B = 16  # block rows (x4 = 64 pixel rows) per tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(tile_b: int, tile_w: int, h: int, w: int,
                 n_window_rows: int, n_window_cols: int, num_tiles: int,
                 c1: float = float(SSIM_C1), c2: float = float(SSIM_C2)):
    rows = tile_b * 4 + 4     # one halo block row for the 2x2 grouping
    rows8 = _round_up(rows, 8)
    twp = tile_w + 128        # one halo lane group for the 2x2 grouping
    nb_r = tile_b + 1         # block rows computed per tile
    # Block cols computed per tile: tile_w//4 valid + halo, lifted to a
    # 128-multiple so the lane layout (and rolls) stay aligned.
    nb_c = tile_w // 4 + 128

    def kernel(ref_hbm, dist_hbm, acc_ref, vmem, sem):
        n = pl.program_id(0)
        t = pl.program_id(1)
        j = pl.program_id(2)
        nn = pl.num_programs(0)
        nt = pl.num_programs(1)
        nj = pl.num_programs(2)

        # Double-buffered input pipeline (same shape as ops/pallas_vif.py):
        # wait on the tiles the previous step prefetched into this slot,
        # start the next step's DMAs into the other slot, so HBM reads
        # overlap compute instead of serialising at the top of every step.
        def start_copies(slot, ni, ti, ji):
            for k_s, src_hbm in enumerate((ref_hbm, dist_hbm)):
                pltpu.make_async_copy(
                    src_hbm.at[ni, pl.ds(ti * tile_b * 4, rows8),
                               pl.ds(ji * tile_w, twp)],
                    vmem.at[slot, k_s, pl.ds(0, rows8), :],
                    sem.at[slot, k_s],
                ).start()

        def wait_copies(slot):
            for k_s in range(2):
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

        # Banded one-hot block-sum matrices (0/1 entries -> the HIGHEST-
        # precision f32 dot is exact). Built from iota, no extra DMA.
        ar = jax.lax.broadcasted_iota(jnp.int32, (nb_r, rows), 0)
        ac = jax.lax.broadcasted_iota(jnp.int32, (nb_r, rows), 1)
        rowsum = ((ac >= 4 * ar) & (ac < 4 * ar + 4)).astype(jnp.float32)
        br = jax.lax.broadcasted_iota(jnp.int32, (twp, nb_c), 0)
        bc = jax.lax.broadcasted_iota(jnp.int32, (twp, nb_c), 1)
        colsum = ((br >= 4 * bc) & (br < 4 * bc + 4)).astype(jnp.float32)

        def block_sums(x):  # (rows, twp) -> (nb_r, nb_c)
            x = jax.lax.dot(rowsum, x, precision=jax.lax.Precision.HIGHEST)
            return jax.lax.dot(x, colsum, precision=jax.lax.Precision.HIGHEST)

        s1 = block_sums(r)
        s2 = block_sums(d)
        ss = block_sums(r * r) + block_sums(d * d)
        s12 = block_sums(r * d)

        def group(a):  # 2x2 block grouping; row/col +1 via slice/roll
            below = jnp.concatenate([a[1:], a[-1:]], axis=0)
            right = pltpu.roll(a, nb_c - 1, axis=1)
            right_below = pltpu.roll(below, nb_c - 1, axis=1)
            return a + right + below + right_below

        fs1, fs2, fss, fs12 = group(s1), group(s2), group(ss), group(s12)
        vars_ = fss * 64.0 - fs1 * fs1 - fs2 * fs2
        covar = fs12 * 64.0 - fs1 * fs2
        num = (2.0 * fs1 * fs2 + c1) * (2.0 * covar + c2)
        den = (fs1 * fs1 + fs2 * fs2 + c1) * (vars_ + c2)
        val = num / den

        row_ids = jax.lax.broadcasted_iota(jnp.int32, val.shape, 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, val.shape, 1)
        valid = (
            (row_ids < tile_b)
            & (row_ids + t * tile_b < n_window_rows)
            & (col_ids < tile_w // 4)
            & (col_ids + j * (tile_w // 4) < n_window_cols)
        )
        ssim_sum = jnp.sum(jnp.where(valid, val, 0.0))

        # SSE over the true (h, w) plane extent — the PSNR statistic.
        diff = r - d
        pr = jax.lax.broadcasted_iota(jnp.int32, diff.shape, 0)
        pc = jax.lax.broadcasted_iota(jnp.int32, diff.shape, 1)
        # Core rows only (halo rows belong to the next tile) — except the
        # last tile, whose halo holds the h%4 remainder rows.
        row_ok = (pr < tile_b * 4) | (t == num_tiles - 1)
        pvalid = (
            row_ok
            & (pr + t * tile_b * 4 < h)
            & (pc < tile_w)
            & (pc + j * tile_w < w)
        )
        sse = jnp.sum(jnp.where(pvalid, diff * diff, 0.0))

        r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        blk = jnp.where(
            (r8 == 0) & (c8 == 0), ssim_sum,
            jnp.where((r8 == 0) & (c8 == 1), sse, 0.0),
        )

        first = (t == 0) & (j == 0)

        @pl.when(first)
        def _():
            acc_ref[0] = blk

        @pl.when(jnp.logical_not(first))
        def _():
            acc_ref[0] = acc_ref[0] + blk

    return kernel, rows


@functools.partial(jax.jit,
                   static_argnames=("tile_b", "interpret", "bit_depth"))
def ssim_sse_pallas(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    tile_b: int = DEFAULT_TILE_B,
    interpret: bool = False,
    bit_depth: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, H, W) plane pair -> ((N,) ffmpeg-variant SSIM, (N,) SSE).

    Inputs on the pipeline's 8-bit scale; ``bit_depth`` selects ffmpeg's
    native-max constants (ops/ssim.py:scaled_ssim_constants)."""
    from pqa2_tpu.ops.ssim import scaled_ssim_constants

    c1, c2 = scaled_ssim_constants(bit_depth)
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    n, h, w = ref.shape
    h4, w4 = h // 4, w // 4
    n_window_rows = h4 - 1
    n_window_cols = w4 - 1

    tile_b = max(min(tile_b, _round_up(h4, 2) // 2 * 2), 2)
    num_tiles = -(-max(h4, 1) // tile_b)
    tile_w = min(512, _round_up(w, 512))
    num_w_tiles = -(-w // tile_w)
    wpad = num_w_tiles * tile_w + 128

    rows8 = _round_up(tile_b * 4 + 4, 8)
    lift_rows = (num_tiles - 1) * tile_b * 4 + rows8 - h

    def prep(x):
        x = x.astype(jnp.float32)
        return jnp.pad(x, ((0, 0), (0, max(lift_rows, 0)), (0, wpad - w)))

    ref_p = prep(ref)
    dist_p = prep(dist)

    kernel, rows = _make_kernel(tile_b, tile_w, h, w,
                                n_window_rows, n_window_cols, num_tiles,
                                c1=c1, c2=c2)
    acc = pl.pallas_call(
        kernel,
        grid=(n, num_tiles, num_w_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, j, k2: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 2, _round_up(rows, 8), tile_w + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(ref_p, dist_p)

    n_windows = max(n_window_rows * n_window_cols, 1)
    return acc[:, 0, 0] / n_windows, acc[:, 0, 1]


def ssim_plane_pallas(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    tile_b: int = DEFAULT_TILE_B,
    interpret: bool = False,
    bit_depth: int = 8,
) -> jnp.ndarray:
    """(N, H, W) plane pair -> (N,) SSIM (drop-in for ssim_plane_batched)."""
    return ssim_sse_pallas(ref, dist, tile_b=tile_b, interpret=interpret,
                           bit_depth=bit_depth)[0]
