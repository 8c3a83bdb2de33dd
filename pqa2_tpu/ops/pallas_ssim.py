"""Fused SSIM Pallas kernel (ffmpeg 8x8-block variant).

One pass per row-tile: 4x4 integer block sums for ref/dist/ref^2/dist^2/
ref*dist, 2x2 block grouping into overlapping 8x8 windows, the SSIM window
formula, and a tile-partial sum — all in VMEM. The jnp op (ops/ssim.py)
materialises four block-sum arrays in HBM between stages.

Mosaic layout (same conventions as pallas_vif.py): per-frame partials
accumulate into an (8, 128) VMEM block revisited by every row tile
(zero-initialised at t == 0); width is lifted to a 512-pixel multiple so
4x4 block columns stay 128-aligned; out-of-range windows (width crop, the
zero-lift tail, the last window row) are masked via iota tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pqa2_tpu.golden.ssim import SSIM_C1, SSIM_C2

DEFAULT_TILE_BLOCKS = 32  # block rows (x4 = pixel rows) per tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(tile_b: int, w4: int, w4p: int, n_window_rows: int,
                 n_window_cols: int):
    rows = (tile_b + 1) * 4
    rows8 = _round_up(rows, 8)  # Mosaic: DMA sublane extents must be 8-aligned

    def kernel(ref_hbm, dist_hbm, acc_ref, vmem, sem):
        n = pl.program_id(0)
        t = pl.program_id(1)

        rt = vmem.at[0, pl.ds(0, rows8), :]
        dt = vmem.at[1, pl.ds(0, rows8), :]
        cp1 = pltpu.make_async_copy(
            ref_hbm.at[n, pl.ds(t * tile_b * 4, rows8), :], rt, sem.at[0]
        )
        cp2 = pltpu.make_async_copy(
            dist_hbm.at[n, pl.ds(t * tile_b * 4, rows8), :], dt, sem.at[1]
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

        r = vmem[0, :rows, :]
        d = vmem[1, :rows, :]

        def block_sums(x):  # (rows, w4p*4) -> (tile_b+1, w4p)
            xr = x.reshape(rows, w4p, 4)
            cols = xr[:, :, 0] + xr[:, :, 1] + xr[:, :, 2] + xr[:, :, 3]
            cr = cols.reshape(rows // 4, 4, w4p)
            return cr[:, 0] + cr[:, 1] + cr[:, 2] + cr[:, 3]

        s1 = block_sums(r)
        s2 = block_sums(d)
        ss = block_sums(r * r) + block_sums(d * d)
        s12 = block_sums(r * d)

        def group(a):  # (tile_b+1, w4p) -> (tile_b, w4p); col j+1 via roll
            below = a[1:, :]
            cur = a[:-1, :]
            right_cur = pltpu.roll(cur, w4p - 1, axis=1)
            right_below = pltpu.roll(below, w4p - 1, axis=1)
            return cur + right_cur + below + right_below

        fs1, fs2, fss, fs12 = group(s1), group(s2), group(ss), group(s12)
        vars_ = fss * 64.0 - fs1 * fs1 - fs2 * fs2
        covar = fs12 * 64.0 - fs1 * fs2
        num = (2.0 * fs1 * fs2 + SSIM_C1) * (2.0 * covar + SSIM_C2)
        den = (fs1 * fs1 + fs2 * fs2 + SSIM_C1) * (vars_ + SSIM_C2)
        val = num / den

        row_ids = jax.lax.broadcasted_iota(jnp.int32, val.shape, 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, val.shape, 1)
        valid = ((row_ids + t * tile_b < n_window_rows)
                 & (col_ids < n_window_cols))
        tile_sum = jnp.sum(jnp.where(valid, val, 0.0))

        r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        blk = jnp.where((r8 == 0) & (c8 == 0), tile_sum, 0.0)

        @pl.when(t == 0)
        def _():
            acc_ref[0] = blk

        @pl.when(t != 0)
        def _():
            acc_ref[0] = acc_ref[0] + blk

    return kernel, rows


@functools.partial(
    jax.jit, static_argnames=("tile_b", "interpret")
)
def ssim_plane_pallas(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    tile_b: int = DEFAULT_TILE_BLOCKS,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, H, W) plane pair -> (N,) ffmpeg-variant SSIM via the fused kernel."""
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    n, h, w = ref.shape
    h4, w4 = h // 4, w // 4
    n_window_rows = h4 - 1
    n_window_cols = w4 - 1
    tile_b = min(tile_b, h4)
    num_tiles = -(-h4 // tile_b)

    # Strictly more block cols than w4 (roll wraps into a masked column).
    w4p = _round_up(w4 + 1, 128)
    # Bottom lift covers the grouping halo block row AND the 8-aligned DMA
    # extent of the last tile.
    rows8 = _round_up((tile_b + 1) * 4, 8)
    lift_rows = (num_tiles - 1) * tile_b * 4 + rows8 - h4 * 4

    def prep(x):
        x = x.astype(jnp.float32)[:, : h4 * 4, : w4 * 4]
        return jnp.pad(x, ((0, 0), (0, max(lift_rows, 0)), (0, (w4p - w4) * 4)))

    ref_p = prep(ref)
    dist_p = prep(dist)

    kernel, rows = _make_kernel(tile_b, w4, w4p, n_window_rows, n_window_cols)
    acc = pl.pallas_call(
        kernel,
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, _round_up(rows, 8), w4p * 4), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ref_p, dist_p)

    n_windows = n_window_rows * n_window_cols
    return acc[:, 0, 0] / n_windows
