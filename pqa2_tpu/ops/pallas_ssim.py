"""Fused SSIM Pallas kernel (ffmpeg 8x8-block variant).

One pass per row-tile: 4x4 integer block sums for ref/dist/ref^2/dist^2/
ref*dist, 2x2 block grouping into overlapping 8x8 windows, the SSIM window
formula, and a tile-partial sum — all in VMEM. The jnp op (ops/ssim.py)
materialises four block-sum arrays in HBM between stages.

Tiling: grid (N, T) over block-row groups. A tile owning block rows
[t*bt, t*bt + bt) needs one extra block row below for the 2x2 grouping, so
the DMA reads (bt+1)*4 pixel rows; the frame is pre-padded by one zero
block row and the out-of-range windows masked off via an iota test against
the true window-row count.
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


def _make_kernel(tile_b: int, w4: int, n_window_rows: int):
    rows = (tile_b + 1) * 4

    def kernel(ref_hbm, dist_hbm, sum_ref, vmem, sem):
        n = pl.program_id(0)
        t = pl.program_id(1)

        ref_tile = vmem.at[0]
        dist_tile = vmem.at[1]
        cp1 = pltpu.make_async_copy(
            ref_hbm.at[n, pl.ds(t * tile_b * 4, rows), :], ref_tile, sem.at[0]
        )
        cp2 = pltpu.make_async_copy(
            dist_hbm.at[n, pl.ds(t * tile_b * 4, rows), :], dist_tile, sem.at[1]
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

        r = ref_tile[:]
        d = dist_tile[:]

        def block_sums(x):  # ((tile_b+1)*4, w4*4) -> (tile_b+1, w4)
            cols = None
            for j in range(4):
                term = x[:, j::4]
                cols = term if cols is None else cols + term
            out = None
            for i in range(4):
                term = cols[i::4, :]
                out = term if out is None else out + term
            return out

        s1 = block_sums(r)
        s2 = block_sums(d)
        ss = block_sums(r * r) + block_sums(d * d)
        s12 = block_sums(r * d)

        def group(a):  # (tile_b+1, w4) -> (tile_b, w4-1)
            return (a[:-1, :-1] + a[:-1, 1:] + a[1:, :-1] + a[1:, 1:])

        fs1, fs2, fss, fs12 = group(s1), group(s2), group(ss), group(s12)
        vars_ = fss * 64.0 - fs1 * fs1 - fs2 * fs2
        covar = fs12 * 64.0 - fs1 * fs2
        num = (2.0 * fs1 * fs2 + SSIM_C1) * (2.0 * covar + SSIM_C2)
        den = (fs1 * fs1 + fs2 * fs2 + SSIM_C1) * (vars_ + SSIM_C2)
        val = num / den

        # Mask window rows beyond the true frame (zero-padded tail tile).
        row_ids = jax.lax.broadcasted_iota(jnp.int32, val.shape, 0)
        valid = row_ids + t * tile_b < n_window_rows
        sum_ref[0, 0] = jnp.sum(jnp.where(valid, val, 0.0))

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
    tile_b = min(tile_b, h4)
    num_tiles = -(-h4 // tile_b)

    # Crop to block multiples, pad one zero block row + tail-tile lift.
    lift = num_tiles * tile_b + 1 - h4  # extra block rows needed at bottom
    def prep(x):
        x = x.astype(jnp.float32)[:, : h4 * 4, : w4 * 4]
        return jnp.pad(x, ((0, 0), (0, lift * 4), (0, 0)))

    ref_p = prep(ref)
    dist_p = prep(dist)

    kernel, rows = _make_kernel(tile_b, w4, n_window_rows)
    sums = pl.pallas_call(
        kernel,
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (i, j),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n, num_tiles), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, w4 * 4), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ref_p, dist_p)

    n_windows = n_window_rows * (w4 - 1)
    return jnp.sum(sums, axis=1) / n_windows
