"""Fused VIF Pallas kernel.

One kernel per VIF scale computes, for a row-tile resident in VMEM:
  * the five filtered local moments (mu1, mu2, E[x^2], E[y^2], E[xy])
    via the separable Gaussian window (column pass then row pass),
  * the per-pixel VIF statistic (integer-path or classic),
  * the tile's partial (num, den) sums.

The jnp formulation (ops/vif.py) materialises every filtered moment in HBM
between the column and row passes — ~12 full-frame HBM round-trips per
scale. Here everything after the input DMA stays in VMEM; HBM traffic is
2 reads of the (padded) tile and one small accumulator write.

Mosaic layout rules honoured:
  * inputs are pre-padded on the host/XLA side: reflect by the filter
    half-width, then W lifted to a multiple of 128 (junk columns never
    read by the row filter);
  * per-frame partial sums accumulate into an (8, 128) VMEM block that
    every row-tile grid step revisits (zero-initialised at t == 0) —
    num in lane (0,0), den in lane (0,1);
  * the tile scratch is allocated at (8, 128)-aligned shape and DMA'd
    into its top-left corner.

Equivalent in spirit to libvmaf's fused integer VIF extractors (the
reference consumes those via lavfi, app/vmaf_analyzer.py:406).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pqa2_tpu.golden.filters import vif_filter
from pqa2_tpu.golden.vif import EPS, SIGMA_MAX_INV, SIGMA_NSQ

DEFAULT_TILE_H = 64


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _statistic(mu1, mu2, xx, yy, xy, gain_limit, variant):
    """Per-pixel VIF statistic -> (num, den) maps. Mirrors ops/vif.py."""
    if variant == "default":
        sigma1_sq = jnp.maximum(xx - mu1 * mu1, 0.0)
        sigma2_sq = jnp.maximum(yy - mu2 * mu2, 0.0)
        sigma12 = xy - mu1 * mu2
        log_branch = sigma1_sq >= SIGMA_NSQ
        g = jnp.where(sigma12 > 0.0, sigma12 / jnp.maximum(sigma1_sq, EPS), 0.0)
        if math.isfinite(gain_limit):  # inf literals can break Mosaic
            g = jnp.minimum(g, gain_limit)
        sv_sq = jnp.maximum(sigma2_sq - g * sigma12, 0.0)
        num_log = jnp.log2(1.0 + g * g * sigma1_sq / (sv_sq + SIGMA_NSQ))
        den_log = jnp.log2(1.0 + sigma1_sq / SIGMA_NSQ)
        num = jnp.where(log_branch, num_log, 1.0 - sigma2_sq * SIGMA_MAX_INV)
        den = jnp.where(log_branch, den_log, 1.0)
        return num, den
    # classic float path
    sigma1_sq = xx - mu1 * mu1
    sigma2_sq = yy - mu2 * mu2
    sigma12 = xy - mu1 * mu2
    g = sigma12 / (sigma1_sq + EPS)
    sv_sq = sigma2_sq - g * sigma12
    low1 = sigma1_sq < EPS
    g = jnp.where(low1, 0.0, g)
    sv_sq = jnp.where(low1, sigma2_sq, sv_sq)
    sigma1_sq = jnp.where(low1, 0.0, sigma1_sq)
    low2 = sigma2_sq < EPS
    g = jnp.where(low2, 0.0, g)
    sv_sq = jnp.where(low2, 0.0, sv_sq)
    neg = g < 0.0
    sv_sq = jnp.where(neg, sigma2_sq, sv_sq)
    g = jnp.where(neg, 0.0, g)
    sv_sq = jnp.maximum(sv_sq, EPS)
    if math.isfinite(gain_limit):
        g = jnp.minimum(g, gain_limit)
    num = jnp.log2(1.0 + g * g * sigma1_sq / (sv_sq + SIGMA_NSQ))
    den = jnp.log2(1.0 + sigma1_sq / SIGMA_NSQ)
    return num, den


def _make_kernel(taps: np.ndarray, tile_h: int, h: int, w: int, wp128: int,
                 gain_limit: float, variant: str):
    k = len(taps)
    half = k // 2
    rows = tile_h + 2 * half
    # DMA sublane extents must be 8-aligned on Mosaic; the host pads the
    # array so the extra rows are readable (never used in compute).
    rows8 = _round_up(rows, 8)
    taps_f = [float(t) for t in taps]

    def kernel(ref_hbm, dist_hbm, acc_ref, vmem, sem):
        n = pl.program_id(0)
        t = pl.program_id(1)

        ref_tile = vmem.at[0, pl.ds(0, rows8), :]
        dist_tile = vmem.at[1, pl.ds(0, rows8), :]
        cp1 = pltpu.make_async_copy(
            ref_hbm.at[n, pl.ds(t * tile_h, rows8), :], ref_tile, sem.at[0]
        )
        cp2 = pltpu.make_async_copy(
            dist_hbm.at[n, pl.ds(t * tile_h, rows8), :], dist_tile, sem.at[1]
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

        r = vmem[0, :rows, :]
        d = vmem[1, :rows, :]

        def col_filter(x):  # (rows, wp128) -> (tile_h, wp128)
            acc = None
            for i, c in enumerate(taps_f):
                term = c * x[i : i + tile_h, :]
                acc = term if acc is None else acc + term
            return acc

        def row_filter(x):  # (tile_h, wp128) -> (tile_h, wp128); cols >= w junk
            # Lane-dim slices at arbitrary offsets don't lower in Mosaic;
            # shift with rolls instead and mask the junk tail columns out of
            # the statistic sums below.
            acc = None
            for i, c in enumerate(taps_f):
                term = c * (x if i == 0 else pltpu.roll(x, wp128 - i, axis=1))
                acc = term if acc is None else acc + term
            return acc

        mu1 = row_filter(col_filter(r))
        mu2 = row_filter(col_filter(d))
        xx = row_filter(col_filter(r * r))
        yy = row_filter(col_filter(d * d))
        xy = row_filter(col_filter(r * d))

        num, den = _statistic(mu1, mu2, xx, yy, xy, gain_limit, variant)
        # Mask junk tail columns and (for ragged heights) rows beyond H.
        col_id = jax.lax.broadcasted_iota(jnp.int32, num.shape, 1)
        row_id = jax.lax.broadcasted_iota(jnp.int32, num.shape, 0)
        valid = (col_id < w) & (row_id + t * tile_h < h)
        num_s = jnp.sum(jnp.where(valid, num, 0.0))
        den_s = jnp.sum(jnp.where(valid, den, 0.0))

        row_id = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        col_id = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        blk = jnp.where(
            (row_id == 0) & (col_id == 0), num_s,
            jnp.where((row_id == 0) & (col_id == 1), den_s, 0.0),
        )

        @pl.when(t == 0)
        def _():
            acc_ref[0] = blk

        @pl.when(t != 0)
        def _():
            acc_ref[0] = acc_ref[0] + blk

    return kernel, half, rows


@functools.partial(
    jax.jit,
    static_argnames=("scale", "gain_limit", "variant", "tile_h", "interpret"),
)
def vif_scale_sums_pallas(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    scale: int,
    gain_limit: float = float("inf"),
    variant: str = "default",
    tile_h: int = DEFAULT_TILE_H,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, H, W) pair at this scale's resolution -> per-frame (num, den).

    The caller handles the blur+decimate between scales (cheap relative to
    the 5-moment pass) and the final num/den division.
    """
    taps = vif_filter(scale)
    n, h, w = ref.shape
    # Mosaic: intermediate values need 8-aligned sublane extents — tile_h
    # must be a multiple of 8 (ragged last tiles are masked, not shrunk).
    tile_h = max(min(tile_h, _round_up(h, 8)) // 8 * 8, 8)
    num_tiles = -(-h // tile_h)
    half = len(taps) // 2
    wp128 = _round_up(w + 2 * half, 128)

    rows8 = _round_up(tile_h + 2 * half, 8)
    extra_rows = (num_tiles - 1) * tile_h + rows8 - (h + 2 * half)

    def pad(x):
        x = x.astype(jnp.float32)
        x = jnp.pad(x, ((0, 0), (half, half), (half, half)), mode="reflect")
        return jnp.pad(
            x,
            ((0, 0), (0, max(extra_rows, 0)), (0, wp128 - (w + 2 * half))),
        )

    ref_p = pad(ref)
    dist_p = pad(dist)

    kernel, _, rows = _make_kernel(taps, tile_h, h, w, wp128, gain_limit,
                                   variant)
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
            pltpu.VMEM((2, _round_up(rows, 8), wp128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ref_p, dist_p)

    return acc[:, 0, 0], acc[:, 0, 1]


def pick_tile_h(h: int, max_tile: int = DEFAULT_TILE_H) -> int:
    """8-aligned tile height <= max_tile (ragged tails are masked)."""
    return max(min(max_tile, _round_up(h, 8)) // 8 * 8, 8)


def vif_features_pallas(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    gain_limit: float = float("inf"),
    variant: str = "default",
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, H, W) luma pair -> (N, 4) VIF features via the fused kernels.

    Drop-in equivalent of ops.vif.vif_features_batched; the inter-scale
    blur+decimate reuses the jnp separable filter (cheap, and XLA fuses the
    decimation into it).
    """
    from pqa2_tpu.ops.filters import sep_filter_batched

    # Mosaic kernels only compile for TPU; interpret transparently elsewhere
    # (tests on the CPU mesh, debugging).
    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    ref = ref.astype(jnp.float32)
    dist = dist.astype(jnp.float32)
    feats = []
    for scale in range(4):
        taps = vif_filter(scale)
        if scale > 0:
            ref = sep_filter_batched(ref, taps)[:, ::2, ::2]
            dist = sep_filter_batched(dist, taps)[:, ::2, ::2]
        num, den = vif_scale_sums_pallas(
            ref, dist, scale, gain_limit=gain_limit, variant=variant,
            interpret=interpret,
        )
        feats.append(jnp.where(den > 0, num / den, 1.0))
    return jnp.stack(feats, axis=-1)
