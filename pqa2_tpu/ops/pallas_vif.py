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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pqa2_tpu.golden.filters import vif_filter
from pqa2_tpu.golden.vif import EPS, SIGMA_MAX_INV, SIGMA_NSQ

DEFAULT_TILE_H = 64
TILE_W = 512  # lane-tile width; bounded by Mosaic's scoped-VMEM budget


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
        # NEG clamp after sv (libvmaf order; golden/vif.py).
        sv_sq = jnp.maximum(sigma2_sq - g * sigma12, 0.0)
        if math.isfinite(gain_limit):  # inf literals can break Mosaic
            g = jnp.minimum(g, gain_limit)
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


def _make_kernel(taps: np.ndarray, tile_h: int, tile_w: int, h: int, w: int,
                 gain_limit: float, variant: str,
                 next_taps: Optional[np.ndarray] = None,
                 motion_taps: Optional[np.ndarray] = None):
    k = len(taps)
    half = k // 2
    rows = tile_h + 2 * half
    # DMA sublane extents must be 8-aligned on Mosaic; the host pads the
    # array so the extra rows are readable (never used in compute).
    rows8 = _round_up(rows, 8)
    # Lane tile: tile_w valid output columns + one extra 128-lane group so
    # the row filter's right halo (2*half <= 128) is resident. Lane DMA
    # offsets (j*tile_w) and extents stay 128-aligned.
    twp = tile_w + 128
    taps_f = [float(t) for t in taps]

    def kernel(ref_hbm, dist_hbm, acc_ref, *rest):
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
        streams = 3 if motion_taps is not None else 2

        # Double-buffered input pipeline (ops/pallas_vif_int.py): each grid
        # step waits on the tiles the PREVIOUS step prefetched into its slot
        # and immediately starts the NEXT step's DMAs into the other slot,
        # so HBM reads overlap compute instead of serialising at the top of
        # every step.
        def start_copies(slot, ni, ti, ji):
            srcs = [
                ref_hbm.at[ni, pl.ds(ti * tile_h, rows8),
                           pl.ds(ji * tile_w, twp)],
                dist_hbm.at[ni, pl.ds(ti * tile_h, rows8),
                            pl.ds(ji * tile_w, twp)],
            ]
            if motion_taps is not None:
                # The previous reference frame's tile — motion SAD comes
                # free with the resident read (frame 0 pairs with itself
                # -> SAD 0).
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

        def col_filter(x, taps_l, off=0):  # (rows, twp) -> (tile_h, twp)
            acc = None
            for i, c in enumerate(taps_l):
                term = c * x[off + i : off + i + tile_h, :]
                acc = term if acc is None else acc + term
            return acc

        # The horizontal (lane-direction) filters run TRANSPOSED: Mosaic's
        # 2-D transpose costs ~2 elementwise passes while pltpu.roll costs
        # ~10, so transposing each vertically-filtered plane once and
        # sliding along SUBLANES (plain slices, like the vertical stage)
        # replaces the 9-roll lane filter. Values are identical (same taps,
        # same order); the transposed outputs are (tile_w, tile_h) with no
        # junk columns (slices yield exactly tile_w outputs — sublane =
        # frame column).
        def rowT_filter(x, taps_l, off=0):  # (tile_h, twp) -> (tile_w, tile_h)
            xT = x.T  # (twp, tile_h)
            acc = None
            for i, c in enumerate(taps_l):
                s_ = off + i
                term = c * xT[s_ : s_ + tile_w, :]
                acc = term if acc is None else acc + term
            return acc

        def sep(x):
            return rowT_filter(col_filter(x, taps_f), taps_f)

        mu1 = sep(r)
        mu2 = sep(d)
        xx = sep(r * r)
        yy = sep(d * d)
        xy = sep(r * d)

        if next_taps is not None:
            # Emit the next scale's inputs: blur the resident tile with the
            # NEXT scale's taps (libvmaf blurs with the target scale's filter
            # before 2x decimation) and take even rows/columns. The resident
            # halo (half >= half_n) covers the smaller filter's support.
            k_n = len(next_taps)
            half_n = k_n // 2
            off = half - half_n
            taps_n = [float(c) for c in next_taps]

            th2, tw2 = tile_h // 2, tile_w // 2
            # Lane 2x decimation as MXU dots with one-hot selection matrices
            # (built from iota, no extra DMA). The data operand is split
            # into three bf16 planes (8+8+8 mantissa bits = exact f32
            # reconstruction); each dot picks with 0/1 entries, so the
            # decimated values pass through exactly at half the passes of
            # a HIGHEST f32 dot. The input is the TRANSPOSED blur (sublane
            # = frame column): the even-column pick contracts sublanes,
            # then the small (tw2, th2) transpose restores standard layout.
            sub_r = jax.lax.broadcasted_iota(jnp.int32, (tw2, tile_w), 0)
            sub_c = jax.lax.broadcasted_iota(jnp.int32, (tw2, tile_w), 1)
            subsel_b = (sub_c == 2 * sub_r).astype(jnp.bfloat16)
            lane_r = jax.lax.broadcasted_iota(jnp.int32, (tile_h, th2), 0)
            lane_c = jax.lax.broadcasted_iota(jnp.int32, (tile_h, th2), 1)
            lanesel_b = (lane_r == 2 * lane_c).astype(jnp.bfloat16)

            def _split3_dot(a_onehot, x, rhs_onehot=None):
                # exact f32 = hi + mid + lo with bf16 pieces; one-hot picks
                # accumulate in f32, so the sum reconstructs x exactly.
                hi = x.astype(jnp.bfloat16)
                rem = x - hi.astype(jnp.float32)
                mid = rem.astype(jnp.bfloat16)
                lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                out = None
                for piece in (hi, mid, lo):
                    if rhs_onehot is None:
                        y = jax.lax.dot(a_onehot, piece,
                                        preferred_element_type=jnp.float32)
                    else:
                        y = jax.lax.dot(piece, rhs_onehot,
                                        preferred_element_type=jnp.float32)
                    out = y if out is None else out + y
                return out

            def decimate(xT):  # transposed (tile_w, tile_h) -> (th2, tw2)
                y = _split3_dot(subsel_b, xT)          # (tw2, tile_h)
                z = _split3_dot(None, y, lanesel_b)    # (tw2, th2)
                return z.T

            ref_next[0] = decimate(
                rowT_filter(col_filter(r, taps_n, off=off), taps_n, off=off))
            dist_next[0] = decimate(
                rowT_filter(col_filter(d, taps_n, off=off), taps_n, off=off))

        num, den = _statistic(mu1, mu2, xx, yy, xy, gain_limit, variant)
        # Transposed mask: sublane = frame column, lane = frame row.
        sub_id = jax.lax.broadcasted_iota(jnp.int32, num.shape, 0)
        lane_id = jax.lax.broadcasted_iota(jnp.int32, num.shape, 1)
        valid = (
            (sub_id + j * tile_w < w)
            & (lane_id + t * tile_h < h)
        )
        num_s = jnp.sum(jnp.where(valid, num, 0.0))
        den_s = jnp.sum(jnp.where(valid, den, 0.0))

        sad_s = None
        if motion_taps is not None:
            # 5-tap Gaussian blur of ref[n] and ref[n-1] on the resident
            # tiles + masked |diff| sum — the motion/motion2 statistic
            # (ops/motion.py semantics) without its own HBM pass.
            k_m = len(motion_taps)
            half_m = k_m // 2
            off_m = half - half_m
            taps_m = [float(c) for c in motion_taps]

            def blur_m(x):
                return rowT_filter(col_filter(x, taps_m, off=off_m),
                                   taps_m, off=off_m)

            mdiff = jnp.abs(blur_m(r) - blur_m(vmem[slot, 2, :rows, :]))
            sad_s = jnp.sum(jnp.where(valid, mdiff, 0.0))

        row_id = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        col_id = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        blk = jnp.where(
            (row_id == 0) & (col_id == 0), num_s,
            jnp.where((row_id == 0) & (col_id == 1), den_s, 0.0),
        )
        if sad_s is not None:
            blk = jnp.where((row_id == 0) & (col_id == 2), sad_s, blk)

        first = (t == 0) & (j == 0)

        @pl.when(first)
        def _():
            acc_ref[0] = blk

        @pl.when(jnp.logical_not(first))
        def _():
            acc_ref[0] = acc_ref[0] + blk

    return kernel, half, rows


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "gain_limit", "variant", "tile_h", "interpret", "emit_next",
        "with_motion",
    ),
)
def vif_scale_pallas(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    scale: int,
    gain_limit: float = float("inf"),
    variant: str = "default",
    tile_h: int = DEFAULT_TILE_H,
    interpret: bool = False,
    emit_next: bool = False,
    with_motion: bool = False,
):
    """(N, H, W) pair at this scale's resolution ->
    (num, den[, sad][, ref', dist']).

    With ``emit_next`` the kernel additionally blurs the resident tile with
    the NEXT scale's taps and writes the 2x-decimated result — the next
    scale's inputs — straight from VMEM, so no separate full-frame
    blur+decimate pass ever touches HBM. With ``with_motion`` (scale 0) it
    also DMAs the previous frame's ref tile and accumulates the
    motion-SAD statistic in the same pass.
    """
    taps = vif_filter(scale)
    n, h, w = ref.shape
    # Mosaic: intermediate values need 8-aligned sublane extents — tile_h
    # must be a multiple of 8 (ragged last tiles are masked, not shrunk).
    # emit_next also needs tile_h/tile_w even and the half-blocks 8/128
    # aligned, which 16|tile_h and 256|tile_w guarantee.
    min_th = 16 if emit_next else 8
    tile_h = max(min(tile_h, _round_up(h, min_th)) // min_th * min_th, min_th)
    num_tiles = -(-h // tile_h)
    half = len(taps) // 2
    # Lane tiling: wide frames are split into tile_w-column tiles (each DMA
    # also reads the next 128-lane group as the row-filter halo) so the
    # per-tile working set fits Mosaic's scoped-VMEM budget at 4K.
    wmult = 256 if emit_next else 128
    tile_w = min(TILE_W, _round_up(w, wmult))
    num_w_tiles = -(-w // tile_w)
    wpad = num_w_tiles * tile_w + 128

    rows8 = _round_up(tile_h + 2 * half, 8)
    extra_rows = (num_tiles - 1) * tile_h + rows8 - (h + 2 * half)

    def pad(x):
        x = x.astype(jnp.float32)
        x = jnp.pad(x, ((0, 0), (half, half), (half, half)), mode="reflect")
        return jnp.pad(
            x,
            ((0, 0), (0, max(extra_rows, 0)), (0, wpad - (w + 2 * half))),
        )

    ref_p = pad(ref)
    dist_p = pad(dist)

    next_taps = vif_filter(scale + 1) if emit_next else None
    motion_taps = None
    if with_motion:
        from pqa2_tpu.golden.filters import motion_filter

        motion_taps = motion_filter()
    kernel, _, rows = _make_kernel(taps, tile_h, tile_w, h, w, gain_limit,
                                   variant, next_taps=next_taps,
                                   motion_taps=motion_taps)
    out_specs = [
        pl.BlockSpec((1, 8, 128), lambda i, j, k2: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((n, 8, 128), jnp.float32)]
    if emit_next:
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        th2, tw2 = tile_h // 2, tile_w // 2
        out_specs += [
            pl.BlockSpec((1, th2, tw2), lambda i, j, k2: (i, j, k2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th2, tw2), lambda i, j, k2: (i, j, k2),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [jax.ShapeDtypeStruct((n, h2, w2), jnp.float32)] * 2

    out = pl.pallas_call(
        kernel,
        grid=(n, num_tiles, num_w_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 3 if with_motion else 2, _round_up(rows, 8),
                        tile_w + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3 if with_motion else 2)),
        ],
        interpret=interpret,
    )(ref_p, dist_p)

    acc = out[0]
    res = [acc[:, 0, 0], acc[:, 0, 1]]
    if with_motion:
        res.append(acc[:, 0, 2] / float(h * w))
    if emit_next:
        res.extend([out[1], out[2]])
    return tuple(res)


def vif_scale_sums_pallas(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    scale: int,
    gain_limit: float = float("inf"),
    variant: str = "default",
    tile_h: int = DEFAULT_TILE_H,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Back-compat wrapper: per-frame (num, den) sums for one scale."""
    return vif_scale_pallas(
        ref, dist, scale, gain_limit=gain_limit, variant=variant,
        tile_h=tile_h, interpret=interpret, emit_next=False,
    )


def pick_tile_h(h: int, max_tile: int = DEFAULT_TILE_H) -> int:
    """8-aligned tile height <= max_tile (ragged tails are masked)."""
    return max(min(max_tile, _round_up(h, 8)) // 8 * 8, 8)


def vif_features_pallas(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    gain_limit: float = float("inf"),
    variant: str = "default",
    interpret: bool = False,
    with_motion: bool = False,
):
    """(N, H, W) luma pair -> (N, 4) VIF features via the fused kernels.

    Drop-in equivalent of ops.vif.vif_features_batched. Each scale's kernel
    emits the next scale's 2x-decimated inputs from VMEM (blurred with the
    next scale's taps, matching ops/vif.py's sep_filter+[::2, ::2]), so the
    whole 4-scale cascade reads each input frame from HBM exactly once.

    With ``with_motion`` the scale-0 kernel also accumulates the per-frame
    motion SAD (sad(n, n-1) of 5-tap-blurred ref luma; 0 at n=0) and the
    return becomes ((N, 4) vif, (N,) sad).
    """
    # Mosaic kernels only compile for TPU; interpret transparently elsewhere
    # (tests on the CPU mesh, debugging).
    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    ref = ref.astype(jnp.float32)
    dist = dist.astype(jnp.float32)
    feats = []
    sad = None
    # Interpret mode (CPU tests): small tiles — the kernel's unrolled row
    # loop makes trace/compile time scale with tile_h. On silicon 128-row
    # tiles halve per-tile fixed costs (same win as the integer cascade,
    # ops/pallas_vif_int.py).
    tile_h = 16 if interpret else 2 * DEFAULT_TILE_H
    for scale in range(4):
        out = vif_scale_pallas(
            ref, dist, scale, gain_limit=gain_limit, variant=variant,
            tile_h=tile_h,
            interpret=interpret, emit_next=scale < 3,
            with_motion=with_motion and scale == 0,
        )
        num, den = out[0], out[1]
        rest = list(out[2:])
        if with_motion and scale == 0:
            sad = rest.pop(0)
        if scale < 3:
            ref, dist = rest
        feats.append(jnp.where(den > 0, num / den, 1.0))
    vif = jnp.stack(feats, axis=-1)
    if with_motion:
        return vif, sad
    return vif
