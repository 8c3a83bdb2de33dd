"""Fused motion-SAD Pallas kernel (standalone variant).

The production dispatch (pipeline/features.py "pallas" backend) gets the
motion SAD from the VIF scale-0 kernel's resident tiles instead
(ops/pallas_vif.py with_motion); this standalone kernel is the un-fused
equivalent for A/B runs and for callers that need motion without VIF.

Computes the per-frame consecutive-pair SAD of 5-tap Gaussian-blurred luma —
the building block of the motion/motion2 features (reference consumes them
from libvmaf via ``feature=name=motion``, app/vmaf_analyzer.py:389).

For each row/column tile the kernel DMAs the same tile of frame n and frame
n-1, blurs both in VMEM (column pass + roll-based row pass, mirroring
ops/pallas_vif.py), and accumulates the masked |blur(n) - blur(n-1)| sum into
a per-frame accumulator. The jnp path (ops/motion.py) writes the blurred
batch to HBM and re-reads it twice; here nothing but the raw tiles and one
(8, 128) block per frame ever crosses HBM.

Frame 0 reads itself as its "previous" frame, so its SAD is exactly 0 —
matching the clip-start semantics without a special case.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pqa2_tpu.golden.filters import motion_filter

DEFAULT_TILE_H = 64


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(taps, tile_h: int, tile_w: int, h: int, w: int):
    k = len(taps)
    half = k // 2
    rows = tile_h + 2 * half
    rows8 = _round_up(rows, 8)
    twp = tile_w + 128
    taps_f = [float(t) for t in taps]

    def kernel(cur_hbm, acc_ref, vmem, sem):
        n = pl.program_id(0)
        t = pl.program_id(1)
        j = pl.program_id(2)

        cur_tile = vmem.at[0, pl.ds(0, rows8), :]
        prev_tile = vmem.at[1, pl.ds(0, rows8), :]
        cp1 = pltpu.make_async_copy(
            cur_hbm.at[n, pl.ds(t * tile_h, rows8), pl.ds(j * tile_w, twp)],
            cur_tile, sem.at[0],
        )
        # Frame 0 pairs with itself -> SAD 0, the clip-start semantics.
        cp2 = pltpu.make_async_copy(
            cur_hbm.at[jnp.maximum(n - 1, 0), pl.ds(t * tile_h, rows8),
                       pl.ds(j * tile_w, twp)],
            prev_tile, sem.at[1],
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

        def blur(x):
            acc = None
            for i, c in enumerate(taps_f):
                term = c * x[i : i + tile_h, :]
                acc = term if acc is None else acc + term
            out = None
            for i, c in enumerate(taps_f):
                term = c * (acc if i == 0 else pltpu.roll(acc, twp - i, axis=1))
                out = term if out is None else out + term
            return out

        diff = jnp.abs(blur(vmem[0, :rows, :]) - blur(vmem[1, :rows, :]))
        col_id = jax.lax.broadcasted_iota(jnp.int32, diff.shape, 1)
        row_id = jax.lax.broadcasted_iota(jnp.int32, diff.shape, 0)
        valid = (
            (col_id < tile_w)
            & (col_id + j * tile_w < w)
            & (row_id + t * tile_h < h)
        )
        s = jnp.sum(jnp.where(valid, diff, 0.0))

        r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        blk = jnp.where((r8 == 0) & (c8 == 0), s, 0.0)

        first = (t == 0) & (j == 0)

        @pl.when(first)
        def _():
            acc_ref[0] = blk

        @pl.when(jnp.logical_not(first))
        def _():
            acc_ref[0] = acc_ref[0] + blk

    return kernel, half, rows


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def motion_sad_pallas(
    frames: jnp.ndarray,
    tile_h: int = DEFAULT_TILE_H,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, H, W) luma -> (N,) mean |blur(f[n]) - blur(f[n-1])| (0 at n=0)."""
    taps = motion_filter()
    n, h, w = frames.shape
    tile_h = max(min(tile_h, _round_up(h, 8)) // 8 * 8, 8)
    num_tiles = -(-h // tile_h)
    half = len(taps) // 2
    # The motion kernel keeps only ~6 tile-sized values live, so wide lane
    # tiles fit scoped VMEM easily and cut the per-tile DMA-latency overhead.
    tile_w = min(2048, _round_up(w, 128))
    num_w_tiles = -(-w // tile_w)
    wpad = num_w_tiles * tile_w + 128

    rows8 = _round_up(tile_h + 2 * half, 8)
    extra_rows = (num_tiles - 1) * tile_h + rows8 - (h + 2 * half)

    x = frames.astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (half, half), (half, half)), mode="reflect")
    x = jnp.pad(
        x, ((0, 0), (0, max(extra_rows, 0)), (0, wpad - (w + 2 * half)))
    )

    kernel, _, rows = _make_kernel(taps, tile_h, tile_w, h, w)
    acc = pl.pallas_call(
        kernel,
        grid=(n, num_tiles, num_w_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, j, k2: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, _round_up(rows, 8), tile_w + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x)

    return acc[:, 0, 0] / float(h * w)


def motion_features_pallas(
    frames: jnp.ndarray,
    has_prev: bool = False,
    has_next: bool = False,
    interpret: bool = False,
):
    """Drop-in equivalent of ops.motion.motion_features via the fused kernel."""
    from pqa2_tpu.ops.motion import features_from_sad_prev

    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    sad = motion_sad_pallas(frames, interpret=interpret)
    return features_from_sad_prev(sad[1:], frames.shape[0],
                                  has_prev=has_prev, has_next=has_next)
