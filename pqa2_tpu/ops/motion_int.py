"""Integer fixed-point motion — batched jnp implementation.

Device twin of ``pqa2_tpu.golden.motion_int``: Q16 5-tap blur to Q8 with
libvmaf's rounding, exact integer SAD between consecutive blurred frames.
Every accumulation fits uint32 (the Q16 taps sum to 65536 and blur values
are < 2^16); the per-frame SAD — which can reach 2^39 on 4K — is returned
exactly as a (hi, lo) byte-split pair summed in uint32 and recombined in
f32 (relative error ~6e-8, far below the feature's resolution).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from pqa2_tpu.golden.fixedpoint import MOTION_FILTER_Q16
from pqa2_tpu.ops.motion import features_from_sad_prev
from pqa2_tpu.ops.vif_int import _conv_direct, to_native_grid


def blur_int_batched(frames: jnp.ndarray, bit_depth: int = 8) -> jnp.ndarray:
    """(N, H, W) luma -> Q8 blurred planes (uint32).

    >8-bit sources blur natively: the vertical shift widens to 8+in_q
    (golden/motion_int.py), landing on the same Q8 plane domain."""
    x, in_q = to_native_grid(frames, bit_depth)
    tmp = _conv_direct(x, MOTION_FILTER_Q16, axis=-2, shift=8 + in_q)
    return _conv_direct(tmp, MOTION_FILTER_Q16, axis=-1, shift=16)


def sad_pairs_int(blur_a: jnp.ndarray, blur_b: jnp.ndarray) -> jnp.ndarray:
    """Exact mean |a-b| in pixel units for Q8 uint32 blur pairs -> f32 (N,)."""
    d = jnp.where(blur_a >= blur_b, blur_a - blur_b, blur_b - blur_a)
    hi = jnp.sum((d >> 8).astype(jnp.uint32), axis=(-2, -1))
    lo = jnp.sum((d & jnp.uint32(0xFF)).astype(jnp.uint32), axis=(-2, -1))
    total = hi.astype(jnp.float32) * 256.0 + lo.astype(jnp.float32)
    wh = blur_a.shape[-2] * blur_a.shape[-1]
    return total / (wh * 256.0)


def motion_features_int(
    frames: jnp.ndarray,
    has_prev: bool = False,
    has_next: bool = False,
    bit_depth: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, H, W) reference luma -> (motion, motion2) for core frames.

    Halo contract identical to ops.motion.motion_features.
    """
    blurred = blur_int_batched(frames, bit_depth)
    sad_prev = sad_pairs_int(blurred[1:], blurred[:-1])
    return features_from_sad_prev(
        sad_prev, frames.shape[0], has_prev=has_prev, has_next=has_next
    )
