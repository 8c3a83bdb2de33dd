"""Batched motion / motion2 temporal features — jnp implementation.

``motion2[t] = min(sad(t-1, t), sad(t, t+1))`` on 5-tap Gaussian-blurred luma
(reference enables it as ``feature=name=motion`` in the libvmaf filter string,
app/vmaf_analyzer.py:389; oracle: pqa2_tpu.golden.motion).

This is the one temporally-dependent VMAF feature. For chunked/sharded
execution the caller supplies the true batch with `prev`/`next` halo frames
already attached (see pipeline/chunking + parallel/sharding); here the batch
is scored as a closed clip.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pqa2_tpu.golden.filters import motion_filter
from pqa2_tpu.ops.filters import sep_filter_batched

_TAPS = motion_filter()


def blur_batched(frames: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) luma -> 5-tap Gaussian blur (the motion pre-filter)."""
    return sep_filter_batched(frames.astype(jnp.float32), _TAPS)


def sad_pairs(blurred_a: jnp.ndarray, blurred_b: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute difference per frame pair: (N,H,W),(N,H,W) -> (N,)."""
    return jnp.mean(jnp.abs(blurred_a - blurred_b), axis=(-2, -1))


def motion_features(
    frames: jnp.ndarray,
    has_prev: bool = False,
    has_next: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, H, W) luma -> (motion, motion2), each (N_core,).

    With halos: `frames` includes one extra leading frame when has_prev and
    one extra trailing frame when has_next; features are returned only for
    the core frames. Without halos the clip boundary semantics apply
    (motion[0] = 0; motion2[last] = sad(last-1, last)).
    """
    blurred = blur_batched(frames)
    # sad_prev[i] = sad(i-1, i) for i in 1..n-1
    sad_prev = sad_pairs(blurred[1:], blurred[:-1])  # (n-1,)
    return features_from_sad_prev(sad_prev, frames.shape[0],
                                  has_prev=has_prev, has_next=has_next)


def features_from_sad_prev(
    sad_prev: jnp.ndarray,
    n: int,
    has_prev: bool = False,
    has_next: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(n-1,) consecutive-frame SADs -> (motion, motion2) for core frames."""

    lead = 1 if has_prev else 0
    core = slice(lead, n - 1 if has_next else n)

    # motion[t]: sad with previous frame; 0 at a true clip start.
    if has_prev:
        motion = sad_prev[lead - 1 : (n - 2 if has_next else n - 1)]
    else:
        motion = jnp.concatenate(
            [jnp.zeros((1,), sad_prev.dtype), sad_prev[: n - 2 if has_next else n - 1]]
        )

    # motion2[t] = min(sad(t-1,t), sad(t,t+1)); at a true clip end the
    # forward term is absent, at a true clip start motion2 = 0.
    n_core = n - lead - (1 if has_next else 0)
    fwd_valid = n_core - (0 if has_next else 1)
    # forward sad for core index c is sad_prev[c + lead] when it exists
    fwd = sad_prev[lead : lead + max(fwd_valid, 0)]
    if fwd_valid < n_core:  # pad the final (clip-end) slot with +inf
        fwd = jnp.concatenate([fwd, jnp.full((n_core - fwd_valid,), jnp.inf, sad_prev.dtype)])
    motion2 = jnp.minimum(motion, fwd)
    if not has_prev:
        motion2 = motion2.at[0].set(0.0)
    return motion, motion2
