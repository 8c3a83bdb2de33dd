"""Static-shape chunk padding.

Every device program in the pipeline runs on fixed frame-count buckets so no
clip length ever triggers a fresh XLA compilation; short tail chunks pad up
to the bucket by repeating the last frame and the pad outputs are sliced off
by the caller. This is the one shared definition of that pad rule
(used by pipeline/scoring, pipeline/streaming, align/stats, align/temporal).
"""

from __future__ import annotations

import numpy as np


def pad_frames(x, size: int):
    """Pad axis 0 of an (N, ...) array up to `size` by edge-repeat.

    Works on numpy arrays and jax arrays alike; returns the input unchanged
    when N >= size.
    """
    n = x.shape[0]
    if n >= size:
        return x
    if isinstance(x, np.ndarray):
        return np.concatenate([x, np.repeat(x[-1:], size - n, axis=0)])
    import jax.numpy as jnp

    return jnp.concatenate([x, jnp.repeat(x[-1:], size - n, axis=0)])


def pow2_bucket(n: int, max_size: int) -> int:
    """Smallest power-of-two >= min(n, ...) capped at max_size — the shared
    bucket rule (28- and 30-frame clips land on the same 32-frame program)."""
    bucket = 1
    while bucket < n and bucket < max_size:
        bucket *= 2
    return max(1, min(max_size, bucket))
