"""Batched VIF (4 scales) — jnp implementation.

Produces the ``vif_scale0..3`` SVR inputs for a whole frame batch in one
traced program (reference consumes these from libvmaf's C extractors via
the lavfi filter string, app/vmaf_analyzer.py:406). Numerics mirror the
float64 oracle ``pqa2_tpu.golden.vif`` (integer-path statistic by default,
classic float-path variant switchable), computed in f32 on device.

NEG models pass ``gain_limit = vif_enhn_gain_limit`` (=1.0) which clamps the
restoration gain g — plumbed as a static python float so the jit specialises.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pqa2_tpu.golden.filters import vif_filter
from pqa2_tpu.golden.vif import EPS, SIGMA_MAX_INV, SIGMA_NSQ
from pqa2_tpu.ops.filters import sep_filter_batched


def _moments(ref, dist, taps):
    mu1 = sep_filter_batched(ref, taps)
    mu2 = sep_filter_batched(dist, taps)
    xx = sep_filter_batched(ref * ref, taps)
    yy = sep_filter_batched(dist * dist, taps)
    xy = sep_filter_batched(ref * dist, taps)
    return mu1, mu2, xx, yy, xy


def _statistic_default(mu1, mu2, xx, yy, xy, gain_limit: float):
    """Integer-path statistic (golden/vif.py:_vif_statistic_default)."""
    sigma1_sq = jnp.maximum(xx - mu1 * mu1, 0.0)
    sigma2_sq = jnp.maximum(yy - mu2 * mu2, 0.0)
    sigma12 = xy - mu1 * mu2

    log_branch = sigma1_sq >= SIGMA_NSQ

    g = jnp.where(sigma12 > 0.0, sigma12 / jnp.maximum(sigma1_sq, EPS), 0.0)
    # NEG clamp after sv (libvmaf order; golden/vif.py).
    sv_sq = jnp.maximum(sigma2_sq - g * sigma12, 0.0)
    g = jnp.minimum(g, gain_limit)
    num_log = jnp.log2(1.0 + g * g * sigma1_sq / (sv_sq + SIGMA_NSQ))
    den_log = jnp.log2(1.0 + sigma1_sq / SIGMA_NSQ)

    num = jnp.where(log_branch, num_log, 1.0 - sigma2_sq * SIGMA_MAX_INV)
    den = jnp.where(log_branch, den_log, 1.0)
    axes = tuple(range(1, num.ndim))
    return jnp.sum(num, axis=axes), jnp.sum(den, axis=axes)


def _statistic_classic(mu1, mu2, xx, yy, xy, gain_limit: float):
    """Float-path statistic (golden/vif.py:_vif_statistic_classic)."""
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
    g = jnp.minimum(g, gain_limit)

    num = jnp.log2(1.0 + g * g * sigma1_sq / (sv_sq + SIGMA_NSQ))
    den = jnp.log2(1.0 + sigma1_sq / SIGMA_NSQ)
    axes = tuple(range(1, num.ndim))
    return jnp.sum(num, axis=axes), jnp.sum(den, axis=axes)


def vif_features_batched(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    gain_limit: float = float("inf"),
    variant: str = "default",
) -> jnp.ndarray:
    """(N, H, W) luma pair -> (N, 4) [vif_scale0..3] features."""
    stat = _statistic_default if variant == "default" else _statistic_classic
    ref = ref.astype(jnp.float32)
    dist = dist.astype(jnp.float32)
    def decimate2(x):
        # Row-stride + pair-reshape: a double-strided slice x[:, ::2, ::2]
        # lowers to a slow gather on TPU (~8x the cost of this form).
        n, hh, ww = x.shape
        x = x[:, ::2, :]
        if ww % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))
        return x.reshape(n, (hh + 1) // 2, (ww + 1) // 2, 2)[..., 0]

    feats = []
    for scale in range(4):
        taps = vif_filter(scale)
        if scale > 0:
            ref = decimate2(sep_filter_batched(ref, taps))
            dist = decimate2(sep_filter_batched(dist, taps))
        num, den = stat(*_moments(ref, dist, taps), gain_limit)
        feats.append(jnp.where(den > 0, num / den, 1.0))
    return jnp.stack(feats, axis=-1)
