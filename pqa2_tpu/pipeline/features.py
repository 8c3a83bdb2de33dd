"""Fused per-chunk feature extraction.

One traced program computes every SVR input for a frame batch: adm2, motion2
(+ plain motion), vif_scale0..3. The reference obtains these from libvmaf's
per-frame C loop (app/vmaf_analyzer.py:406); here the whole batch runs as one
XLA computation so elementwise stages fuse and the MXU/VPU stay busy.

Halo contract: motion2 needs frames t-1 and t+1. When scoring a chunk that
continues an earlier/later chunk, the caller passes the neighbouring frame(s)
attached to the batch and sets has_prev/has_next; VIF/ADM are computed only
for the core frames (halo rows are sliced off before the spatial features).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from pqa2_tpu.ops.adm import adm_features_batched
from pqa2_tpu.ops.motion import motion_features
from pqa2_tpu.ops.vif import vif_features_batched

# Kernel backend switch: "auto" = full fused-Pallas set on TPU (VIF+motion
# in one cascade, Pallas ADM), all-XLA elsewhere; "xla" = jnp shifted-slice
# ops everywhere; "pallas" = force the full Pallas set; "vif-pallas" =
# Pallas VIF/motion with the XLA ADM (A/B debugging). Env override for
# benching.
KERNEL_BACKEND = os.environ.get("PQA2_KERNEL_BACKEND", "auto")

# Feature-precision policy: "auto" follows the model's extractor family
# (models naming VMAF_integer_feature_* run the fixed-point path, float
# models the f32 path); "float"/"integer" force one. Env override for
# benching and A/B.
FEATURE_PRECISION = os.environ.get("PQA2_FEATURE_PRECISION", "auto")


def resolve_precision(model, setting: Optional[str] = None) -> str:
    """'auto'|'float'|'integer'|'integer_fast' (+ model) -> concrete mode.

    "integer" — the DEFAULT for integer models since round 4 — is the
    bit-faithful libvmaf fixed-point path including the LUT-quantised log
    statistic (the family integer models were trained on): every integer
    stage is bit-identical to the uint64 oracle, so the shipping scores
    carry no approximation leg at all. The statistic's table values are
    computed directly in audited double-f32 arithmetic (ops/crlog2.py +
    ops/pallas_vif_int.py:log2_direct_exceptions; originally ~4 fps at 4K
    as gathers, ~64 fps as MXU breakpoint fetches).

    "integer_fast" runs the identical integer moment pipeline but smooths
    the statistic's LUT logs to f32, for a score delta bounded at 1e-3
    (pinned in tests); it remains as an opt-in throughput mode. Measured
    whole-model 4K throughput of both modes lives in the GENERATED table
    in docs/PERFORMANCE.md (BENCH_FULL.json is the source of truth;
    tests/test_perf_docs_sync.py fails on drift) — the exact default
    clears the 60 fps target with margin and the fast mode's advantage
    is the whole-model ratio there, not a cascade-level number.

    The choice is uniform across backends so results are reproducible
    between CPU and TPU."""
    p = setting or FEATURE_PRECISION
    if p == "auto":
        if hasattr(model, "models"):  # bootstrap stack
            model = model.models[0]
        return ("integer"
                if getattr(model, "uses_integer_features", False) else "float")
    if p not in ("float", "integer", "integer_fast"):
        raise ValueError(f"unknown feature precision {p!r}")
    return p


@functools.partial(
    jax.jit,
    static_argnames=(
        "vif_gain", "adm_gain", "vif_variant", "has_prev", "has_next",
        "backend", "precision", "bit_depth",
    ),
)
def extract_features_batched(
    ref: jnp.ndarray,
    dist: jnp.ndarray,
    *,
    vif_gain: float = float("inf"),
    adm_gain: float = 100.0,
    vif_variant: str = "default",
    has_prev: bool = False,
    has_next: bool = False,
    backend: Optional[str] = None,
    precision: str = "float",
    bit_depth: int = 8,
) -> Dict[str, jnp.ndarray]:
    """(N, H, W) luma pair (incl. halo rows) -> dict of (N_core,) features.

    Keys: adm2, motion, motion2, vif_scale0..3 — the canonical SVR inputs
    (models/*.json feature_names).

    precision="integer" runs the fixed-point emulation of libvmaf's
    VMAF_integer_feature_* extractors (ops/vif_int, ops/adm_int,
    ops/motion_int) — the path the integer models were trained on;
    "integer_fast" swaps the LUT log statistic for smooth f32 logs.

    Luma is always on the 8-bit scale (the pipeline divides >8-bit codes
    by 2^(depth-8)); pass ``bit_depth`` so the integer path can recover
    the exact native codes and run its native-grid fixed-point schedule
    (the f32 path is scale-invariant and ignores it).
    """
    if precision in ("integer", "integer_fast"):
        exact = precision == "integer"
        core = slice(1 if has_prev else 0, -1 if has_next else None)

        int_backend = backend if backend is not None else KERNEL_BACKEND
        if int_backend == "auto":
            int_backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        if int_backend in ("pallas", "vif-pallas"):
            # Fused uint32 Pallas cascade: one HBM read feeds all four VIF
            # scales AND the integer motion SAD (ops/pallas_vif_int.py);
            # per-pixel integer stages are bit-identical to the XLA twin.
            # exact mode: kernels emit sigma planes, the LUT statistic
            # runs in XLA (the hybrid — see ops/pallas_vif_int.py).
            from pqa2_tpu.ops.motion import features_from_sad_prev
            from pqa2_tpu.ops.pallas_vif_int import vif_features_int_pallas

            vif_all, sad = vif_features_int_pallas(
                ref, dist, gain_limit=vif_gain, with_motion=True,
                exact=exact, bit_depth=bit_depth,
            )
            motion, motion2 = features_from_sad_prev(
                sad[1:], ref.shape[0], has_prev=has_prev, has_next=has_next)
            vif = vif_all[core]
        else:
            from pqa2_tpu.ops.motion_int import motion_features_int
            from pqa2_tpu.ops.vif_int import vif_features_int_batched

            motion, motion2 = motion_features_int(
                ref, has_prev=has_prev, has_next=has_next,
                bit_depth=bit_depth,
            )
            vif = vif_features_int_batched(ref[core], dist[core],
                                           gain_limit=vif_gain, exact=exact,
                                           bit_depth=bit_depth)
        if int_backend == "pallas":
            from pqa2_tpu.ops.pallas_adm_int import adm_features_int_pallas

            adm2 = adm_features_int_pallas(ref[core], dist[core],
                                           gain_limit=adm_gain,
                                           bit_depth=bit_depth)
        else:
            from pqa2_tpu.ops.adm_int import adm_features_int_batched

            adm2 = adm_features_int_batched(ref[core], dist[core],
                                            gain_limit=adm_gain,
                                            bit_depth=bit_depth)
        return {
            "adm2": adm2,
            "motion": motion,
            "motion2": motion2,
            "vif_scale0": vif[:, 0],
            "vif_scale1": vif[:, 1],
            "vif_scale2": vif[:, 2],
            "vif_scale3": vif[:, 3],
        }

    if backend is None:
        backend = KERNEL_BACKEND
    ref = ref.astype(jnp.float32)
    dist = dist.astype(jnp.float32)
    core = slice(1 if has_prev else 0, -1 if has_next else None)

    if backend == "auto":
        # The fused Pallas kernels win on TPU (VIF ~6x, ADM ~1.5x, motion
        # parity with less HBM pressure). Off-TPU the Pallas kernels only run
        # in interpret mode, so everything stays on the XLA path there.
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    ref_core = ref[core]
    dist_core = dist[core]
    if backend in ("pallas", "vif-pallas"):
        # One fused cascade over the full batch (incl. any halo frames):
        # the scale-0 kernel accumulates the motion SAD alongside its five
        # moments, so motion costs no extra HBM pass. VIF rows for halo
        # frames are computed-and-dropped (at most 2 per chunk).
        from pqa2_tpu.ops.motion import features_from_sad_prev
        from pqa2_tpu.ops.pallas_vif import vif_features_pallas

        vif_all, sad = vif_features_pallas(
            ref, dist, gain_limit=vif_gain, variant=vif_variant,
            with_motion=True,
        )
        motion, motion2 = features_from_sad_prev(
            sad[1:], ref.shape[0], has_prev=has_prev, has_next=has_next)
        vif = vif_all[core]
    else:
        # Motion runs on the *reference* luma only (libvmaf semantics).
        motion, motion2 = motion_features(ref, has_prev=has_prev,
                                          has_next=has_next)
        vif = vif_features_batched(ref_core, dist_core, gain_limit=vif_gain,
                                   variant=vif_variant)
    if backend == "pallas":
        from pqa2_tpu.ops.pallas_adm import adm_features_pallas

        adm2 = adm_features_pallas(ref_core, dist_core, gain_limit=adm_gain)
    else:
        adm2 = adm_features_batched(ref_core, dist_core, gain_limit=adm_gain)

    return {
        "adm2": adm2,
        "motion": motion,
        "motion2": motion2,
        "vif_scale0": vif[:, 0],
        "vif_scale1": vif[:, 1],
        "vif_scale2": vif[:, 2],
        "vif_scale3": vif[:, 3],
    }


def fetch_features(feats: Dict[str, "jnp.ndarray"]) -> Dict[str, "np.ndarray"]:
    """Feature dict -> host numpy via ONE packed device->host transfer.

    Fetching the seven (N,) feature arrays individually costs seven device
    round trips per chunk; on tunneled hosts each is a full (flake-prone)
    RTT. One on-device stack + one fetch replaces them."""
    import numpy as np

    keys = sorted(feats)
    packed = np.asarray(jnp.stack([feats[k] for k in keys]))
    return {k: packed[i] for i, k in enumerate(keys)}


def model_feature_params(model, precision: Optional[str] = None) -> Dict[str, object]:
    """Static extraction knobs implied by a VMAFModel's feature_opts.

    NEG models carry vif_enhn_gain_limit / adm_enhn_gain_limit = 1.0
    (models/vmaf_v0.6.1neg.json feature_opts_dicts); float models were trained
    on the classic float VIF statistic, integer models on the integer path.
    The returned "precision" follows the FEATURE_PRECISION policy (default
    "auto": integer models -> the fixed-point path).
    """
    if hasattr(model, "models"):  # BootstrapModel: sub-models share options
        model = model.models[0]
    vif_gain = float(model.feature_opt("vif_scale0", "vif_enhn_gain_limit", float("inf")))
    adm_gain = float(model.feature_opt("adm2", "adm_enhn_gain_limit", 100.0))
    out = {
        "vif_gain": vif_gain,
        "adm_gain": adm_gain,
        "vif_variant": "default" if model.uses_integer_features else "classic",
        "precision": resolve_precision(model, precision),
    }
    if out["precision"] == "integer":
        # Warm the per-backend direct-log2 audit EAGERLY: the jitted
        # extraction cannot probe while tracing and would conservatively
        # fall back to the (slower) breakpoint-fetch engine. Every scorer
        # builder funnels through here before its first trace.
        from pqa2_tpu.ops.pallas_vif_int import log2_direct_exceptions

        log2_direct_exceptions()
    return out
