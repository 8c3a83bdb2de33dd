"""Sharded scoring step.

One jitted program: sharded (N, H, W) ref/dist batches -> per-frame features
-> nu-SVR fusion -> (N,) scores. Shardings are expressed as input/output
constraints on the jit; XLA inserts the collectives (collective-permute for
the motion halo across the data axis, halo exchange for filter pads across
the space axis) — the idiomatic TPU replacement for the reference's
libvmaf thread pool (SURVEY.md section 2.4).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pqa2_tpu.models.loader import BootstrapModel, VMAFModel
from pqa2_tpu.models.registry import get_model
from pqa2_tpu.models.svr import BootstrapPredictor, ScorePredictor
from pqa2_tpu.parallel.mesh import DATA_AXIS, frame_sharding
from pqa2_tpu.pipeline.features import extract_features_batched, model_feature_params


def sharded_extract(
    ref: jax.Array,
    dist: jax.Array,
    mesh: Mesh,
    **feature_params,
) -> Dict[str, jax.Array]:
    """Feature extraction with explicit frame sharding on inputs."""
    sh = frame_sharding(mesh)
    ref = jax.lax.with_sharding_constraint(ref, sh)
    dist = jax.lax.with_sharding_constraint(dist, sh)
    return extract_features_batched(ref, dist, **feature_params)


def make_sharded_scorer(
    mesh: Mesh,
    model: Union[str, VMAFModel, BootstrapModel] = "vmaf_v0.6.1",
    with_psnr_ssim: bool = False,
):
    """Build a jitted sharded scoring step for a mesh + model.

    Returns fn(ref, dist) -> dict with 'vmaf' (N,) + per-feature arrays
    (+ psnr_y/ssim_y when with_psnr_ssim). Inputs are (N, H, W) float32
    batches; place them with parallel.mesh.shard_frames (or let jit move
    them — the constraint inside forces the layout either way).
    """
    mdl = get_model(model) if isinstance(model, str) else model
    params = model_feature_params(mdl)
    predictor = (
        BootstrapPredictor(mdl)
        if isinstance(mdl, BootstrapModel)
        else ScorePredictor(mdl)
    )
    names = mdl.feature_names
    score_sharding = NamedSharding(mesh, P(DATA_AXIS))

    @functools.partial(jax.jit, out_shardings=None)
    def step(ref: jax.Array, dist: jax.Array) -> Dict[str, jax.Array]:
        feats = sharded_extract(ref, dist, mesh, **params)
        x = jnp.stack([feats[k] for k in names], axis=-1)
        if isinstance(mdl, BootstrapModel):
            vmaf, all_scores = predictor(x)
            out = {"vmaf": vmaf, "vmaf_bootstrap": all_scores, **feats}
        else:
            out = {"vmaf": predictor(x), **feats}
        if with_psnr_ssim:
            from pqa2_tpu.ops.psnr import psnr_from_mse
            from pqa2_tpu.ops.ssim import ssim_plane_batched

            d = ref - dist
            mse = jnp.mean(d * d, axis=(-2, -1))
            out["psnr_y"] = psnr_from_mse(mse)
            out["ssim_y"] = ssim_plane_batched(ref, dist)
        out["vmaf"] = jax.lax.with_sharding_constraint(out["vmaf"], score_sharding)
        return out

    return step
