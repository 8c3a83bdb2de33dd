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
    bit_depth: int = 8,
    **feature_params,
) -> Dict[str, jax.Array]:
    """Feature extraction with explicit frame sharding on inputs.

    Forces the XLA kernel backend: SPMD-partitioned programs can't split a
    Pallas custom call, so the pjit path must stay on ops the partitioner
    understands (it inserts the motion collective-permute and the space-axis
    filter halos itself). The Pallas kernels scale across chips via
    make_shardmap_scorer below instead."""
    sh = frame_sharding(mesh)
    ref = jax.lax.with_sharding_constraint(ref, sh)
    dist = jax.lax.with_sharding_constraint(dist, sh)
    feature_params = dict(feature_params, backend="xla")
    return extract_features_batched(ref, dist, bit_depth=bit_depth,
                                    **feature_params)


def make_sharded_scorer(
    mesh: Mesh,
    model: Union[str, VMAFModel, BootstrapModel] = "vmaf_v0.6.1",
    with_psnr_ssim: bool = False,
    precision: Optional[str] = None,
    bit_depth: int = 8,
):
    """Build a jitted sharded scoring step for a mesh + model.

    Returns fn(ref, dist) -> dict with 'vmaf' (N,) + per-feature arrays
    (+ psnr_y/ssim_y when with_psnr_ssim). Inputs are (N, H, W) float32
    batches; place them with parallel.mesh.shard_frames (or let jit move
    them — the constraint inside forces the layout either way).

    >8-bit sources: pass luma on the 8-bit scale with ``bit_depth`` set —
    the integer feature path recovers native codes, PSNR uses the native
    peak and SSIM ffmpeg's native-max constants (the stream_score rules).
    """
    mdl = get_model(model) if isinstance(model, str) else model
    params = model_feature_params(mdl, precision)
    predictor = (
        BootstrapPredictor(mdl)
        if isinstance(mdl, BootstrapModel)
        else ScorePredictor(mdl)
    )
    names = mdl.feature_names
    score_sharding = NamedSharding(mesh, P(DATA_AXIS))

    @functools.partial(jax.jit, out_shardings=None)
    def step(ref: jax.Array, dist: jax.Array) -> Dict[str, jax.Array]:
        feats = sharded_extract(ref, dist, mesh, bit_depth=bit_depth,
                                **params)
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
            # mse is on the 8-bit scale; the native peak lands there as
            # ((1<<d)-1)/2^(d-8) (255.75 for 10-bit) — stream_score's rule.
            peak8 = ((1 << bit_depth) - 1) / float(1 << (bit_depth - 8))
            out["psnr_y"] = psnr_from_mse(mse, max_value=peak8)
            out["ssim_y"] = ssim_plane_batched(ref, dist,
                                               bit_depth=bit_depth)
        out["vmaf"] = jax.lax.with_sharding_constraint(out["vmaf"], score_sharding)
        return out

    return step


def make_shardmap_scorer(
    mesh: Mesh,
    model: Union[str, VMAFModel, BootstrapModel] = "vmaf_v0.6.1",
    precision: Optional[str] = None,
    bit_depth: int = 8,
):
    """Frame-parallel scorer that runs the fused Pallas kernels per shard.

    shard_map splits the frame batch over the "data" axis and runs ordinary
    single-device code per shard, so the Pallas kernel path (which the SPMD
    partitioner cannot split — see sharded_extract) scales across chips. The
    motion halo is one explicit `ppermute` of the shard-edge reference
    frames; every other feature is frame-local.

    The mesh must put all devices on "data" (space=1); N must divide by the
    data axis. Returns fn(ref, dist) -> dict with 'vmaf' + per-feature
    arrays, all (N,).
    """
    try:
        from jax import shard_map  # jax >= 0.6 public API
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map  # type: ignore

    from jax.sharding import PartitionSpec

    if mesh.shape.get("space", 1) != 1:
        raise ValueError("make_shardmap_scorer needs a data-only mesh "
                         "(space=1); use make_sharded_scorer for 2-D")
    mdl = get_model(model) if isinstance(model, str) else model
    params = model_feature_params(mdl, precision)
    predictor = (
        BootstrapPredictor(mdl)
        if isinstance(mdl, BootstrapModel)
        else ScorePredictor(mdl)
    )
    names = mdl.feature_names
    nd = mesh.shape[DATA_AXIS]
    spec = PartitionSpec(DATA_AXIS)

    def local(ref_blk: jax.Array, dist_blk: jax.Array):
        # (B, H, W) local frames; attach one ref halo frame each side. The
        # first shard duplicates its own first frame (SAD 0 -> the exact
        # clip-start semantics); the last shard's trailing halo is fixed up
        # globally below.
        if nd > 1:
            i = jax.lax.axis_index(DATA_AXIS)
            fwd = [(s, s + 1) for s in range(nd - 1)]
            bwd = [(s + 1, s) for s in range(nd - 1)]
            prev_tail = jax.lax.ppermute(ref_blk[-1], DATA_AXIS, fwd)
            next_head = jax.lax.ppermute(ref_blk[0], DATA_AXIS, bwd)
            prev = jnp.where(i == 0, ref_blk[0], prev_tail)
            nxt = jnp.where(i == nd - 1, ref_blk[-1], next_head)
        else:
            prev, nxt = ref_blk[0], ref_blk[-1]
        ref_full = jnp.concatenate([prev[None], ref_blk, nxt[None]])
        # dist halos are only sliced off again (VIF/ADM are frame-local).
        dist_full = jnp.concatenate([dist_blk[:1], dist_blk, dist_blk[-1:]])
        return extract_features_batched(
            ref_full, dist_full, has_prev=True, has_next=True,
            bit_depth=bit_depth, **params
        )

    @jax.jit
    def step(ref: jax.Array, dist: jax.Array) -> Dict[str, jax.Array]:
        feats = shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec), out_specs=spec,
        )(ref, dist)
        # Global clip end: the duplicated trailing halo gave the last frame a
        # zero forward SAD; restore motion2[last] = sad(last-1, last).
        feats = dict(feats)
        feats["motion2"] = feats["motion2"].at[-1].set(feats["motion"][-1])
        x = jnp.stack([feats[k] for k in names], axis=-1)
        if isinstance(mdl, BootstrapModel):
            vmaf, all_scores = predictor(x)
            return {"vmaf": vmaf, "vmaf_bootstrap": all_scores, **feats}
        return {"vmaf": predictor(x), **feats}

    return step


def score_clip_sharded(
    ref_luma,
    dist_luma,
    mesh: Mesh,
    model: Union[str, VMAFModel, BootstrapModel] = "vmaf_v0.6.1",
    precision: Optional[str] = None,
    scorer=None,
    bit_depth: int = 8,
):
    """Whole-clip scoring over the mesh's data axis for arbitrary N.

    >8-bit sources: pass luma as f32 on the 8-bit scale (codes /
    2^(depth-8)) with ``bit_depth`` set, the pipeline-wide convention
    (pipeline/features.py docstring).

    Pads the frame batch up to a multiple of the data-axis size by
    repeating the last frame (shard_map needs even shards), runs the
    Pallas-per-shard scorer (make_shardmap_scorer), and drops the pad
    frames. The pad duplicates give the last REAL frame a zero forward
    SAD, so its motion2 is restored to clip-end semantics (= motion) and
    its score re-predicted host-side from the corrected feature vector —
    identical math to the device predictor.

    Pass ``scorer`` (a make_shardmap_scorer result) to amortise the
    compile across clips of equal geometry — the batch ladder does.
    Returns {"vmaf": (N,), <feature>: (N,), "n_frames": N}.
    """
    import numpy as np

    from pqa2_tpu.parallel.mesh import shard_frames

    mdl = get_model(model) if isinstance(model, str) else model
    nd = mesh.shape[DATA_AXIS]
    n = int(ref_luma.shape[0])
    pad = (-n) % nd
    if pad:
        ref_luma = jnp.concatenate(
            [jnp.asarray(ref_luma)] + [jnp.asarray(ref_luma[-1:])] * pad)
        dist_luma = jnp.concatenate(
            [jnp.asarray(dist_luma)] + [jnp.asarray(dist_luma[-1:])] * pad)
    if scorer is None:
        scorer = make_shardmap_scorer(mesh, mdl, precision,
                                      bit_depth=bit_depth)
    out = scorer(shard_frames(ref_luma, mesh), shard_frames(dist_luma, mesh))
    # Writable host copies (np.asarray of a jax array is read-only).
    res = {k: np.array(v)[..., :n] if k == "vmaf_bootstrap"
           else np.array(v)[:n] for k, v in out.items()}
    if pad:
        res["motion2"][n - 1] = res["motion"][n - 1]
        names = mdl.feature_names
        x = np.stack([res[k][n - 1] for k in names])[None, :]
        predictor = (
            BootstrapPredictor(mdl)
            if isinstance(mdl, BootstrapModel)
            else ScorePredictor(mdl)
        )
        fix = predictor(jnp.asarray(x, jnp.float32))
        if isinstance(mdl, BootstrapModel):
            res["vmaf"][n - 1] = float(np.asarray(fix[0])[0])
            res["vmaf_bootstrap"][:, n - 1] = np.asarray(fix[1])[:, 0]
        else:
            res["vmaf"][n - 1] = float(np.asarray(fix)[0])
    res["n_frames"] = n
    return res
