"""Stage-by-stage on-chip timing of the scoring pipeline.

Answers "where does the per-frame millisecond budget go?" for a given
geometry/precision — the profiling counterpart of bench.py (which times
whole configurations). Times, per stage, best-of-k wall seconds around a
blocked jitted call on device-resident buffers:

  full     extract_features_batched + SVR predict (the bench step)
  vif      fused VIF cascade (+ integer motion SAD when applicable)
  scale0   VIF scale-0 kernel alone (the full-resolution pass)
  adm      fused ADM pyramid
  motion   f32 path's standalone motion kernel (integer fuses into VIF)
  svr      ScorePredictor on staged features
  pad      the reflect-pad + u32 upcast XLA prologue of scale-0 (both
           streams) — the HBM copy the kernels pay before any math

Usage: python tools/profile_pipeline.py [--n 16] [--h 2160] [--w 3840]
       [--precision integer_fast|integer|float] [--iters 4]

Run on the TPU (do not force CPU); one tunnel client at a time.
"""

from __future__ import annotations

import argparse
import sys
import time


def _timed(fn, args, iters):
    import jax

    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--h", type=int, default=2160)
    ap.add_argument("--w", type=int, default=3840)
    ap.add_argument("--precision", default="integer_fast",
                    choices=["integer_fast", "integer", "float"])
    ap.add_argument("--model", default="vmaf_4k_v0.6.1")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args(argv)

    sys.path.insert(0, ".")
    from pqa2_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_clip_u8
    from pqa2_tpu.models.registry import get_model
    from pqa2_tpu.models.svr import ScorePredictor
    from pqa2_tpu.pipeline.features import (
        extract_features_batched,
        model_feature_params,
    )

    n, h, w = args.n, args.h, args.w
    print(f"[profile] backend={jax.default_backend()} "
          f"shape={n}x{h}x{w} precision={args.precision}")

    ref = jax.device_put(jnp.asarray(make_clip_u8(n, h, w, seed=0)))
    dist = jax.device_put(jnp.asarray(make_clip_u8(n, h, w, seed=1)))
    model = get_model(args.model)
    params = model_feature_params(model, args.precision)
    predictor = ScorePredictor(model)

    stages = []

    @jax.jit
    def full(r, d):
        feats = extract_features_batched(r, d, **params)
        x = jnp.stack([feats[k] for k in model.feature_names], axis=-1)
        return predictor(x)

    stages.append(("full", full, (ref, dist)))

    if args.precision in ("integer", "integer_fast"):
        from pqa2_tpu.ops.pallas_adm_int import adm_features_int_pallas
        from pqa2_tpu.ops.pallas_vif_int import (
            vif_features_int_pallas,
            vif_int_scale_pallas,
        )

        exact = args.precision == "integer"
        stages.append((
            "vif+motion",
            jax.jit(lambda r, d: vif_features_int_pallas(
                r, d, with_motion=True, exact=exact)),
            (ref, dist),
        ))
        stages.append((
            "scale0",
            jax.jit(lambda r, d: vif_int_scale_pallas(
                r.astype(jnp.uint32), d.astype(jnp.uint32), 0,
                emit_next=True, with_motion=True, exact_fused=exact)),
            (ref, dist),
        ))
        stages.append((
            "adm",
            jax.jit(lambda r, d: adm_features_int_pallas(r, d)),
            (ref, dist),
        ))
    else:
        from pqa2_tpu.ops.pallas_adm import adm_features_pallas
        from pqa2_tpu.ops.pallas_motion import motion_features_pallas
        from pqa2_tpu.ops.pallas_vif import vif_features_pallas

        reff = ref.astype(jnp.float32)
        distf = dist.astype(jnp.float32)
        stages.append((
            "vif", jax.jit(lambda r, d: vif_features_pallas(r, d)),
            (reff, distf),
        ))
        stages.append((
            "adm", jax.jit(lambda r, d: adm_features_pallas(r, d)),
            (reff, distf),
        ))
        stages.append((
            "motion", jax.jit(lambda r: motion_features_pallas(r)),
            (reff,),
        ))

    feats_np = np.random.default_rng(0).random((n, 6)).astype(np.float32)
    feats_dev = jax.device_put(jnp.asarray(feats_np))
    stages.append(("svr", jax.jit(lambda x: predictor(x)), (feats_dev,)))

    half = 9 // 2  # scale-0 filter half-width

    @jax.jit
    def pad_stage(r, d):
        def p(x):
            x = x.astype(jnp.uint32)
            return jnp.pad(x, ((0, 0), (half, half), (half, half)),
                           mode="reflect")
        return p(r), p(d)

    stages.append(("pad(u32 reflect x2)", pad_stage, (ref, dist)))

    results = {}
    for name, fn, fargs in stages:
        best, compile_s = _timed(fn, fargs, args.iters)
        results[name] = best
        print(f"[profile] {name:22s} {best*1e3:8.1f} ms "
              f"({n/best:7.1f} fps, compile {compile_s:.1f}s)")

    tot = results.get("full")
    if tot:
        print(f"[profile] stage shares of full ({tot*1e3:.1f} ms):")
        for name, t in results.items():
            if name != "full":
                print(f"[profile]   {name:20s} {100.0*t/tot:5.1f}%")


if __name__ == "__main__":
    main()
