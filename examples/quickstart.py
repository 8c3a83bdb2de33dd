"""Runnable tour of the pqa2_tpu Python API — no external assets needed.

Synthesises a reference/distorted y4m pair, then drives the main entry
points a reference-app user would reach for:

  1. ``score_clip``      — the jitted scoring pipeline (luma in, VMAF out)
  2. precision A/B       — integer_fast (default) vs exact vs float
  3. ``VMAFAnalyzer``    — the engine-layer facade on files (+ JSON artifact)
  4. bookend alignment   — white-flash capture simulation -> aligned window
  5. sharded scoring     — the same step over a multi-device mesh

Run from the repo root:

    python examples/quickstart.py            # TPU if available, else CPU
    JAX_PLATFORMS=cpu python examples/quickstart.py

On a CPU-only host the Pallas kernels run in interpret mode automatically;
small shapes keep every stage under a minute. See README.md for the CLI
equivalents (``python -m pqa2_tpu.cli score/full/capture/batch``).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Honor JAX_PLATFORMS even on hosts whose interpreter startup registers a
# TPU plugin and pins the platform programmatically (overriding the env
# var) — same workaround as tests/conftest.py.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def make_pair(n=6, h=144, w=192, seed=0):
    """Synthetic luma: smooth gradient + texture, distorted with noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 110 + 70 * np.sin(2 * np.pi * xx / w) * np.cos(2 * np.pi * yy / h)
    tex = rng.standard_normal((n, h, w)) * 12.0
    ref = np.clip(base[None] + tex, 0, 255).astype(np.uint8)
    dist = np.clip(
        ref.astype(np.int16) + rng.integers(-10, 11, ref.shape), 0, 255
    ).astype(np.uint8)
    return ref, dist


def main():
    out_dir = tempfile.mkdtemp(prefix="pqa2_quickstart_")
    ref, dist = make_pair()
    n, h, w = ref.shape

    # -- 1. the jitted scoring pipeline on luma batches -------------------
    from pqa2_tpu.pipeline import score_clip

    scores = score_clip(ref, dist, model="vmaf_v0.6.1")
    pooled = scores.pooled_all()
    print(f"[1] score_clip: per-frame vmaf {np.round(scores.vmaf, 2)}")
    print(f"    pooled mean {pooled['vmaf']['mean']:.3f} "
          f"harmonic {pooled['vmaf']['harmonic_mean']:.3f}")

    # -- 2. precision A/B: default fast statistic vs exact vs float -------
    fast = score_clip(ref, dist, precision="integer_fast").vmaf.mean()
    exact = score_clip(ref, dist, precision="integer").vmaf.mean()
    f32 = score_clip(ref, dist, precision="float").vmaf.mean()
    print(f"[2] precision A/B: integer_fast {fast:.4f}  "
          f"exact {exact:.4f}  float {f32:.4f}")
    assert abs(fast - exact) < 1e-2  # docs/CALIBRATION.md contract

    # -- 3. the engine-layer facade on real files -------------------------
    from pqa2_tpu.app import VMAFAnalyzer
    from pqa2_tpu.io import write_y4m

    u = np.full((h // 2, w // 2), 128, np.uint8)
    to_frames = lambda Y: [{"y": Y[i], "u": u, "v": u} for i in range(n)]
    ref_path = os.path.join(out_dir, "ref.y4m")
    dist_path = os.path.join(out_dir, "dist.y4m")
    write_y4m(ref_path, to_frames(ref), fps=(30, 1))
    write_y4m(dist_path, to_frames(dist), fps=(30, 1))

    analyzer = VMAFAnalyzer()
    analyzer.analysis_complete.connect(
        lambda r: print(f"[3] analyzer signal: vmaf {r['vmaf_score']:.3f}"))
    result = analyzer.analyze_videos(ref_path, dist_path)
    print(f"    libvmaf-schema JSON: {result['json_path']}")

    # -- 4. bookend alignment of a simulated capture ----------------------
    from pqa2_tpu.align import align_bookend_clips

    white = np.full((5, h, w), 235, np.uint8)  # white bookends
    capture = np.concatenate([white, ref, white, ref, white])
    # Expect a window inside 5..11: the detector keeps the reference app's
    # ~1.5-frame safety buffer next to each bookend, which visibly trims a
    # 6-frame toy loop (real captures lose the same 2 frames out of
    # hundreds); xcorr refinement then re-anchors the start frame.
    al = align_bookend_clips(ref, capture, fps=30.0)
    print(f"[4] bookend alignment: method {al.alignment_method!r}, capture "
          f"frames {al.cap_range[0]}..{al.cap_range[1]} "
          f"(confidence {al.confidence:.3f})")

    # -- 5. the same scoring step sharded over a device mesh --------------
    import jax

    if len(jax.devices()) > 1:
        from pqa2_tpu.parallel import make_mesh, score_clip_sharded

        mesh = make_mesh()
        out = score_clip_sharded(ref, dist, mesh)  # pads odd N internally
        print(f"[5] sharded over {len(jax.devices())} devices: "
              f"vmaf mean {np.asarray(out['vmaf']).mean():.3f}")
    else:
        print("[5] single device — start with "
              "XLA_FLAGS=--xla_force_host_platform_device_count=8 "
              "JAX_PLATFORMS=cpu to try the mesh path")

    print(f"artifacts in {out_dir}")


if __name__ == "__main__":
    main()
