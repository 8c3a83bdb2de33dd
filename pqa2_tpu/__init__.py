"""pqa2_tpu — TPU-native full-reference video quality assessment framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
ChromaPQA application (yoseph007/PQA2): VMAF (VIF x4 scales, ADM2, motion2,
nu-SVR fusion), PSNR, SSIM, bookend temporal alignment, capture orchestration,
reporting, and result persistence — with the per-frame feature extraction and
score fusion running as fused JAX/Pallas programs on TPU instead of
ffmpeg/libvmaf subprocesses (reference: app/vmaf_analyzer.py:242-616).

Layout:
  ops/       numeric kernels (VIF, ADM, motion, SSIM, PSNR, colorspace),
             jnp implementations + Pallas TPU kernels
  models/    VMAF model loading (libsvm nu-SVR weights) + score fusion
  pipeline/  jitted end-to-end scoring pipeline, chunked streaming
  parallel/  device mesh, shardings, halo exchange
  align/     bookend detection & temporal alignment
  io/        y4m / raw-YUV / cv2-backed video ingest
  app/       API-compatible engine layer (VMAFAnalyzer, BookendAligner, ...)
  utils/     logging, signals, misc helpers
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level convenience API (keeps bare import light)."""
    if name in ("score_clip", "score_planes", "ClipScores"):
        from pqa2_tpu.pipeline import scoring

        return getattr(scoring, name)
    if name == "stream_score":
        from pqa2_tpu.pipeline.streaming import stream_score

        return stream_score
    if name in ("VMAFAnalyzer", "BookendAligner", "ReferenceAnalyzer"):
        import pqa2_tpu.app as app

        return getattr(app, name)
    if name == "get_model":
        from pqa2_tpu.models.registry import get_model

        return get_model
    raise AttributeError(f"module 'pqa2_tpu' has no attribute {name!r}")
