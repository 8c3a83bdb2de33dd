"""Batched JAX/XLA implementations of the VMAF feature extractors.

Each op takes luma (or full-plane) batches shaped ``(N, H, W)`` in float32 and
returns per-frame features, replacing the per-frame C loops the reference
delegates to libvmaf/ffmpeg (app/vmaf_analyzer.py:406-419, :1027-1074). The
numerics are validated against the float64 oracles in ``pqa2_tpu.golden``.

Design notes (TPU-first):
  * separable filters are shifted-slice accumulations — pure VPU work that XLA
    fuses into a handful of vectorised passes; no gathers, no dynamic shapes
  * everything is batched over the frame axis so one jit covers a whole chunk
  * reductions come out as small (N,)-vectors; only scores leave the device
"""

from pqa2_tpu.ops.filters import (
    dwt2_batched,
    sep_filter_batched,
)
from pqa2_tpu.ops.vif import vif_features_batched
from pqa2_tpu.ops.adm import adm_features_batched
from pqa2_tpu.ops.motion import blur_batched, motion_features, sad_pairs
from pqa2_tpu.ops.psnr import psnr_planes_batched
from pqa2_tpu.ops.ssim import ssim_plane_batched
from pqa2_tpu.ops.colorspace import (
    chroma_420_to_444,
    chroma_422_to_420,
    chroma_444_to_420,
    planar_to_uyvy422,
    rgb_to_yuv,
    uyvy422_to_planar,
    yuv_to_rgb,
)
