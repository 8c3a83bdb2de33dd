"""NumPy oracle implementations of every metric kernel.

These are the *specification* of the math (float64, loop-free but unoptimised
numpy): the JAX/Pallas device kernels in pqa2_tpu/ops are validated against
this package in tests. The algorithms reimplement, from the published VMAF
algorithm definitions and model contracts, the features the reference app
obtains from ffmpeg/libvmaf subprocesses (app/vmaf_analyzer.py:372-419):
VIF (4 scales), ADM2 (DLM), motion2, ffmpeg-variant SSIM, and PSNR.

Known calibration points vs libvmaf's C implementations are documented in
docs/CALIBRATION.md.
"""

from pqa2_tpu.golden.vif import vif_features
from pqa2_tpu.golden.adm import adm_features
from pqa2_tpu.golden.motion import motion_features
from pqa2_tpu.golden.ssim import ssim_frame
from pqa2_tpu.golden.psnr import psnr_frame

__all__ = [
    "vif_features",
    "adm_features",
    "motion_features",
    "ssim_frame",
    "psnr_frame",
]
