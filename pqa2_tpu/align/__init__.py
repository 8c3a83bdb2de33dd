"""Bookend temporal alignment.

TPU-native rebuild of the reference's OpenCV bookend scan + ffmpeg trim
(app/bookend_alignment.py): one batched device pass computes per-frame luma
mean/std/histogram for the whole capture, every brightness threshold is then
evaluated host-side from the histograms for free, and alignment produces
*frame index ranges* instead of re-encoded files (scoring is in-process, so
no trim/re-encode is needed — SURVEY.md section 2.3 N8/N9).
"""

from pqa2_tpu.align.stats import frame_luma_stats
from pqa2_tpu.align.bookend import (
    Bookend,
    BookendConfig,
    BookendDetector,
    detect_bookends,
)
from pqa2_tpu.align.temporal import (
    AlignmentResult,
    align_bookend_clips,
    refine_offset_xcorr,
)
