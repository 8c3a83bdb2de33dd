"""End-to-end jitted scoring pipeline.

frames -> features (VIF x4, ADM2, motion2) -> nu-SVR fusion -> per-frame
scores + pooled metrics, replacing the reference's
``ffmpeg -lavfi libvmaf`` subprocess (app/vmaf_analyzer.py:406-455) with one
fused device program per chunk.
"""

from pqa2_tpu.pipeline.features import extract_features_batched
from pqa2_tpu.pipeline.scoring import ClipScores, score_clip, score_planes
from pqa2_tpu.pipeline.json_out import clip_scores_to_json, write_vmaf_json
