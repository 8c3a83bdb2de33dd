"""Combined decode-once workflow (app/workflow.py) vs the two-pass path.

The reference AnalysisTab pipeline (app/ui/tabs/analysis_tab.py:174) aligns
to disk then re-reads for scoring; the combined workflow must produce the
same artifacts and (identical trims in, identical frames out) the same
scores.
"""

import os

import numpy as np
import pytest

from pqa2_tpu.app.bookend_aligner import BookendAligner
from pqa2_tpu.app.vmaf_analyzer import VMAFAnalyzer
from pqa2_tpu.app.workflow import run_combined_workflow
from pqa2_tpu.io.y4m import write_y4m


def _mk_frames(ys):
    h, w = ys[0].shape
    return [
        {"y": y,
         "u": np.full((h // 2, w // 2), 128, np.uint8),
         "v": np.full((h // 2, w // 2), 128, np.uint8)}
        for y in ys
    ]


@pytest.fixture
def bookend_pair(tmp_path, rng):
    """(ref_path, cap_path): capture = white bookends + 2 noisy loops."""
    n, h, w = 6, 64, 96
    base = rng.uniform(16, 220, size=(n, h, w))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    ref_y = np.round(base).astype(np.uint8)
    noisy = np.clip(
        ref_y.astype(np.int16) + rng.integers(-4, 5, ref_y.shape), 0, 255
    ).astype(np.uint8)
    white = np.full((h, w), 235, np.uint8)
    cap = ([white] * 5 + list(noisy) + [white] * 5 + list(noisy) + [white] * 5)
    ref_path = str(tmp_path / "ref.y4m")
    cap_path = str(tmp_path / "cap.y4m")
    write_y4m(ref_path, _mk_frames(list(ref_y)))
    write_y4m(cap_path, _mk_frames(cap))
    return ref_path, cap_path


def test_combined_matches_two_pass(bookend_pair, tmp_path):
    ref_path, cap_path = bookend_pair
    out = str(tmp_path / "combined")
    combined = run_combined_workflow(ref_path, cap_path, out_dir=out)
    assert combined is not None
    align = combined["alignment"]
    analysis = combined["analysis"]
    assert align["confidence"] > 0.5
    # Artifact contract: aligned trims exist and are readable.
    assert os.path.exists(align["aligned_reference"])
    assert os.path.exists(align["aligned_captured"])
    assert analysis["frame_count"] == align["ref_range"][1] - align["ref_range"][0]

    # Two-pass: align to disk, re-read, score — must agree bit-for-bit on
    # the trim ranges and to fp tolerance on the score.
    aligner = BookendAligner()
    res = aligner.align_bookend_videos(ref_path, cap_path)
    assert res is not None
    assert res["ref_range"] == align["ref_range"]
    assert res["cap_range"] == align["cap_range"]
    analyzer = VMAFAnalyzer()
    analyzer.set_output_directory(str(tmp_path / "twopass"))
    two = analyzer.analyze_videos(res["aligned_reference"],
                                  res["aligned_captured"])
    assert two is not None
    assert analysis["vmaf_score"] == pytest.approx(two["vmaf_score"], abs=2e-3)
    assert analysis["psnr_score"] == pytest.approx(two["psnr_score"], abs=1e-3)
    assert analysis["ssim_score"] == pytest.approx(two["ssim_score"], abs=1e-4)
    # Same artifact schema as the analyzer path.
    assert os.path.exists(analysis["json_path"])
    assert os.path.exists(analysis["psnr_log"])
    assert os.path.exists(analysis["ssim_log"])


def test_combined_no_artifacts(bookend_pair, tmp_path):
    ref_path, cap_path = bookend_pair
    combined = run_combined_workflow(
        ref_path, cap_path, out_dir=str(tmp_path / "o"), write_aligned=False
    )
    assert combined is not None
    assert combined["alignment"]["aligned_reference"] is None
    assert combined["analysis"]["vmaf_score"] > 0


def test_combined_ten_bit(tmp_path, rng):
    """10-bit pair end-to-end through the combined workflow: depth
    promotion, 8-bit-scale alignment thresholds, C420p10 artifacts,
    native-peak PSNR."""
    n, h, w = 4, 64, 96
    base = rng.uniform(64, 880, size=(n, h, w))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    ref_y = np.round(base).astype(np.uint16)
    noisy = np.clip(ref_y.astype(np.int32)
                    + rng.integers(-16, 17, ref_y.shape), 0, 1023
                    ).astype(np.uint16)
    white = np.full((h, w), 940, np.uint16)  # 235 << 2

    def mk10(ys):
        return [{"y": y,
                 "u": np.full((h // 2, w // 2), 512, np.uint16),
                 "v": np.full((h // 2, w // 2), 512, np.uint16)}
                for y in ys]

    ref_path = str(tmp_path / "ref10.y4m")
    cap_path = str(tmp_path / "cap10.y4m")
    write_y4m(ref_path, mk10(list(ref_y)), colorspace="C420p10")
    write_y4m(cap_path,
              mk10([white] * 5 + list(noisy) + [white] * 5 + list(noisy)
                   + [white] * 5),
              colorspace="C420p10")
    out = run_combined_workflow(ref_path, cap_path,
                                out_dir=str(tmp_path / "o10"))
    assert out is not None
    assert out["alignment"]["confidence"] > 0.5
    assert out["analysis"]["vmaf_score"] > 50
    # PSNR pooled on the native 10-bit peak: mild +-16-LSB noise at peak
    # 1023 lands in the same dB range as +-4 at peak 255.
    assert 30 < out["analysis"]["psnr_score"] < 60
    # Aligned artifacts round-trip as 10-bit.
    from pqa2_tpu.io.video import VideoReader

    with VideoReader(out["alignment"]["aligned_captured"]) as r:
        assert r.info.bit_depth == 10
        fr = r.read_frame()
        assert fr["y"].dtype == np.uint16


def test_combined_missing_file(tmp_path):
    errors = []
    aligner = BookendAligner()
    aligner.error_occurred.connect(errors.append)
    out = run_combined_workflow(
        str(tmp_path / "nope.y4m"), str(tmp_path / "nope2.y4m"),
        aligner=aligner,
    )
    assert out is None
    assert errors and "not found" in errors[0]


def test_combined_workflow_thread_signals(bookend_pair, tmp_path):
    """CombinedWorkflowThread re-exposes both engines' channels and the
    progress handoff mirrors the reference's two-stage chain."""
    from pqa2_tpu.app.workflow import CombinedWorkflowThread

    ref_path, cap_path = bookend_pair
    t = CombinedWorkflowThread(ref_path, cap_path,
                               out_dir=str(tmp_path / "wf"))
    align_done = []
    analysis_done = []
    progress = []
    t.alignment_complete.connect(align_done.append)
    t.analysis_complete.connect(analysis_done.append)
    t.alignment_progress.connect(progress.append)
    t.analysis_progress.connect(progress.append)
    t.start()
    t.join(timeout=300)
    assert not t.is_alive()
    assert t.result is not None
    assert align_done and align_done[0]["confidence"] > 0.5
    assert analysis_done and analysis_done[0]["vmaf_score"] > 0
    assert progress and max(progress) == 100


def test_combined_duration_cap(bookend_pair, tmp_path):
    """duration truncates the scored window (reference analysis_tab
    passes the setup-tab duration to the analyzer)."""
    ref_path, cap_path = bookend_pair
    out = run_combined_workflow(
        ref_path, cap_path, out_dir=str(tmp_path / "d"),
        duration=3 / 30.0,  # 3 frames at 30 fps
    )
    assert out is not None
    assert out["analysis"]["frame_count"] == 3
    r0, r1 = out["alignment"]["ref_range"]
    assert r1 - r0 == 3


def test_oversized_inputs_fall_back_to_two_pass(bookend_pair, tmp_path):
    """Inputs past the memory budget route through align-to-disk +
    streaming scoring (bounded host memory) with the same result shape."""
    ref_path, cap_path = bookend_pair
    analyzer = VMAFAnalyzer()
    analyzer.set_output_directory(str(tmp_path / "tp"))
    out = run_combined_workflow(
        ref_path, cap_path, analyzer=analyzer,
        max_in_memory_bytes=1,  # force the fallback
    )
    assert out is not None
    assert os.path.exists(out["alignment"]["aligned_captured"])
    assert out["analysis"]["vmaf_score"] > 0
    # Agrees with the in-memory path on the alignment decision.
    mem = run_combined_workflow(ref_path, cap_path,
                                out_dir=str(tmp_path / "mem"))
    assert out["alignment"]["cap_range"] == mem["alignment"]["cap_range"]
    assert out["analysis"]["vmaf_score"] == pytest.approx(
        mem["analysis"]["vmaf_score"], abs=2e-3)


def test_combined_subsample(bookend_pair, tmp_path):
    ref_path, cap_path = bookend_pair
    analyzer = VMAFAnalyzer()
    analyzer.feature_subsample = 2
    analyzer.set_output_directory(str(tmp_path / "sub"))
    combined = run_combined_workflow(ref_path, cap_path, analyzer=analyzer)
    assert combined is not None
    n_window = (combined["alignment"]["ref_range"][1]
                - combined["alignment"]["ref_range"][0])
    assert combined["analysis"]["frame_count"] == -(-n_window // 2)
