"""Engine-layer (app/) tests: managers, analyzer, aligner, capture, reports.

Covers the reference's integration surface (SURVEY.md section 4): results
dict schema (app/vmaf_analyzer.py:918-932), signal contracts, on-disk
artifacts, options persistence, fake capture backend.
"""

import json
import os

import numpy as np
import pytest

from pqa2_tpu.app import (
    BookendAligner,
    CaptureManager,
    CaptureState,
    FileManager,
    OptionsManager,
    ReferenceAnalyzer,
    ReportGenerator,
    VMAFAnalyzer,
)
from pqa2_tpu.app.capture import FilePlaybackBackend
from pqa2_tpu.app.utils import validate_application_state
from pqa2_tpu.io.y4m import write_y4m


@pytest.fixture
def clip_pair(tmp_path, rng):
    n, h, w = 4, 64, 96
    base = rng.uniform(16, 235, size=(n, h, w))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    ref_y = np.round(base).astype(np.uint8)
    dist_y = np.clip(
        ref_y.astype(np.int16) + rng.integers(-5, 6, ref_y.shape), 0, 255
    ).astype(np.uint8)

    def mk(ys):
        return [
            {"y": ys[i],
             "u": np.full((h // 2, w // 2), 128, np.uint8),
             "v": np.full((h // 2, w // 2), 128, np.uint8)}
            for i in range(n)
        ]

    ref_path = str(tmp_path / "ref.y4m")
    dist_path = str(tmp_path / "dist.y4m")
    write_y4m(ref_path, mk(ref_y))
    write_y4m(dist_path, mk(dist_y))
    return ref_path, dist_path


def test_options_manager_roundtrip(tmp_path):
    f = str(tmp_path / "settings.json")
    om = OptionsManager(settings_file=f, save_debounce_s=0)
    assert om.get_setting("bookend", "white_threshold") == 200
    assert om.get_setting("vmaf", "default_model") == "vmaf_v0.6.1"
    assert om.get_setting("tpu", "chunk_size") == 32

    events = []
    om.settings_updated.connect(lambda s: events.append(s))
    om.update_setting("vmaf", "pool_method", "min")
    assert events and events[-1]["vmaf"]["pool_method"] == "min"

    om2 = OptionsManager(settings_file=f)
    assert om2.get_setting("vmaf", "pool_method") == "min"

    # backfill: drop a key from the file, reload restores the default
    data = json.load(open(f))
    del data["vmaf"]["pool_method"]
    json.dump(data, open(f, "w"))
    om3 = OptionsManager(settings_file=f)
    assert om3.get_setting("vmaf", "pool_method") == "mean"

    om3.reset_to_defaults()
    assert om3.get_setting("vmaf", "pool_method") == "mean"


def test_file_manager(tmp_path):
    fm = FileManager(base_dir=str(tmp_path / "results"))
    p = fm.get_temp_path("x.txt")
    open(p, "w").write("hi")
    d = fm.get_test_dir("My Test!", timestamp="20260101_000000")
    assert d.endswith("My_Test_20260101_000000")
    assert os.path.isdir(d)
    fm.cleanup_temp_files()
    assert not os.path.exists(p)


def test_validate_application_state(tmp_path):
    checks = validate_application_state()
    assert checks["models_available"]
    assert checks["temp_writable"]
    assert checks["jax_devices"]


@pytest.mark.smoke
def test_vmaf_analyzer_end_to_end(clip_pair, tmp_path):
    ref_path, dist_path = clip_pair
    analyzer = VMAFAnalyzer()
    analyzer.set_output_directory(str(tmp_path / "out"))
    analyzer.set_test_name("t1")
    progress, statuses, completed = [], [], []
    analyzer.analysis_progress.connect(progress.append)
    analyzer.status_update.connect(statuses.append)
    analyzer.analysis_complete.connect(completed.append)

    results = analyzer.analyze_videos(ref_path, dist_path)
    assert results is not None
    # Results-dict schema parity (app/vmaf_analyzer.py:918-932).
    for key in ("vmaf_score", "psnr_score", "ssim_score", "json_path",
                "psnr_log", "ssim_log", "reference_video", "distorted_video",
                "raw_results", "model", "width", "height"):
        assert key in results, key
    assert 0 <= results["vmaf_score"] <= 100
    assert completed and completed[0] is results
    assert progress[-1] == 100

    # On-disk artifacts.
    assert os.path.exists(results["json_path"])
    obj = json.load(open(results["json_path"]))
    assert "pooled_metrics" in obj and "frames" in obj
    psnr_txt = open(results["psnr_log"]).read()
    assert psnr_txt.startswith("n:1 mse_avg:")
    assert "average" in psnr_txt.lower() and "psnr" in psnr_txt.lower()
    ssim_txt = open(results["ssim_log"]).read()
    assert "All:" in ssim_txt and "average" in ssim_txt.lower()


def test_vmaf_analyzer_missing_file_fails(tmp_path):
    analyzer = VMAFAnalyzer()
    errors = []
    analyzer.analysis_failed.connect(errors.append)
    assert analyzer.analyze_videos("/nope/a.y4m", "/nope/b.y4m") is None
    assert errors


def test_capture_then_align_then_score(clip_pair, tmp_path):
    """The combined workflow: fake capture -> bookend align -> VMAF."""
    ref_path, _ = clip_pair
    om = OptionsManager(settings_file=str(tmp_path / "s.json"), save_debounce_s=0)
    om.update_setting("bookend", "frame_offset", 0)
    om.update_setting("bookend", "min_capture_time", 1)

    cm = CaptureManager(
        options_manager=om,
        backend=FilePlaybackBackend(noise_sigma=1.5),
    )
    cm.set_output_directory(str(tmp_path / "cap"))
    cm.set_test_name("capture")
    cm.set_reference_video({
        "path": ref_path, "duration": 4 / 30.0, "frame_rate": 30.0,
    })
    finished = []
    cm.capture_finished.connect(lambda ok, p: finished.append((ok, p)))
    assert cm.start_bookend_capture("Fake Device")
    assert cm.wait(timeout=60)
    assert finished and finished[0][0], finished
    cap_path = finished[0][1]
    assert os.path.exists(cap_path)
    assert cm.state == CaptureState.COMPLETED

    aligner = BookendAligner(options_manager=om)
    res = aligner.align_bookend_videos(ref_path, cap_path)
    assert res is not None
    assert os.path.exists(res["aligned_reference"])
    assert os.path.exists(res["aligned_captured"])
    assert res["confidence"] > 0.5

    analyzer = VMAFAnalyzer(om)
    analyzer.set_output_directory(str(tmp_path / "out"))
    results = analyzer.analyze_videos(
        res["aligned_reference"], res["aligned_captured"]
    )
    assert results is not None
    assert results["vmaf_score"] > 50  # mild noise only


def test_reference_analyzer(clip_pair):
    ref_path, _ = clip_pair
    ra = ReferenceAnalyzer()
    done = []
    ra.analysis_complete.connect(done.append)
    info = ra.get_video_info(ref_path)
    assert info is not None
    assert info["width"] == 96 and info["height"] == 64
    assert info["has_bookends"] is False
    assert done


def test_report_generator(clip_pair, tmp_path):
    ref_path, dist_path = clip_pair
    analyzer = VMAFAnalyzer()
    analyzer.set_output_directory(str(tmp_path / "out"))
    results = analyzer.analyze_videos(ref_path, dist_path)

    gen = ReportGenerator()
    pdf = gen.generate_report(results, str(tmp_path / "report.pdf"),
                              test_metadata={"tester_name": "QA"})
    assert pdf and os.path.getsize(pdf) > 1000
    html_p = gen.generate_html_report(results, str(tmp_path / "report.html"))
    assert html_p and "VMAF" in open(html_p).read()
    csv_p = gen.export_csv(results, str(tmp_path / "frames.csv"))
    text = open(csv_p).read()
    assert "vmaf_score" in text and "frame" in text


def test_aligner_motion_compensation(clip_pair, tmp_path):
    """A capture whose content is spatially shifted scores much better with
    bookend.motion_compensation enabled."""
    ref_path, _ = clip_pair
    from pqa2_tpu.io.video import VideoReader
    from pqa2_tpu.io.y4m import write_y4m

    with VideoReader(ref_path) as r:
        ref_frames = list(r)
    white = {k: np.full_like(v, 235 if k == "y" else 128)
             for k, v in ref_frames[0].items()}
    shifted = [
        {"y": np.roll(f["y"], (2, 6), axis=(0, 1)),
         "u": np.roll(f["u"], (1, 3), axis=(0, 1)),
         "v": np.roll(f["v"], (1, 3), axis=(0, 1))}
        for f in ref_frames
    ]
    cap = [white] * 5 + shifted + [white] * 5
    cap_path = str(tmp_path / "cap_shifted.y4m")
    write_y4m(cap_path, cap)

    om = OptionsManager(settings_file=str(tmp_path / "s.json"), save_debounce_s=0)
    om.update_setting("bookend", "frame_offset", 0)
    om.update_setting("bookend", "motion_compensation", True)
    aligner = BookendAligner(options_manager=om)
    res = aligner.align_bookend_videos(ref_path, cap_path)
    assert res is not None
    assert res["bookend_info"]["motion_compensated"] is True

    analyzer = VMAFAnalyzer()
    analyzer.set_output_directory(str(tmp_path / "out"))
    results = analyzer.analyze_videos(res["aligned_reference"], res["aligned_captured"])
    # Without compensation a 6px shift destroys VIF/ADM; with it the pair is
    # near-identical away from the refilled border strips.
    assert results["vmaf_score"] > 80, results["vmaf_score"]


def test_device_discovery_fallbacks():
    """No ffmpeg / no hardware here -> reference fallback tables."""
    from pqa2_tpu.app.devices import (
        get_decklink_devices, get_decklink_formats,
        get_default_intensity_shuttle_formats, map_format_code,
        test_device_connection,
    )

    devices = get_decklink_devices()
    assert "Intensity Shuttle" in devices

    fm = get_decklink_formats("Intensity Shuttle")
    assert any(f["id"] == "Hp29" for f in fm["formats"])
    table = get_default_intensity_shuttle_formats()
    assert table["format_map"]["1920x1080"]

    props = map_format_code("Hp29")
    assert props["width"] == 1920 and props["frame_rate"] == 29.97
    assert map_format_code("nope") is None

    status = test_device_connection("Intensity Shuttle")
    assert status["connected"] is False  # no card in this environment

    om = OptionsManager(settings_file="/tmp/pqa2_devtest_settings.json",
                        save_debounce_s=0)
    assert om.get_decklink_devices() == devices


def test_capture_preview_frames():
    import time as _time

    cm = CaptureManager()
    frames = []
    cm.frame_available.connect(frames.append)
    cm.start_preview(fps=30.0)
    # Deadline-based, not fixed-sleep: on a loaded single-CPU host the
    # preview thread may be starved well past the nominal frame period.
    deadline = _time.monotonic() + 10.0
    while len(frames) < 2 and _time.monotonic() < deadline:
        _time.sleep(0.05)
    cm.stop_preview()
    assert len(frames) >= 2
    assert frames[0].shape == (180, 320)
    # preview restartable
    frames.clear()
    cm.start_preview(fps=30.0)
    deadline = _time.monotonic() + 10.0
    while not frames and _time.monotonic() < deadline:
        _time.sleep(0.05)
    cm.stop_preview()
    assert frames
