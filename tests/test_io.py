"""y4m / video ingest tests."""

import io

import numpy as np
import pytest

from pqa2_tpu.io.y4m import Y4MHeader, Y4MReader, read_y4m, write_y4m
from pqa2_tpu.io.video import VideoReader, probe_video


def synth_frames(rng, n=5, h=48, w=64):
    frames = []
    for i in range(n):
        frames.append(
            {
                "y": rng.integers(0, 256, (h, w), dtype=np.uint8),
                "u": rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
                "v": rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
            }
        )
    return frames


def test_y4m_roundtrip(tmp_path, rng):
    frames = synth_frames(rng)
    path = tmp_path / "clip.y4m"
    write_y4m(path, frames, fps=(30000, 1001))
    header, back = read_y4m(path)
    assert header.width == 64 and header.height == 48
    assert header.fps == pytest.approx(29.97, abs=0.01)
    assert len(back) == len(frames)
    for a, b in zip(frames, back):
        for p in ("y", "u", "v"):
            np.testing.assert_array_equal(a[p], b[p])


def test_y4m_header_parsing():
    hdr = b"YUV4MPEG2 W1920 H1080 F30000:1001 Ip A1:1 C420mpeg2\n"
    r = Y4MReader(io.BytesIO(hdr))
    h = r.header
    assert (h.width, h.height) == (1920, 1080)
    assert h.pix_fmt == "yuv420p"
    assert h.bit_depth == 8
    assert h.chroma_shape == (540, 960)


def test_y4m_high_bitdepth_header():
    h = Y4MHeader(width=640, height=480, fps_num=24, fps_den=1, colorspace="C420p10")
    assert h.bit_depth == 10
    assert h.pix_fmt == "yuv420p10le"


def test_probe_video_y4m(tmp_path, rng):
    frames = synth_frames(rng, n=7)
    path = tmp_path / "clip.y4m"
    write_y4m(path, frames, fps=(25, 1))
    info = probe_video(str(path))
    assert info["frame_count"] == 7
    assert info["width"] == 64 and info["height"] == 48
    assert info["frame_rate"] == 25.0
    assert info["duration"] == pytest.approx(7 / 25)


def test_video_reader_iterates(tmp_path, rng):
    frames = synth_frames(rng, n=3)
    path = tmp_path / "clip.y4m"
    write_y4m(path, frames)
    with VideoReader(str(path)) as r:
        got = list(r)
    assert len(got) == 3
    np.testing.assert_array_equal(got[1]["y"], frames[1]["y"])


def test_cv2_ingest_path(tmp_path, rng):
    """Non-y4m containers decode through the OpenCV-backed reader."""
    import cv2

    from pqa2_tpu.io.video import VideoReader, probe_video

    p = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48))
    assert w.isOpened()
    frames_bgr = []
    for i in range(6):
        f = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
        frames_bgr.append(f)
        w.write(f)
    w.release()

    info = probe_video(p)
    assert info["width"] == 64 and info["height"] == 48
    assert info["frame_count"] == 6
    with VideoReader(p) as r:
        decoded = list(r)
    assert len(decoded) == 6
    y = decoded[0]["y"]
    assert y.shape == (48, 64)
    assert decoded[0]["u"].shape == (24, 32)
    # MJPG is lossy; luma should still correlate strongly with the source.
    src_y = cv2.cvtColor(frames_bgr[0], cv2.COLOR_BGR2YUV)[:, :, 0]
    cc = np.corrcoef(y.ravel().astype(float), src_y.ravel().astype(float))[0, 1]
    assert cc > 0.9, cc


def test_cv2_scoring_end_to_end(tmp_path, rng):
    """Score a lossy AVI against its y4m source through VMAFAnalyzer."""
    import cv2

    from pqa2_tpu.app.vmaf_analyzer import VMAFAnalyzer
    from pqa2_tpu.io.video import VideoReader
    from pqa2_tpu.io.y4m import write_y4m

    n, h, w = 4, 48, 64
    avi = str(tmp_path / "dist.avi")
    vw = cv2.VideoWriter(avi, cv2.VideoWriter_fourcc(*"MJPG"), 30, (w, h))
    base = rng.uniform(60, 200, (n, h, w))
    for _ in range(2):
        base = (base + np.roll(base, 1, -1) + np.roll(base, -1, -1)
                + np.roll(base, 1, -2) + np.roll(base, -1, -2)) / 5.0
    for i in range(n):
        bgr = np.repeat(np.round(base[i]).astype(np.uint8)[:, :, None], 3, 2)
        vw.write(bgr)
    vw.release()

    # Reference = decoded AVI itself written to y4m (so scores are ~perfect).
    with VideoReader(avi) as r:
        decoded = list(r)
    ref = str(tmp_path / "ref.y4m")
    write_y4m(ref, decoded)

    analyzer = VMAFAnalyzer()
    analyzer.set_output_directory(str(tmp_path / "out"))
    results = analyzer.analyze_videos(ref, avi)
    assert results is not None
    assert results["vmaf_score"] > 93, results["vmaf_score"]


def test_validate_and_repair(tmp_path, rng):
    from pqa2_tpu.io.repair import repair_video_file, validate_video_file
    from pqa2_tpu.io.y4m import write_y4m

    n, h, w = 5, 32, 48
    frames = [
        {"y": rng.integers(0, 256, (h, w)).astype(np.uint8),
         "u": rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
         "v": rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)}
        for _ in range(n)
    ]
    good = str(tmp_path / "good.y4m")
    write_y4m(good, frames)
    assert validate_video_file(good)
    assert not validate_video_file(str(tmp_path / "missing.y4m"))
    empty = str(tmp_path / "empty.y4m")
    open(empty, "wb").close()
    assert not validate_video_file(empty)

    # Truncate mid-frame: salvage keeps the good prefix.
    data = open(good, "rb").read()
    trunc = str(tmp_path / "trunc.y4m")
    open(trunc, "wb").write(data[: len(data) - 300])
    repaired = repair_video_file(trunc)
    assert repaired and validate_video_file(repaired)
    from pqa2_tpu.io.y4m import read_y4m

    _, rec = read_y4m(repaired)
    assert len(rec) == n - 1
    np.testing.assert_array_equal(rec[0]["y"], frames[0]["y"])
