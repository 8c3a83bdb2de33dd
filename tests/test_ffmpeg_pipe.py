"""ffmpeg rawvideo-pipe ingest fallback (io/ffmpeg_pipe.py).

The environment has no real ffmpeg (same as the reference's CI posture), so
the child processes are stub shell scripts: `ffprobe` emits canned JSON,
`ffmpeg` cats a pre-rendered rawvideo byte stream. This exercises the whole
fallback chain — cv2-unreadable container -> probe -> pipe decode ->
planar frames — plus the clean-error path when no binary exists.
Contract: /root/reference/app/utils.py:572-667 (ffmpeg is the reference's
only decode path).
"""

import json
import os
import stat
import subprocess
import sys

import numpy as np
import pytest

from pqa2_tpu.io.ffmpeg_pipe import (
    FFmpegPipeReader,
    probe_stream,
    resolve_ffmpeg,
)
from pqa2_tpu.io.video import VideoReader

W, H, N = 32, 24, 3


def _mk_raw_yuv(tmp_path, rng):
    """N yuv420p frames as one raw byte blob + the per-frame planes."""
    frames = []
    blob = b""
    for i in range(N):
        y = rng.integers(0, 255, (H, W), dtype=np.uint8)
        u = rng.integers(0, 255, (H // 2, W // 2), dtype=np.uint8)
        v = rng.integers(0, 255, (H // 2, W // 2), dtype=np.uint8)
        frames.append({"y": y, "u": u, "v": v})
        blob += y.tobytes() + u.tobytes() + v.tobytes()
    raw = tmp_path / "frames.raw"
    raw.write_bytes(blob)
    return frames, str(raw)


def _mk_stubs(tmp_path, raw_path):
    """Executable ffmpeg/ffprobe stand-ins."""
    probe_json = json.dumps({
        "streams": [{
            "width": W, "height": H, "r_frame_rate": "30/1",
            "avg_frame_rate": "30/1", "nb_frames": str(N),
            "pix_fmt": "yuv420p", "codec_name": "prores",
            "duration": f"{N / 30.0}",
        }]
    })
    ffprobe = tmp_path / "ffprobe"
    ffprobe.write_text(f"#!/bin/sh\ncat <<'EOF'\n{probe_json}\nEOF\n")
    ffmpeg = tmp_path / "ffmpeg"
    ffmpeg.write_text(f"#!/bin/sh\ncat {raw_path}\n")
    for p in (ffprobe, ffmpeg):
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return str(ffmpeg), str(ffprobe)


@pytest.fixture
def stub_env(tmp_path, rng, monkeypatch):
    frames, raw = _mk_raw_yuv(tmp_path, rng)
    ffmpeg, ffprobe = _mk_stubs(tmp_path, raw)
    monkeypatch.setenv("PQA2_FFMPEG", ffmpeg)
    monkeypatch.setenv("PQA2_FFPROBE", ffprobe)
    # A container OpenCV cannot open (garbage bytes, real extension).
    bad = tmp_path / "clip.mkv"
    bad.write_bytes(b"\x00" * 256)
    return frames, str(bad)


def test_pipe_reader_streams_frames(stub_env):
    frames, path = stub_env
    with FFmpegPipeReader(path) as r:
        assert r.width == W and r.height == H and r.bit_depth == 8
        got = list(r)
    assert len(got) == N
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a["y"], b["y"])
        np.testing.assert_array_equal(a["u"], b["u"])
        np.testing.assert_array_equal(a["v"], b["v"])


def test_videoreader_falls_back_to_pipe(stub_env):
    frames, path = stub_env
    with VideoReader(path) as r:
        assert r.info.width == W
        assert r.info.codec == "prores"
        assert r.info.frame_count == N
        got = list(r)
    assert len(got) == N
    np.testing.assert_array_equal(got[-1]["y"], frames[-1]["y"])


def test_probe_stream_ffmpeg_stderr_fallback(tmp_path, monkeypatch):
    """No ffprobe: geometry parsed from `ffmpeg -i` stderr."""
    banner = (
        "Input #0, mov, from 'x.mov':\\n"
        "  Duration: 00:00:01.00, start: 0.0, bitrate: 1000 kb/s\\n"
        "  Stream #0:0: Video: prores (HQ), yuv422p10le, 48x32, "
        "25 fps, 25 tbr\\n"
    )
    ffmpeg = tmp_path / "ffmpeg"
    ffmpeg.write_text(f"#!/bin/sh\nprintf \"{banner}\" >&2\nexit 1\n")
    ffmpeg.chmod(ffmpeg.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PQA2_FFMPEG", str(ffmpeg))
    monkeypatch.delenv("PQA2_FFPROBE", raising=False)
    meta = probe_stream("x.mov")
    assert (meta["width"], meta["height"]) == (48, 32)
    assert meta["frame_rate"] == 25.0
    assert meta["frame_count"] == 25
    assert meta["pix_fmt"] == "yuv422p10le"


def test_clean_error_without_ffmpeg(tmp_path, monkeypatch):
    monkeypatch.delenv("PQA2_FFMPEG", raising=False)
    monkeypatch.delenv("PQA2_FFPROBE", raising=False)
    monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
    assert resolve_ffmpeg() is None
    bad = tmp_path / "clip.mkv"
    bad.write_bytes(b"\x00" * 64)
    with pytest.raises(IOError, match="cannot open video"):
        VideoReader(str(bad))


def test_odd_dimensions_chroma_geometry(tmp_path, rng, monkeypatch):
    """yuv420p chroma planes are ceil/2 — odd-dimension sources must not
    desynchronise the pipe (w*h*3//2 would under-read every frame)."""
    w, h, n = 33, 23, 2
    cw, ch = 17, 12
    frames = []
    blob = b""
    for _ in range(n):
        y = rng.integers(0, 255, (h, w), dtype=np.uint8)
        u = rng.integers(0, 255, (ch, cw), dtype=np.uint8)
        v = rng.integers(0, 255, (ch, cw), dtype=np.uint8)
        frames.append({"y": y, "u": u, "v": v})
        blob += y.tobytes() + u.tobytes() + v.tobytes()
    raw = tmp_path / "odd.raw"
    raw.write_bytes(blob)
    probe_json = json.dumps({"streams": [{
        "width": w, "height": h, "r_frame_rate": "30/1",
        "nb_frames": str(n), "pix_fmt": "yuv420p",
        "codec_name": "prores", "duration": f"{n / 30.0}"}]})
    ffprobe = tmp_path / "ffprobe"
    ffprobe.write_text(f"#!/bin/sh\ncat <<'EOF'\n{probe_json}\nEOF\n")
    ffmpeg = tmp_path / "ffmpeg"
    ffmpeg.write_text(f"#!/bin/sh\ncat {raw}\n")
    for p in (ffprobe, ffmpeg):
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PQA2_FFMPEG", str(ffmpeg))
    monkeypatch.setenv("PQA2_FFPROBE", str(ffprobe))
    with FFmpegPipeReader(str(tmp_path / "odd.mkv")) as r:
        got = list(r)
    assert len(got) == n
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a["y"], b["y"])
        np.testing.assert_array_equal(a["u"], b["u"])
        np.testing.assert_array_equal(a["v"], b["v"])


def test_truncated_pipe_raises(tmp_path, rng, monkeypatch):
    """Mid-frame EOF surfaces as a readable IOError, not a shape error."""
    frames, raw = _mk_raw_yuv(tmp_path, rng)
    # Chop the blob mid-frame.
    blob = open(raw, "rb").read()
    open(raw, "wb").write(blob[: len(blob) - 100])
    ffmpeg, ffprobe = _mk_stubs(tmp_path, raw)
    monkeypatch.setenv("PQA2_FFMPEG", ffmpeg)
    monkeypatch.setenv("PQA2_FFPROBE", ffprobe)
    r = FFmpegPipeReader(str(tmp_path / "x.mkv"))
    with pytest.raises(IOError, match="truncated"):
        list(r)
    r.close()


def test_configured_path_used(tmp_path, rng, monkeypatch):
    """paths.ffmpeg_path (via configure()) resolves without env/PATH."""
    from pqa2_tpu.io import ffmpeg_pipe

    frames, raw = _mk_raw_yuv(tmp_path, rng)
    ffmpeg, _ = _mk_stubs(tmp_path, raw)
    monkeypatch.delenv("PQA2_FFMPEG", raising=False)
    monkeypatch.setenv("PATH", str(tmp_path / "empty"))
    monkeypatch.setitem(ffmpeg_pipe._configured, "ffmpeg", ffmpeg)
    assert resolve_ffmpeg() == ffmpeg
