"""Native C++ frame pump vs the pure-Python y4m reader."""

import numpy as np
import pytest

from pqa2_tpu.io import native
from pqa2_tpu.io.y4m import read_y4m, write_y4m

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="no native toolchain"
)


@pytest.fixture
def y4m_file(tmp_path, rng):
    n, h, w = 7, 32, 48
    frames = [
        {"y": rng.integers(0, 256, (h, w)).astype(np.uint8),
         "u": rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
         "v": rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)}
        for _ in range(n)
    ]
    path = str(tmp_path / "clip.y4m")
    write_y4m(path, frames, fps=(24, 1))
    return path, frames


def test_native_matches_python_reader(y4m_file):
    path, frames = y4m_file
    with native.NativeY4MReader(path) as r:
        assert (r.width, r.height) == (48, 32)
        assert r.fps == pytest.approx(24.0)
        got = list(r)
    assert len(got) == len(frames)
    for a, b in zip(got, frames):
        for p in ("y", "u", "v"):
            np.testing.assert_array_equal(a[p], b[p])


def test_native_batch_read(y4m_file):
    path, frames = y4m_file
    with native.NativeY4MReader(path) as r:
        batch = r.read_batch(4)
        assert len(batch) == 4
        rest = r.read_batch(10)
        assert len(rest) == 3  # eof short-read
    np.testing.assert_array_equal(batch[0]["y"], frames[0]["y"])
    np.testing.assert_array_equal(rest[-1]["y"], frames[-1]["y"])


def test_native_truncated_errors(tmp_path, y4m_file):
    path, _ = y4m_file
    data = open(path, "rb").read()
    trunc = str(tmp_path / "trunc.y4m")
    open(trunc, "wb").write(data[: len(data) - 100])
    with native.NativeY4MReader(trunc) as r:
        with pytest.raises(IOError):
            while r.read_frame() is not None:
                pass


def test_native_missing_file():
    with pytest.raises(IOError):
        native.NativeY4MReader("/nonexistent/file.y4m")


def test_native_writer_byte_identical(tmp_path, rng):
    """The native write pump's output must be byte-for-byte what the pure
    Python Y4MWriter produces (header line, FRAME markers, plane order) —
    8-bit and 10-bit."""
    from pqa2_tpu.io.y4m import Y4MHeader, Y4MWriter

    for depth, cs in ((8, "C420mpeg2"), (10, "C420p10")):
        dt = np.uint8 if depth == 8 else np.uint16
        hi = 256 if depth == 8 else 1024
        n, h, w = 5, 32, 48
        frames = [
            {"y": rng.integers(0, hi, (h, w)).astype(dt),
             "u": rng.integers(0, hi, (h // 2, w // 2)).astype(dt),
             "v": rng.integers(0, hi, (h // 2, w // 2)).astype(dt)}
            for _ in range(n)
        ]
        native_path = str(tmp_path / f"nat{depth}.y4m")
        write_y4m(native_path, frames, fps=(30, 1), colorspace=cs)

        py_path = str(tmp_path / f"py{depth}.y4m")
        header = Y4MHeader(width=w, height=h, fps_num=30, fps_den=1,
                           colorspace=cs)
        with open(py_path, "wb") as f:
            wtr = Y4MWriter(f, header)
            for fr in frames:
                wtr.write_frame(fr)
        assert open(native_path, "rb").read() == open(py_path, "rb").read()


def test_native_writer_roundtrip(tmp_path, rng):
    n, h, w = 4, 24, 32
    frames = [
        {"y": rng.integers(0, 256, (h, w)).astype(np.uint8),
         "u": rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
         "v": rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)}
        for _ in range(n)
    ]
    path = str(tmp_path / "rt.y4m")
    write_y4m(path, frames)
    _, got = read_y4m(path)
    assert len(got) == n
    for a, b in zip(got, frames):
        for p in ("y", "u", "v"):
            np.testing.assert_array_equal(a[p], b[p])
