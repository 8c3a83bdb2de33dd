"""Memory-bounded streamed alignment (align/streamed.py) vs the in-memory
path: identical signals, identical decisions, depth-correct trims."""

import numpy as np
import pytest

from pqa2_tpu.align.stats import frame_luma_stats, stats_and_thumbs
from pqa2_tpu.align.streamed import (
    streamed_align,
    streamed_stats_thumbs,
    write_trim,
)
from pqa2_tpu.align.temporal import align_bookend_clips
from pqa2_tpu.io.y4m import read_y4m, write_y4m


def _mk(ys, depth=8):
    h, w = ys[0].shape
    dt = np.uint8 if depth == 8 else np.uint16
    mid = 128 if depth == 8 else 512
    return [{"y": y.astype(dt),
             "u": np.full((h // 2, w // 2), mid, dt),
             "v": np.full((h // 2, w // 2), mid, dt)} for y in ys]


@pytest.fixture
def cap_pair(tmp_path, rng):
    n, h, w = 6, 48, 64
    ref_y = rng.integers(16, 220, (n, h, w)).astype(np.uint8)
    white = np.full((h, w), 235, np.uint8)
    cap = [white] * 5 + list(ref_y) + [white] * 5 + list(ref_y) + [white] * 5
    rp, cp = str(tmp_path / "r.y4m"), str(tmp_path / "c.y4m")
    write_y4m(rp, _mk(list(ref_y)))
    write_y4m(cp, _mk(cap))
    return rp, cp, ref_y, np.stack(cap)


def test_streamed_signals_match_in_memory(cap_pair):
    rp, cp, ref_y, cap_y = cap_pair
    stats_s, thumbs_s, info = streamed_stats_thumbs(cp, chunk=8)  # 4 chunks
    stats_m, thumbs_m = stats_and_thumbs(cap_y)
    np.testing.assert_allclose(stats_s["mean"], stats_m["mean"], rtol=1e-6)
    np.testing.assert_array_equal(stats_s["_above"], stats_m["_above"])
    np.testing.assert_allclose(thumbs_s, thumbs_m, rtol=1e-6)
    assert info.width == 64


def test_streamed_align_matches_in_memory(cap_pair):
    rp, cp, ref_y, cap_y = cap_pair
    result, ref_info, cap_info = streamed_align(rp, cp)
    want = align_bookend_clips(ref_y.astype(np.float32),
                               cap_y.astype(np.float32))
    assert result.ref_range == want.ref_range
    assert result.cap_range == want.cap_range
    assert result.confidence == pytest.approx(want.confidence, abs=1e-6)


def test_write_trim_roundtrip(tmp_path, rng):
    n, h, w = 8, 32, 48
    ys = [rng.integers(0, 256, (h, w)).astype(np.uint8) for _ in range(n)]
    src = str(tmp_path / "src.y4m")
    write_y4m(src, _mk(ys))
    dst = str(tmp_path / "trim.y4m")
    wrote = write_trim(src, dst, 2, 6)
    assert wrote == 4
    _, frames = read_y4m(dst)
    assert len(frames) == 4
    for got, want in zip(frames, ys[2:6]):
        np.testing.assert_array_equal(got["y"], want)


def test_write_trim_preserves_ten_bit(tmp_path, rng):
    """10-bit trims keep uint16 payload AND declare C420p10 — an 8-bit
    header over 16-bit data desynchronises every downstream reader."""
    n, h, w = 4, 32, 48
    ys = [rng.integers(0, 1024, (h, w)).astype(np.uint16) for _ in range(n)]
    src = str(tmp_path / "src10.y4m")
    write_y4m(src, _mk(ys, depth=10), colorspace="C420p10")
    dst = str(tmp_path / "trim10.y4m")
    assert write_trim(src, dst, 1, 3) == 2
    header, frames = read_y4m(dst)
    assert header.bit_depth == 10
    np.testing.assert_array_equal(frames[0]["y"], ys[1])
    assert frames[0]["y"].dtype == np.uint16


def test_two_pass_ten_bit_workflow(tmp_path, rng):
    """Oversized 10-bit inputs through the workflow fallback: streamed
    detection on the 8-bit scale, 10-bit trims, sane scores."""
    from pqa2_tpu.app.vmaf_analyzer import VMAFAnalyzer
    from pqa2_tpu.app.workflow import run_combined_workflow

    n, h, w = 4, 48, 64
    base = rng.uniform(64, 880, (n, h, w))
    ref_y = np.round(base).astype(np.uint16)
    noisy = np.clip(ref_y.astype(np.int32)
                    + rng.integers(-16, 17, ref_y.shape), 0, 1023
                    ).astype(np.uint16)
    white = np.full((h, w), 940, np.uint16)
    rp, cp = str(tmp_path / "r10.y4m"), str(tmp_path / "c10.y4m")
    write_y4m(rp, _mk(list(ref_y), depth=10), colorspace="C420p10")
    write_y4m(cp, _mk([white] * 5 + list(noisy) + [white] * 5 + list(noisy)
                      + [white] * 5, depth=10), colorspace="C420p10")
    analyzer = VMAFAnalyzer()
    analyzer.set_output_directory(str(tmp_path / "o"))
    out = run_combined_workflow(rp, cp, analyzer=analyzer,
                                max_in_memory_bytes=1)
    assert out is not None
    assert out["alignment"]["confidence"] > 0.5
    assert out["analysis"]["vmaf_score"] > 30
