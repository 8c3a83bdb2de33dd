"""Bookend detection + temporal alignment (SURVEY.md section 4, item 4)."""

import numpy as np
import pytest

from pqa2_tpu.align import (
    AlignmentResult,
    Bookend,
    BookendConfig,
    BookendDetector,
    align_bookend_clips,
    detect_bookends,
    frame_luma_stats,
)
from pqa2_tpu.align.stats import white_ratio


def _content_frame(rng, h=48, w=64, level=100.0):
    f = rng.uniform(level - 60, level + 60, size=(h, w))
    return np.clip(f, 0, 255).astype(np.uint8)


def _white_frame(h=48, w=64, value=250):
    return np.full((h, w), value, dtype=np.uint8)


def _bookend_capture(rng, n_loops=2, content_len=12, bookend_len=5, h=48, w=64):
    """lead-in | [white x bookend_len | content x content_len] x loops | white | tail"""
    frames = [_content_frame(rng, h, w, 60) for _ in range(3)]
    loops = []
    for k in range(n_loops):
        frames += [_white_frame(h, w)] * bookend_len
        start = len(frames)
        frames += [_content_frame(rng, h, w, 100 + 10 * k) for _ in range(content_len)]
        loops.append((start, len(frames)))
    frames += [_white_frame(h, w)] * bookend_len
    frames += [_content_frame(rng, h, w, 60) for _ in range(2)]
    return np.stack(frames), loops


def test_frame_stats_and_white_ratio(rng):
    luma = np.stack([_white_frame(value=240), _content_frame(rng, level=80)])
    stats = frame_luma_stats(luma)
    assert stats["mean"][0] == pytest.approx(240.0)
    assert stats["std"][0] == pytest.approx(0.0)
    r = white_ratio(stats, 200.0)
    assert r[0] == 1.0
    assert r[1] < 0.2


def test_packed_stats_thumbs_match_separate_passes(rng):
    """stats_and_thumbs (one packed device trip per chunk) must equal the
    separate frame_luma_stats + thumb_series passes exactly."""
    from pqa2_tpu.align.stats import stats_and_thumbs
    from pqa2_tpu.align.temporal import thumb_series

    luma = rng.integers(0, 256, (70, 48, 64)).astype(np.uint8)  # 2 chunks
    stats, thumbs = stats_and_thumbs(luma)
    want = frame_luma_stats(luma)
    np.testing.assert_allclose(stats["mean"], want["mean"], rtol=1e-6)
    np.testing.assert_allclose(stats["std"], want["std"], rtol=1e-6)
    np.testing.assert_array_equal(stats["_above"], want["_above"])
    np.testing.assert_allclose(thumbs, thumb_series(luma), rtol=1e-6)
    r1 = white_ratio(stats, 200.0)
    r2 = white_ratio(want, 200.0)
    np.testing.assert_array_equal(r1, r2)


def test_detect_bookends_basic(rng):
    cap, _ = _bookend_capture(rng, n_loops=2)
    bks = detect_bookends(cap, fps=30.0, config=BookendConfig(min_white_frames=3))
    assert len(bks) == 3  # 2 loops -> 3 white sections
    assert not any(b.is_fallback for b in bks)
    # Each detected section should be ~5 frames of pure white.
    for b in bks:
        assert b.frame_count >= 4
        assert b.brightness > 240


def test_detect_fallback_when_no_bookends(rng):
    cap = np.stack([_content_frame(rng, level=80) for _ in range(20)])
    bks = detect_bookends(cap, fps=30.0)
    assert len(bks) == 2
    assert all(b.is_fallback for b in bks)
    cfg = BookendConfig(fallback_to_full_video=False)
    assert detect_bookends(cap, fps=30.0, config=cfg) == []


def test_align_selects_matching_loop(rng):
    content_len = 12
    cap, loops = _bookend_capture(rng, n_loops=3, content_len=content_len)
    ref = cap[loops[0][0] : loops[0][1]]  # the reference clip = one loop
    res = align_bookend_clips(
        ref, cap, fps=30.0,
        config=BookendConfig(min_white_frames=3, frame_offset=0),
        refine=False,
    )
    assert isinstance(res, AlignmentResult)
    s, e = res.cap_range
    # The selected window must land inside one of the loops (with the
    # 2-frame safety buffer it may start slightly inside).
    assert any(abs(s - ls) <= 3 for ls, _ in loops)
    assert res.n_frames == e - s
    assert res.n_frames <= content_len
    assert res.confidence >= 0.9


def test_align_xcorr_refinement_fixes_jitter(rng):
    """A capture whose content starts 2 frames later than the bookend math
    suggests — xcorr must recover the true offset."""
    content_len = 16
    content = [_content_frame(rng, level=90 + 6 * i) for i in range(content_len)]
    ref = np.stack(content)
    frames = (
        [_content_frame(rng, level=60)] * 2
        + [_white_frame()] * 5
        + [content[0]] * 2  # 2 frames of freeze -> content effectively shifts
        + content
        + [_white_frame()] * 5
    )
    cap = np.stack(frames)
    cfg = BookendConfig(min_white_frames=3, frame_offset=0)
    res_plain = align_bookend_clips(ref, cap, fps=30.0, config=cfg, refine=False)
    res_ref = align_bookend_clips(ref, cap, fps=30.0, config=cfg, refine=True)
    s_plain = res_plain.cap_range[0]
    s_ref = res_ref.cap_range[0]
    true_start = 2 + 5 + 2
    assert abs(s_ref - true_start) <= abs(s_plain - true_start)
    assert abs(s_ref - true_start) <= 1


def test_align_errors_without_content(rng):
    cap = np.stack([_white_frame() for _ in range(20)])
    ref = np.stack([_content_frame(rng) for _ in range(5)])
    with pytest.raises(ValueError):
        align_bookend_clips(
            ref, cap, fps=30.0,
            config=BookendConfig(fallback_to_full_video=False, min_white_frames=3),
        )
