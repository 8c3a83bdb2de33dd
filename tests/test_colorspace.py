"""Colorspace op tests (N11)."""

import numpy as np
import pytest

from pqa2_tpu.ops.colorspace import (
    chroma_420_to_444,
    chroma_422_to_420,
    chroma_444_to_420,
    planar_to_uyvy422,
    rgb_to_yuv,
    uyvy422_to_planar,
    yuv_to_rgb,
)


@pytest.mark.parametrize("standard", ["bt601", "bt709"])
@pytest.mark.parametrize("full_range", [False, True])
def test_rgb_yuv_roundtrip(rng, standard, full_range):
    rgb = rng.integers(0, 256, (4, 8, 3)).astype(np.float32)
    yuv = np.asarray(rgb_to_yuv(rgb, standard, full_range))
    back = np.asarray(yuv_to_rgb(yuv, standard, full_range))
    np.testing.assert_allclose(back, rgb, atol=1e-2)


def test_rgb_yuv_known_values():
    # Pure white / black, limited range BT.709.
    white = np.array([[[255.0, 255.0, 255.0]]])
    black = np.array([[[0.0, 0.0, 0.0]]])
    yw = np.asarray(rgb_to_yuv(white, "bt709"))
    yb = np.asarray(rgb_to_yuv(black, "bt709"))
    np.testing.assert_allclose(yw[0, 0], [235.0, 128.0, 128.0], atol=1e-3)
    np.testing.assert_allclose(yb[0, 0], [16.0, 128.0, 128.0], atol=1e-3)


def test_uyvy_roundtrip(rng):
    h, w = 6, 8
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h, w // 2)).astype(np.uint8)
    packed = np.asarray(planar_to_uyvy422(y, u, v))
    assert packed.shape == (h, 2 * w)
    planes = uyvy422_to_planar(packed)
    np.testing.assert_array_equal(np.asarray(planes["y"]), y)
    np.testing.assert_array_equal(np.asarray(planes["u"]), u)
    np.testing.assert_array_equal(np.asarray(planes["v"]), v)


def test_uyvy_layout():
    # One pixel pair: U=1 Y0=2 V=3 Y1=4
    packed = np.array([[1, 2, 3, 4]], dtype=np.uint8)
    p = uyvy422_to_planar(packed)
    assert np.asarray(p["y"]).tolist() == [[2, 4]]
    assert np.asarray(p["u"]).tolist() == [[1]]
    assert np.asarray(p["v"]).tolist() == [[3]]


def test_chroma_resampling(rng):
    c = rng.integers(0, 256, (4, 6)).astype(np.float32)
    up = np.asarray(chroma_420_to_444(c))
    assert up.shape == (8, 12)
    np.testing.assert_array_equal(up[::2, ::2], c)
    np.testing.assert_array_equal(up[1::2, 1::2], c)
    down = np.asarray(chroma_444_to_420(up))
    np.testing.assert_allclose(down, c, atol=1e-5)
    c422 = rng.integers(0, 256, (8, 6)).astype(np.float32)
    d = np.asarray(chroma_422_to_420(c422))
    assert d.shape == (4, 6)
    np.testing.assert_allclose(d[0], (c422[0] + c422[1]) / 2, atol=1e-5)
