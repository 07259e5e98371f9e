"""Native host-preprocessing library vs the numpy reference semantics."""

import numpy as np
import pytest

from prpe_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++)")
    return lib


def test_resize_matches_numpy(lib, rng):
    src = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    got = native.resize_bilinear_u8(src, 24, 48)
    want = np.clip(native._np_bilinear(src, 24, 48) + 0.5, 0, 255).astype(np.uint8)
    # rounding at exact .5 boundaries may differ by 1
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_resize_normalize_matches_numpy(lib, rng):
    src = rng.integers(0, 256, size=(31, 29, 3), dtype=np.uint8)
    mean = np.array([0.5, 0.4, 0.3], np.float32)
    std = np.array([0.2, 0.25, 0.3], np.float32)
    got = native.resize_normalize(src, 16, 16, mean, std, bgr=True)

    x = native._np_bilinear(src, 16, 16) / 255.0
    x = x[..., ::-1]
    want = ((x - mean) / std).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_letterbox_matches_numpy(lib, rng):
    src = rng.integers(0, 256, size=(40, 80, 3), dtype=np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    got, scale, (top, left) = native.letterbox_normalize(src, 64, mean, std)
    assert scale == pytest.approx(64 / 80)
    assert (top, left) == (16, 0)
    # pad rows are normalized zero
    np.testing.assert_allclose(got[0, 0], (0 - mean) / std, atol=1e-5)
    # interior matches numpy path
    x = native._np_bilinear(src, 32, 64) / 255.0
    want = ((x - mean) / std).astype(np.float32)
    np.testing.assert_allclose(got[16:48], want, atol=1e-4)


def test_identity_resize(lib):
    src = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = native.resize_bilinear_u8(src, 4, 4)
    np.testing.assert_array_equal(out, src)


def test_warp_affine_matches_numpy(lib, rng):
    """Native inverse-mapped affine warp vs the numpy fallback in
    data/augment.py (rotation+scale+translation, black border)."""
    import math

    from prpe_tpu.data import augment

    src = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    a = math.radians(17.0)
    s = 1.3
    m = np.array([
        [s * math.cos(a), s * math.sin(a), 5.0],
        [-s * math.sin(a), s * math.cos(a), -3.0],
        [0, 0, 1],
    ])
    inv = np.linalg.inv(m).astype(np.float32)
    got = native.warp_affine_u8(src, inv[:2], 48, 64)
    assert got is not None

    # numpy fallback path, forced
    ys, xs = np.mgrid[0:48, 0:64].astype(np.float32)
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    def tap(yy, xx):
        ok = (yy >= 0) & (yy < 48) & (xx >= 0) & (xx < 64)
        v = src[np.clip(yy, 0, 47), np.clip(xx, 0, 63)].astype(np.float32)
        return v * ok[..., None]

    want = np.clip(
        tap(y0, x0) * (1 - fx) * (1 - fy) + tap(y0, x0 + 1) * fx * (1 - fy)
        + tap(y0 + 1, x0) * (1 - fx) * fy + tap(y0 + 1, x0 + 1) * fx * fy
        + 0.5, 0, 255,
    ).astype(np.uint8)
    diff = np.abs(got.astype(int) - want.astype(int))
    # FMA contraction in the C build can move a coordinate by 1 ulp across
    # a rounding boundary on isolated pixels
    assert (diff <= 1).mean() > 0.999


def test_warp_affine_identity_exact(lib, rng):
    src = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    got = native.warp_affine_u8(src, np.eye(3, dtype=np.float32)[:2], 16, 16)
    np.testing.assert_array_equal(got, src)


def test_hsv_lut_native_matches_numpy(lib, rng):
    src = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    got = native.hsv_lut(src, 1.1, 0.8, 1.3)
    want = native._np_hsv_lut(src, 1.1, 0.8, 1.3)
    diff = np.abs(got.astype(int) - want.astype(int))
    # fp32 rounding at sector/LUT boundaries may differ by 1 on rare pixels
    assert (diff <= 1).mean() > 0.999 and diff.max() <= 3


def test_hsv_lut_identity_gains_near_roundtrip(lib, rng):
    """gains=1 -> pure uint8 HSV round-trip; hue quantization to 2 degrees
    bounds the error on saturated pixels."""
    src = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    out = native.hsv_lut(src, 1.0, 1.0, 1.0)
    assert np.abs(out.astype(int) - src.astype(int)).max() <= 6
