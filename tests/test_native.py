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
