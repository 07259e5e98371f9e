"""ctypes bindings for the native host-preprocessing library.

Builds ``native/libprpe_host.so`` on first use (g++ is in the image) and
exposes the fused resize/letterbox/normalize kernels. Every entry point has a
pure-numpy fallback with identical semantics, so the package works without a
toolchain; the native path exists because host-side image prep is the one
part of the pipeline the TPU cannot accelerate.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parent.parent
_SRC = _ROOT / "native" / "host_ops.cpp"
_LIB_PATH = _ROOT / "native" / "libprpe_host.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_f32p = ctypes.POINTER(ctypes.c_float)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_i64 = ctypes.c_int64
_i64p = ctypes.POINTER(ctypes.c_int64)


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(_SRC)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if _SRC.exists() and (
            not _LIB_PATH.exists()
            or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime
        ):
            # (re)build when missing or stale vs the source
            _build()
        if _LIB_PATH.exists():
            try:
                lib = ctypes.CDLL(str(_LIB_PATH))
                lib.resize_bilinear_u8.argtypes = [_u8p, _i64, _i64, _i64, _u8p, _i64, _i64]
                lib.letterbox_normalize_f32.argtypes = [
                    _u8p, _i64, _i64, _i64, _f32p, _i64, _f32p, _f32p,
                    ctypes.c_int, _f32p, _f32p, _i64p, _i64p,
                ]
                lib.resize_normalize_f32.argtypes = [
                    _u8p, _i64, _i64, _i64, _f32p, _i64, _i64, _f32p, _f32p,
                    ctypes.c_int,
                ]
                lib.warp_affine_u8.argtypes = [
                    _u8p, _i64, _i64, _i64, _u8p, _i64, _i64, _f32p,
                ]
                lib.hsv_lut_u8.argtypes = [
                    _u8p, _i64, ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ]
                _lib = lib
            except (OSError, AttributeError):
                # unloadable, or a stale build missing a newer symbol
                _lib = None
        return _lib


def _as_u8p(a: np.ndarray):
    return a.ctypes.data_as(_u8p)


def _as_f32p(a: np.ndarray):
    return a.ctypes.data_as(_f32p)


# --------------------------------------------------------------------------
# numpy fallbacks (identical half-pixel bilinear semantics)
# --------------------------------------------------------------------------

def _np_bilinear(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    sh, sw = src.shape[:2]
    fy = np.clip((np.arange(dh) + 0.5) * (sh / dh) - 0.5, 0, sh - 1)
    fx = np.clip((np.arange(dw) + 0.5) * (sw / dw) - 0.5, 0, sw - 1)
    y0 = fy.astype(np.int64); y1 = np.minimum(y0 + 1, sh - 1)
    x0 = fx.astype(np.int64); x1 = np.minimum(x0 + 1, sw - 1)
    wy = (fy - y0)[:, None, None].astype(np.float32)
    wx = (fx - x0)[None, :, None].astype(np.float32)
    s = src.astype(np.float32)
    top = s[y0][:, x0] * (1 - wx) + s[y0][:, x1] * wx
    bot = s[y1][:, x0] * (1 - wx) + s[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def resize_bilinear_u8(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """uint8 HWC resize, half-pixel bilinear."""
    src = np.ascontiguousarray(src)
    lib = get_lib()
    if lib is not None:
        dst = np.empty((dh, dw, src.shape[2]), np.uint8)
        lib.resize_bilinear_u8(_as_u8p(src), src.shape[0], src.shape[1],
                               src.shape[2], _as_u8p(dst), dh, dw)
        return dst
    return np.clip(_np_bilinear(src, dh, dw) + 0.5, 0, 255).astype(np.uint8)


def warp_affine_u8(src: np.ndarray, inv: np.ndarray,
                   dh: int, dw: int) -> Optional[np.ndarray]:
    """Inverse-mapped bilinear affine warp, black border; ``inv`` is the
    row-major 2x3 inverse matrix (output -> source coords). Returns None
    when the native library is unavailable — the caller
    (prpe_tpu/data/augment.py::warp_affine) owns the numpy fallback."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src)
    inv = np.ascontiguousarray(inv, np.float32).reshape(6)
    dst = np.empty((dh, dw, src.shape[2]), np.uint8)
    lib.warp_affine_u8(_as_u8p(src), src.shape[0], src.shape[1], src.shape[2],
                       _as_u8p(dst), dh, dw, _as_f32p(inv))
    return dst


def _np_hsv_lut(img: np.ndarray, rh: float, rs: float, rv: float) -> np.ndarray:
    """cv2-exact uint8 HSV LUT jitter, numpy fallback (same math as the C
    kernel: H in [0,180) = round(deg/2), S = round(255*(V-min)/V), uint8
    LUTs, sector-formula HSV->RGB; fp32 throughout)."""
    x = img.astype(np.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = x.max(-1)
    mn = x.min(-1)
    diff = v - mn
    s = np.where(v > 0, 255.0 * diff / np.maximum(v, 1e-12), 0.0)
    safe = np.maximum(diff, 1e-12)
    is_r = (diff > 0) & (v == r)
    is_g = (diff > 0) & (v == g) & ~is_r
    is_b = (diff > 0) & ~is_r & ~is_g
    h = np.zeros_like(v)
    h = np.where(is_r, 60.0 * (g - b) / safe, h)
    h = np.where(is_g, 120.0 + 60.0 * (b - r) / safe, h)
    h = np.where(is_b, 240.0 + 60.0 * (r - g) / safe, h)
    h = np.where(h < 0, h + 360.0, h)
    hu = (h / 2.0 + 0.5).astype(np.uint8)
    hu = np.where(hu >= 180, 0, hu).astype(np.uint8)
    su = (s + 0.5).astype(np.uint8)
    vu = (v + 0.5).astype(np.uint8)

    idx = np.arange(256, dtype=np.float32)
    lut_h = np.fmod(idx * np.float32(rh), 180.0).astype(np.uint8)
    lut_s = np.clip(idx * np.float32(rs), 0, 255).astype(np.uint8)
    lut_v = np.clip(idx * np.float32(rv), 0, 255).astype(np.uint8)

    h2 = lut_h[hu].astype(np.float32) * 2.0
    s2 = lut_s[su].astype(np.float32) / 255.0
    v2 = lut_v[vu].astype(np.float32)
    hh = h2 / 60.0
    sector = hh.astype(np.int32) % 6
    f = hh - hh.astype(np.int32)
    p = v2 * (1.0 - s2)
    q = v2 * (1.0 - s2 * f)
    t = v2 * (1.0 - s2 * (1.0 - f))
    ro = np.select([sector == 0, sector == 1, sector == 2, sector == 3,
                    sector == 4], [v2, q, p, p, t], default=v2)
    go = np.select([sector == 0, sector == 1, sector == 2, sector == 3,
                    sector == 4], [t, v2, v2, q, p], default=p)
    bo = np.select([sector == 0, sector == 1, sector == 2, sector == 3,
                    sector == 4], [p, p, t, v2, v2], default=q)
    out = np.stack([ro, go, bo], -1)
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def hsv_lut(img: np.ndarray, rh: float, rs: float, rv: float) -> np.ndarray:
    """cv2-exact uint8 HSV LUT jitter on RGB HWC (the reference's
    augment_hsv semantics, training/yolopt/dataset.py:274-289)."""
    lib = get_lib()
    if lib is not None and img.shape[-1] == 3:
        out = np.ascontiguousarray(img).copy()
        lib.hsv_lut_u8(_as_u8p(out), out.shape[0] * out.shape[1],
                       float(rh), float(rs), float(rv))
        return out
    return _np_hsv_lut(img, rh, rs, rv)


def resize_normalize(
    src: np.ndarray, dh: int, dw: int,
    mean: np.ndarray, std: np.ndarray, bgr: bool = False,
) -> np.ndarray:
    """uint8 HWC -> resized, /255, (x - mean)/std fp32; optional BGR swap."""
    src = np.ascontiguousarray(src)
    c = src.shape[2]
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib = get_lib()
    if lib is not None:
        dst = np.empty((dh, dw, c), np.float32)
        lib.resize_normalize_f32(_as_u8p(src), src.shape[0], src.shape[1], c,
                                 _as_f32p(dst), dh, dw, _as_f32p(mean),
                                 _as_f32p(std), int(bgr))
        return dst
    x = _np_bilinear(src, dh, dw) / 255.0
    if bgr:
        x = x[..., ::-1]
    return ((x - mean) / std).astype(np.float32)


def letterbox_normalize(
    src: np.ndarray, size: int,
    mean: np.ndarray, std: np.ndarray,
    bgr: bool = False,
) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """uint8 HWC -> (size, size) letterboxed normalized fp32.

    Padding is normalized zero, i.e. (0 - mean) / std per channel (the
    reference normalizes after padding). Returns (image, scale, (top, left)).
    """
    src = np.ascontiguousarray(src)
    c = src.shape[2]
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    pad = np.ascontiguousarray((0.0 - mean) / std, np.float32)
    lib = get_lib()
    if lib is not None:
        dst = np.empty((size, size, c), np.float32)
        scale = ctypes.c_float()
        top = _i64(0); left = _i64(0)
        lib.letterbox_normalize_f32(
            _as_u8p(src), src.shape[0], src.shape[1], c, _as_f32p(dst), size,
            _as_f32p(mean), _as_f32p(std), int(bgr), _as_f32p(pad),
            ctypes.byref(scale), ctypes.byref(top), ctypes.byref(left),
        )
        return dst, float(scale.value), (int(top.value), int(left.value))
    sh, sw = src.shape[:2]
    scale = size / max(sh, sw)
    nh, nw = int(round(sh * scale)), int(round(sw * scale))
    resized = _np_bilinear(src, nh, nw) / 255.0
    if bgr:
        resized = resized[..., ::-1]
    resized = ((resized - mean) / std).astype(np.float32)
    out = np.broadcast_to(pad, (size, size, c)).copy()
    t, l = (size - nh) // 2, (size - nw) // 2
    out[t : t + nh, l : l + nw] = resized
    return out, scale, (t, l)


def letterbox_u8(src: np.ndarray, size: int) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """uint8 HWC -> (size, size) letterboxed RAW uint8 pixels, zero padding.

    Same geometry as ``letterbox_normalize`` (scale = size/max(h,w),
    centered); normalization is deferred to the device
    (data/packed.py::apply_image_norm) so batches cross the host->device
    link at 1 byte/px instead of 4 — the training analogue of the packed
    serving format."""
    src = np.ascontiguousarray(src)
    sh, sw = src.shape[:2]
    scale = size / max(sh, sw)
    nh, nw = int(round(sh * scale)), int(round(sw * scale))
    resized = resize_bilinear_u8(src, nh, nw)
    out = np.zeros((size, size, src.shape[2]), np.uint8)
    t, l = (size - nh) // 2, (size - nw) // 2
    out[t : t + nh, l : l + nw] = resized
    return out, scale, (t, l)
