"""ctypes bindings for the native C++ helpers (native/*.cpp).

The library is built on demand by native/build.sh; all callers degrade
gracefully (return None / raise with a clear message) when the toolchain or
library is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), "native")
_LIB_PATH = osp.join(_NATIVE_DIR, "libgedepth_native.so")


@lru_cache(maxsize=1)
def native_lib():
    """Load (building if needed) the native library; None if unavailable."""
    if not osp.exists(_LIB_PATH):
        build = osp.join(_NATIVE_DIR, "build.sh")
        if not osp.exists(build):
            return None
        try:
            subprocess.run(["bash", build], check=True,
                           capture_output=True, text=True)
        except (subprocess.CalledProcessError, OSError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.hough_forward.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    lib.hough_backward.argtypes = lib.hough_forward.argtypes
    lib.png16_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint16)]
    lib.png16_decode.restype = ctypes.c_int
    lib.png16_info.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.png16_info.restype = ctypes.c_int
    return lib


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def hough_forward_cpu(feat: np.ndarray, numangle: int,
                      numrho: int) -> np.ndarray:
    """C++ reference Hough forward. feat (B, C, H, W) float32."""
    lib = native_lib()
    if lib is None:
        raise RuntimeError("native library unavailable (run native/build.sh)")
    feat = np.ascontiguousarray(feat, dtype=np.float32)
    B, C, H, W = feat.shape
    out = np.zeros((B, C, numangle, numrho), dtype=np.float32)
    lib.hough_forward(_fptr(feat), _fptr(out), B, C, H, W, numangle, numrho)
    return out


def hough_backward_cpu(grad_out: np.ndarray, H: int, W: int) -> np.ndarray:
    lib = native_lib()
    if lib is None:
        raise RuntimeError("native library unavailable (run native/build.sh)")
    grad_out = np.ascontiguousarray(grad_out, dtype=np.float32)
    B, C, numangle, numrho = grad_out.shape
    out = np.zeros((B, C, H, W), dtype=np.float32)
    lib.hough_backward(_fptr(grad_out), _fptr(out), B, C, H, W,
                       numangle, numrho)
    return out


def decode_depth_png16(data: bytes) -> "np.ndarray | None":
    """Decode a 16-bit grayscale PNG via the native decoder.

    Returns a (H, W) uint16 array, or None if the file isn't the fast-path
    format / the native library is unavailable (callers fall back to PIL).
    """
    lib = native_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    bd = ctypes.c_int()
    ct = ctypes.c_int()
    ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    if lib.png16_info(ptr, len(buf), ctypes.byref(w), ctypes.byref(h),
                      ctypes.byref(bd), ctypes.byref(ct)) != 0:
        return None
    if bd.value != 16 or ct.value != 0:
        return None
    out = np.empty((h.value, w.value), dtype=np.uint16)
    rc = lib.png16_decode(ptr, len(buf),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    return out if rc == 0 else None


def load_depth_png(path: str, depth_scale: float = 256.0) -> np.ndarray:
    """Fast KITTI GT load: native decoder with PIL fallback."""
    with open(path, "rb") as f:
        data = f.read()
    arr = decode_depth_png16(data)
    if arr is None:
        from PIL import Image
        import io
        arr = np.asarray(Image.open(io.BytesIO(data)))
    return arr.astype(np.float32) / depth_scale
