"""ctypes binding to the native host pipeline (csrc/libmtnative.so).

The reference's host preprocessing is per-image cv2 in Python
(`/root/reference/YOLOTensorRT_yolodet_py_解读.md:64-78`); its native code is
a vendored C++/TensorRT demo.  Here the native layer owns the host-side
data path: multithreaded JPEG/PNG decode + letterbox straight into a pinned
NHWC batch buffer the device consumes.  Falls back transparently to the
cv2 path when the shared library has not been built (`make -C csrc`).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "build", "libmtnative.so")
_lib = None


def build_native(quiet: bool = True) -> bool:
    """Compile csrc/ via make; returns success."""
    csrc = os.path.dirname(os.path.dirname(_LIB_PATH))
    try:
        subprocess.run(["make", "-C", csrc], check=True,
                       capture_output=quiet)
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_native(auto_build: bool = True):
    """Load (and memoize) the shared library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and auto_build:
        build_native()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mt_decode.restype = ctypes.c_void_p
    lib.mt_decode.argtypes = [ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int)]
    lib.mt_copy_pixels.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.mt_free.argtypes = [ctypes.c_void_p]
    lib.mt_load_letterbox_batch.restype = ctypes.c_int
    lib.mt_load_letterbox_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_ubyte, ctypes.c_int, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_char_p]
    lib.mt_crop_resize_nearest.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_native() is not None


def decode_image(path: str) -> np.ndarray | None:
    """Decode JPEG/PNG/PPM -> HWC uint8 RGB, or None."""
    lib = load_native()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    handle = lib.mt_decode(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if not handle:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    lib.mt_copy_pixels(ctypes.c_void_p(handle),
                       out.ctypes.data_as(ctypes.c_char_p))
    lib.mt_free(ctypes.c_void_p(handle))
    return out


def load_letterbox_batch(paths: Sequence[str], out_hw: tuple[int, int],
                         pad_value: int = 114, num_threads: int = 8):
    """Parallel decode+letterbox -> (batch (N,H,W,3) u8 RGB,
    geom (N,3) [ratio, dw, dh] f32, ok (N,) bool)."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable; run make -C csrc")
    n = len(paths)
    out_h, out_w = out_hw
    batch = np.empty((n, out_h, out_w, 3), np.uint8)
    geom = np.empty((n, 3), np.float32)
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.mt_load_letterbox_batch(
        arr, n, out_w, out_h, pad_value, num_threads,
        batch.ctypes.data_as(ctypes.c_char_p),
        geom.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.c_char_p))
    return batch, geom, ok.astype(bool)


def crop_resize_nearest(img: np.ndarray, box, out_hw=(224, 224)) -> np.ndarray:
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable; run make -C csrc")
    out_h, out_w = out_hw
    img = np.ascontiguousarray(img, np.uint8)
    dst = np.empty((out_h, out_w, 3), np.uint8)
    x1, y1, x2, y2 = (int(v) for v in box)
    lib.mt_crop_resize_nearest(
        img.ctypes.data_as(ctypes.c_char_p), img.shape[1], img.shape[0],
        x1, y1, x2, y2, out_w, out_h, dst.ctypes.data_as(ctypes.c_char_p))
    return dst
