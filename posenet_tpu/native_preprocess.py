"""ctypes binding for the native C++ preprocessing library.

Wraps native/preprocess.cpp: fixed-point bilinear resize (OpenCV
INTER_LINEAR convention) with fused BGR->RGB swap and a pthread-pool batch
path. Falls back to cv2 when the shared library has not been built
(`make -C native`). The two paths agree to within +-1 uint8 LSB, not
bitwise: the native vertical pass keeps full intermediate precision where
OpenCV's SIMD truncates to 16 bits (see the header of preprocess.cpp).
Either path is deterministic on its own; pin one (build the library, or
don't) when bit-reproducible frames matter across machines.

This is the host half of the serving data path: it emits uint8 RGB frames
at the stride-valid resolution; normalization to [-1, 1] runs fused
on-device (posenet_tpu/pipeline.py), so host->device transfers stay at
3 bytes/pixel (the reference ships float32 NCHW — 12 bytes/pixel —
utils.py:23-24).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         'native', 'libposenet_preprocess.so')

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.posenet_resize_bilinear.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.posenet_resize_batch.argtypes = [
        ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), u8p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    lib.posenet_resize_normalize.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def resize_rgb(frame_bgr: np.ndarray, dst_hw: Tuple[int, int],
               backend: str = 'auto') -> np.ndarray:
    """uint8 BGR HWC -> uint8 RGB (dst_h, dst_w, 3): THE host hot-path op
    for serving and offline video (decode -> model-resolution RGB frame).

    backend:
      'auto'   — fastest measured: cv2 resize + cvtColor when cv2 is
                 importable, else the native library. Measured on the
                 1-core serving host (720p -> 513^2, 2026-08-19):
                 cv2 resize+cvtColor 0.83 ms; native fused 2.38 ms;
                 cv2 resize + numpy ::-1 copy (the old server path)
                 2.30 ms. cv2's SIMD/IPP resize beats the -O3
                 fixed-point C++ ~4x per pass, so native is the measured
                 LOSER wherever cv2 exists — it stays as the
                 cv2-free-deployment path, not the default.
      'native' — the C++ library (raises if not built).
      'cv2'    — force cv2 (raises if not importable).
    The two backends agree to +-1 uint8 LSB (pinned in
    tests/test_preprocess.py), not bitwise.
    """
    dh, dw = dst_hw
    if backend not in ('auto', 'native', 'cv2'):
        raise ValueError(f"unknown resize backend {backend!r}")
    if backend != 'native':
        try:
            import cv2
            resized = cv2.resize(frame_bgr, (dw, dh),
                                 interpolation=cv2.INTER_LINEAR)
            return cv2.cvtColor(resized, cv2.COLOR_BGR2RGB)
        except ImportError:
            if backend == 'cv2':
                raise
    if _load() is None:
        raise RuntimeError(
            "neither cv2 nor the native preprocess library is available "
            "(build with `make -C native`)")
    return resize_bilinear(frame_bgr, dst_hw, swap_rb=True)


def resize_bilinear(img: np.ndarray, dst_hw: Tuple[int, int],
                    swap_rb: bool = False) -> np.ndarray:
    """uint8 HWC (H, W, 3) -> (dst_h, dst_w, 3), optionally BGR->RGB."""
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    dh, dw = dst_hw
    if lib is None:
        import cv2
        out = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_LINEAR)
        return out[..., ::-1].copy() if swap_rb else out
    out = np.empty((dh, dw, 3), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.posenet_resize_bilinear(
        img.ctypes.data_as(u8p), img.shape[0], img.shape[1],
        out.ctypes.data_as(u8p), dh, dw, int(swap_rb))
    return out


def resize_batch(images: List[np.ndarray], dst_hw: Tuple[int, int],
                 swap_rb: bool = True) -> np.ndarray:
    """List of uint8 HWC frames (mixed sizes) -> (N, dst_h, dst_w, 3),
    multi-threaded in native code. Default swap_rb=True: BGR files in,
    RGB batch out — ready for the device pipeline."""
    lib = _load()
    dh, dw = dst_hw
    if lib is None:
        return np.stack([resize_bilinear(im, dst_hw, swap_rb) for im in images])
    n = len(images)
    images = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    out = np.empty((n, dh, dw, 3), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    src_ptrs = (u8p * n)(*[im.ctypes.data_as(u8p) for im in images])
    src_hs = (ctypes.c_int * n)(*[im.shape[0] for im in images])
    src_ws = (ctypes.c_int * n)(*[im.shape[1] for im in images])
    lib.posenet_resize_batch(
        ctypes.cast(src_ptrs, ctypes.POINTER(u8p)), src_hs, src_ws,
        out.ctypes.data_as(u8p), n, dh, dw, int(swap_rb))
    return out


def resize_normalize(img: np.ndarray, dst_hw: Tuple[int, int],
                     swap_rb: bool = True) -> np.ndarray:
    """uint8 HWC -> float32 (dst_h, dst_w, 3) in [-1, 1] (host-side
    normalization parity path)."""
    lib = _load()
    dh, dw = dst_hw
    if lib is None:
        rgb = resize_bilinear(img, dst_hw, swap_rb).astype(np.float32)
        return rgb * (2.0 / 255.0) - 1.0
    img = np.ascontiguousarray(img, dtype=np.uint8)
    out = np.empty((dh, dw, 3), np.float32)
    lib.posenet_resize_normalize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw,
        int(swap_rb))
    return out
