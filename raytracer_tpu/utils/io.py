"""Image IO through the native C++ runtime (ctypes), with a PIL fallback.

The compiled ``libimageio.so`` provides zlib PNG / PPM writers and the
unit-float → u8 quantisation; built on first use with g++ (the image has
the native toolchain but no pybind11 — ctypes is the binding layer).
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "build" / "libimageio.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or (_SO.stat().st_mtime
                                < (_NATIVE_DIR / "imageio.cpp").stat().st_mtime):
            _SO.parent.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC",
                 str(_NATIVE_DIR / "imageio.cpp"), "-lz", "-o", str(_SO)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.write_png.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                  ctypes.c_int, ctypes.c_int]
        lib.write_ppm.argtypes = lib.write_png.argtypes
        lib.write_png.restype = ctypes.c_int
        lib.write_ppm.restype = ctypes.c_int
        lib.quantise_unit_u8.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_int64]
        lib.write_apng.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int]
        lib.write_apng.restype = ctypes.c_int
        _lib = lib
    except Exception:                                   # pragma: no cover
        _lib = None
    return _lib


def quantise_unit(img: np.ndarray) -> np.ndarray:
    """min(1, max(0, img)) * 255 with banker's rounding, native if possible."""
    img = np.ascontiguousarray(img, np.float32)
    lib = _load()
    out = np.empty(img.shape, np.uint8)
    if lib is not None:
        lib.quantise_unit_u8(img.ctypes.data_as(ctypes.c_void_p),
                             out.ctypes.data_as(ctypes.c_void_p), img.size)
        return out
    s = np.clip(img, 0.0, 1.0) * 255.0
    return np.asarray(np.round(s), np.uint8)


def save_image(path, rgb_u8: np.ndarray) -> None:
    """Write a [H, W, 3] uint8 image as PNG (native) or PPM, with a PIL
    fallback."""
    path = str(path)
    rgb_u8 = np.ascontiguousarray(rgb_u8, np.uint8)
    h, w = rgb_u8.shape[:2]
    lib = _load()
    if lib is not None:
        fn = lib.write_png if path.endswith(".png") else lib.write_ppm
        rc = fn(path.encode(), rgb_u8.ctypes.data_as(ctypes.c_void_p), w, h)
        if rc == 0:
            return
    try:                                                # pragma: no cover
        from PIL import Image
        Image.fromarray(rgb_u8).save(path)
    except ImportError:
        raise RuntimeError("no native imageio and no PIL available")


def save_apng(path, frames_u8: np.ndarray, fps: float = 10.0) -> None:
    """Write ``[F, H, W, 3]`` uint8 frames as an animated PNG (APNG,
    full-frame replace, infinite loop) via the native writer, with a
    Pillow ``save_all`` fallback."""
    path = str(path)
    frames_u8 = np.ascontiguousarray(frames_u8, np.uint8)
    if frames_u8.ndim != 4 or frames_u8.shape[-1] != 3:
        raise ValueError(f"expected [F,H,W,3] u8, got {frames_u8.shape}")
    f, h, w = frames_u8.shape[:3]
    delay_num, delay_den = 1, max(1, min(int(round(fps)), 30_000))
    lib = _load()
    if lib is not None:
        rc = lib.write_apng(path.encode(),
                            frames_u8.ctypes.data_as(ctypes.c_void_p),
                            w, h, f, delay_num, delay_den)
        if rc == 0:
            return
    try:                                                # pragma: no cover
        from PIL import Image
        imgs = [Image.fromarray(frames_u8[i]) for i in range(f)]
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=1000.0 * delay_num / delay_den, loop=0)
    except ImportError:
        raise RuntimeError("no native imageio and no PIL available")
