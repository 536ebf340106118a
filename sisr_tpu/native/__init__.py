"""Native (C++) host-runtime components, loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; host-side hot paths (image resampling for the
data pipeline) are C++ compiled on first use (cached next to the sources).  Everything
here degrades gracefully to the pure-numpy implementations when no compiler is present
(set SISR_TPU_NO_NATIVE=1 to force the fallback).
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_library():
    src = os.path.join(_HERE, 'fastresize.cpp')
    lib_path = os.path.join(_HERE, '_fastresize.so')
    if os.path.isfile(lib_path) and os.path.getmtime(lib_path) >= os.path.getmtime(src):
        return lib_path
    # build to a process-unique temp path and rename atomically so concurrent
    # processes never CDLL a half-written library
    tmp_path = '%s.%d.tmp' % (lib_path, os.getpid())
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', src, '-o', tmp_path]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp_path, lib_path)
    return lib_path


def get_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get('SISR_TPU_NO_NATIVE') == '1':
            return None
        try:
            lib = ctypes.CDLL(_build_library())
            lib.resize_bicubic_u8.restype = ctypes.c_int
            lib.resize_bicubic_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                ctypes.c_int]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def resize_bicubic_u8(img, out_h, out_w):
    """Native bit-exact Pillow BICUBIC resize; returns None if the lib is unavailable.

    :param img: (H, W, C) or (H, W) contiguous uint8 array.
    """
    lib = get_library()
    if lib is None:
        return None
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    out = np.empty((out_h, out_w, c), np.uint8)
    rc = lib.resize_bicubic_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w)
    if rc != 0:
        return None
    return out[:, :, 0] if squeeze else out


_IMG_LIB = None
_IMG_TRIED = False


def _build_image_library():
    src = os.path.join(_HERE, 'fastimage.cpp')
    lib_path = os.path.join(_HERE, '_fastimage.so')
    if os.path.isfile(lib_path) and os.path.getmtime(lib_path) >= os.path.getmtime(src):
        return lib_path
    tmp_path = '%s.%d.tmp' % (lib_path, os.getpid())
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', src, '-lpng', '-o', tmp_path]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp_path, lib_path)
    return lib_path


def get_image_library():
    """Load (building if needed) the PNG-decode library; None if unavailable
    (no compiler / no libpng — the data pipeline falls back to PIL)."""
    global _IMG_LIB, _IMG_TRIED
    if _IMG_LIB is not None or _IMG_TRIED:
        return _IMG_LIB
    with _LOCK:
        if _IMG_LIB is not None or _IMG_TRIED:
            return _IMG_LIB
        _IMG_TRIED = True
        if os.environ.get('SISR_TPU_NO_NATIVE') == '1':
            return None
        try:
            lib = ctypes.CDLL(_build_image_library())
            lib.fastimage_decode_png_rgb8.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.fastimage_decode_png_rgb8.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.fastimage_free.restype = None
            lib.fastimage_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
            _IMG_LIB = lib
        except Exception:
            _IMG_LIB = None
        return _IMG_LIB


def decode_png_rgb8(path):
    """Decode a PNG straight to an (H, W, 3) uint8 array with libpng.

    PNG is lossless, so the pixels are identical to ``PIL.Image.open(...)
    .convert('RGB')`` (every flavour — palette / gray / 16-bit / alpha — is
    normalized in the C++ transform chain).  Returns None when the native lib is
    unavailable or the file isn't a decodable PNG — callers fall back to PIL.
    """
    lib = get_image_library()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    buf = lib.fastimage_decode_png_rgb8(os.fsencode(path), ctypes.byref(w),
                                        ctypes.byref(h))
    if not buf:
        return None
    try:
        arr = np.ctypeslib.as_array(buf, shape=(h.value, w.value, 3)).copy()
    finally:
        lib.fastimage_free(buf)
    return arr
