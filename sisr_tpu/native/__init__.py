"""Native (C++) host-runtime components, loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; host-side hot paths (image resampling and PNG
decoding for the data pipeline) are C++ compiled on first use (cached next to the
sources).  Everything here degrades gracefully to the pure-Python implementations when
no compiler / library is present (set SISR_TPU_NO_NATIVE=1 to force the fallback).
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}  # src basename -> ctypes.CDLL | None (None = tried and unavailable)


def _load_native(src_name, extra_flags, configure):
    """Build (if stale) + CDLL a native component, once per process.

    :param src_name: C++ source basename inside this directory.
    :param extra_flags: extra g++ args (e.g. ``['-lpng']``).
    :param configure: callable(lib) setting restype/argtypes on the loaded lib.
    :return: the configured CDLL, or None when unavailable (no compiler, missing
        system library, or SISR_TPU_NO_NATIVE=1) — callers use their fallback.
    """
    if src_name in _LIBS:
        return _LIBS[src_name]
    with _LOCK:
        if src_name in _LIBS:
            return _LIBS[src_name]
        if os.environ.get('SISR_TPU_NO_NATIVE') == '1':
            _LIBS[src_name] = None
            return None
        try:
            src = os.path.join(_HERE, src_name)
            lib_path = os.path.join(_HERE,
                                    '_' + os.path.splitext(src_name)[0] + '.so')
            if not (os.path.isfile(lib_path)
                    and os.path.getmtime(lib_path) >= os.path.getmtime(src)):
                # build to a process-unique temp path and rename atomically so
                # concurrent processes never CDLL a half-written library
                tmp_path = '%s.%d.tmp' % (lib_path, os.getpid())
                cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', src] \
                    + list(extra_flags) + ['-o', tmp_path]
                subprocess.run(cmd, check=True, capture_output=True)
                os.replace(tmp_path, lib_path)
            lib = ctypes.CDLL(lib_path)
            configure(lib)
            _LIBS[src_name] = lib
        except Exception as exc:
            # degrade to the Python fallback, but say WHY once — a silent
            # fallback reads as a mysterious ~10x data-pipeline slowdown
            detail = ''
            if isinstance(exc, subprocess.CalledProcessError):
                detail = (exc.stderr or b'').decode(
                    errors='replace').strip().splitlines()[-1:]
                detail = ': %s' % detail[0] if detail else ''
            import sys
            print('sisr_tpu.native: %s unavailable (%s%s) — using the Python '
                  'fallback' % (src_name, type(exc).__name__, detail),
                  file=sys.stderr)
            _LIBS[src_name] = None
        return _LIBS[src_name]


def _configure_resize(lib):
    lib.resize_bicubic_u8.restype = ctypes.c_int
    lib.resize_bicubic_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]


def get_library():
    """The bit-exact resampler library; None if unavailable."""
    return _load_native('fastresize.cpp', [], _configure_resize)


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


def _configure_image(lib):
    lib.fastimage_decode_png_rgb8.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.fastimage_decode_png_rgb8.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.fastimage_free.restype = None
    lib.fastimage_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]


def get_image_library():
    """The PNG-decode library; None if unavailable (no compiler / no libpng —
    the data pipeline falls back to PIL)."""
    return _load_native('fastimage.cpp', ['-lpng'], _configure_image)


def decode_png_rgb8(path):
    """Decode an 8-bit PNG straight to an (H, W, 3) uint8 array with libpng.

    PNG is lossless, so the pixels are identical to ``PIL.Image.open(...)
    .convert('RGB')`` — palette / gray / alpha flavours are normalized in the C++
    transform chain.  16-bit files deliberately return None (PIL's lossy
    ``I;16 -> RGB`` conversion clips to the low byte, which libpng cannot
    reproduce), as does anything undecodable — callers fall back to PIL.
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
