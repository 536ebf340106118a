"""PIL-parity bicubic resampling, in three flavours.

The reference framework resizes exclusively through ``PIL.Image.resize(..., BICUBIC)``
(ref: Code/sr_tools/image_manipulation.py:32-53, Code/SISR/evaluation/standard_eval.py:146-158).
PIL parity therefore gates the 0.01 dB PSNR target.  PIL's resample is a separable
convolution with a Catmull-Rom (a=-0.5) kernel whose support is widened by the scale
factor when downscaling; for uint8 images the two passes run in fixed-point arithmetic
with rounding+clipping after each pass.

Flavours provided here:

1. :func:`resize_uint8` — bit-exact reimplementation of Pillow's 8-bit fixed-point path
   (numpy).  Used for host-side data prep where bit parity with the reference matters.
2. :func:`resize_float` — the same separable filter in float64 without fixed-point
   rounding (numpy).  Matches Pillow's 'F'-mode path.
3. :func:`resize_bicubic` — batched NHWC JAX version expressed as two dense matmuls
   (``W_h @ img @ W_w^T``) so the whole resample runs on the MXU.  This is the fast
   device path used by the benchmark/eval pipelines.
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp

_PRECISION_BITS = 32 - 8 - 2  # Pillow's fixed-point coefficient precision for 8bpc


def _bicubic_filter(x, a=-0.5):
    """Pillow's bicubic kernel (Catmull-Rom for a=-0.5), support = 2."""
    x = np.abs(x)
    out = np.zeros_like(x)
    m1 = x < 1
    m2 = (x >= 1) & (x < 2)
    out[m1] = ((a + 2) * x[m1] - (a + 3)) * x[m1] * x[m1] + 1
    out[m2] = (((x[m2] - 5) * x[m2] + 8) * x[m2] - 4) * a
    return out


@functools.lru_cache(maxsize=256)
def precompute_coeffs(in_size, out_size, support=2.0):
    """Per-output-pixel filter windows, as Pillow computes them.

    Returns (bounds, ksize, kk) where ``bounds[i] = (xmin, xmax-xmin)`` and
    ``kk[i, :n]`` holds the normalized float64 weights for output pixel i.
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    eff_support = support * filterscale
    ksize = int(np.ceil(eff_support)) * 2 + 1

    bounds = np.zeros((out_size, 2), dtype=np.int64)
    kk = np.zeros((out_size, ksize), dtype=np.float64)
    ss = 1.0 / filterscale

    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = int(center - eff_support + 0.5)
        if xmin < 0:
            xmin = 0
        xmax = int(center + eff_support + 0.5)
        if xmax > in_size:
            xmax = in_size
        n = xmax - xmin
        x = (np.arange(n) + xmin - center + 0.5) * ss
        w = _bicubic_filter(x)
        total = w.sum()
        if total != 0:
            w = w / total
        bounds[i] = (xmin, n)
        kk[i, :n] = w
    return bounds, ksize, kk


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size, out_size):
    """Dense (out_size, in_size) float64 resampling matrix for one axis."""
    bounds, _, kk = precompute_coeffs(in_size, out_size)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        xmin, n = bounds[i]
        mat[i, xmin:xmin + n] = kk[i, :n]
    return mat


def _quantize_coeffs(kk):
    """Pillow's ROUND_UP fixed-point quantization of filter weights."""
    scaled = kk * (1 << _PRECISION_BITS)
    return np.where(scaled >= 0, scaled + 0.5, scaled - 0.5).astype(np.int64)


def _resample_axis_uint8(img, out_size, axis):
    """One fixed-point resample pass over ``axis`` of an (..., C)-last uint8 array."""
    in_size = img.shape[axis]
    bounds, _, kk = precompute_coeffs(in_size, out_size)
    kk_int = _quantize_coeffs(kk)

    img = np.moveaxis(img, axis, 0).astype(np.int64)
    out = np.empty((out_size,) + img.shape[1:], dtype=np.uint8)
    half = 1 << (_PRECISION_BITS - 1)
    for i in range(out_size):
        xmin, n = bounds[i]
        acc = half + np.tensordot(kk_int[i, :n], img[xmin:xmin + n], axes=(0, 0))
        out[i] = np.clip(acc >> _PRECISION_BITS, 0, 255).astype(np.uint8)
    return np.moveaxis(out, 0, axis)


def resize_uint8(img, size):
    """Bit-exact Pillow BICUBIC resize of an H,W[,C] uint8 numpy image.

    Dispatches to the native C++ resampler (sisr_tpu.native) when available — ~10-15x
    faster than the numpy loop below, bit-identical output.

    :param img: uint8 array, H,W or H,W,C.
    :param size: (width, height) target, PIL convention.
    """
    out_w, out_h = size
    if img.dtype != np.uint8:
        raise TypeError('resize_uint8 expects a uint8 image')
    from .. import native
    fast = native.resize_bicubic_u8(img, out_h, out_w)
    if fast is not None:
        return fast
    # Pillow resamples horizontally first, then vertically, with rounding after each pass.
    out = img
    if out.shape[1] != out_w:
        out = _resample_axis_uint8(out, out_w, axis=1)
    if out.shape[0] != out_h:
        out = _resample_axis_uint8(out, out_h, axis=0)
    if out is img:
        out = img.copy()  # identity resize: PIL (and the native path) return a
        # fresh buffer; aliasing the input would let callers corrupt the source
    return out


def resize_float(img, size):
    """Float64 separable bicubic resize of an H,W[,C] numpy image (no fixed-point rounding)."""
    out_w, out_h = size
    arr = np.asarray(img, dtype=np.float64)
    if arr.shape[1] != out_w:
        mat_w = resize_matrix(arr.shape[1], out_w)
        arr = np.einsum('ow,hw...->ho...', mat_w, arr)
    if arr.shape[0] != out_h:
        mat_h = resize_matrix(arr.shape[0], out_h)
        arr = np.einsum('oh,hw...->ow...', mat_h, arr)
    return arr


def resize_bicubic(img, out_h, out_w, dtype=None):
    """Batched NHWC bicubic resize on device, as two dense matmuls (MXU-bound).

    Matches PIL/:func:`resize_float` filter weights exactly; differs from PIL's uint8
    output only by fixed-point rounding (|err| <= 1 LSB of uint8).

    :param img: (N, H, W, C) jax array.
    :param out_h/out_w: static output spatial dims.
    """
    n, h, w, c = img.shape
    compute_dtype = dtype or img.dtype
    # full-f32 accumulation: resampling weights are small and parity-critical, so never
    # let the MXU silently downcast them to bf16
    prec = jax.lax.Precision.HIGHEST
    if h != out_h:
        mat_h = jnp.asarray(resize_matrix(h, out_h), dtype=compute_dtype)
        img = jnp.einsum('oh,nhwc->nowc', mat_h, img, precision=prec)
    if w != out_w:
        mat_w = jnp.asarray(resize_matrix(w, out_w), dtype=compute_dtype)
        img = jnp.einsum('ow,nhwc->nhoc', mat_w, img, precision=prec)
    return img


def _torch_cubic_kernel(x, a=-0.75):
    """torch F.interpolate's cubic convolution kernel (a=-0.75, support 2)."""
    ax = np.abs(x)
    return np.where(ax <= 1, (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1,
                    np.where(ax < 2,
                             a * ax ** 3 - 5 * a * ax ** 2 + 8 * a * ax - 4 * a,
                             0.0))


def torch_interp_matrix(in_size, out_size):
    """(out, in) weight matrix reproducing torch ``F.interpolate(mode='bicubic',
    align_corners=False)``: fixed 4-tap a=-0.75 kernel, NO antialiasing on
    downscale (unlike PIL, which widens the filter), border indices clamped."""
    scale = in_size / out_size
    i = np.arange(out_size)
    src = (i + 0.5) * scale - 0.5
    base = np.floor(src).astype(int) - 1
    mat = np.zeros((out_size, in_size), np.float32)
    for t in range(4):
        idx = base + t
        w = _torch_cubic_kernel(src - idx).astype(np.float32)
        np.add.at(mat, (i, np.clip(idx, 0, in_size - 1)), w)
    return mat


def interpolate_bicubic_torch(img, out_h, out_w, dtype=None):
    """Batched NHWC torch-style bicubic interpolation (two MXU matmuls).

    Matches ``F.interpolate(x, (out_h, out_w), mode='bicubic')`` — the kernel the
    reference's face-embedding preprocess uses (lightCNN.py:119) — NOT the PIL
    antialiased filter of :func:`resize_bicubic`; the two differ materially on
    downscales, so embeddings must use this one to be reference-comparable.
    """
    n, h, w, c = img.shape
    compute_dtype = dtype or img.dtype
    prec = jax.lax.Precision.HIGHEST
    if h != out_h:
        mat_h = jnp.asarray(torch_interp_matrix(h, out_h), dtype=compute_dtype)
        img = jnp.einsum('oh,nhwc->nowc', mat_h, img, precision=prec)
    if w != out_w:
        mat_w = jnp.asarray(torch_interp_matrix(w, out_w), dtype=compute_dtype)
        img = jnp.einsum('ow,nhwc->nhoc', mat_w, img, precision=prec)
    return img
