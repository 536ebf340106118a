"""Image quality metrics: PSNR and SSIM, host (numpy) and device (jax) variants.

PSNR follows the reference exactly (ref: Code/sr_tools/metrics.py:6-17): mean over the full
array, ``20*log10(max/sqrt(mse))``, 100 when mse == 0.

SSIM reimplements ``skimage.metrics.structural_similarity`` with the reference's settings
(ref: metrics.py:74-90): ``gaussian_weights=True, sigma=1.5, use_sample_covariance=False``,
i.e. 11-tap gaussian windows (truncate=3.5), cov_norm = 1, and the result averaged over the
map cropped by ``(win-1)//2`` on every side.  skimage itself is not available in this
environment, so this file is the canonical implementation.

The :class:`Metrics` hub mirrors the reference's class (ref: metrics.py:20-121) but takes
N,H,W,C (channel-last) batches — the framework's native layout.  PSNR/SSIM are computed on
channel 0 (the Y channel) exactly like the reference's ``im_a[:, 0, :, :]`` indexing.
"""
from collections import defaultdict

import numpy as np
from scipy.ndimage import gaussian_filter

import jax
import jax.numpy as jnp


def psnr(img1, img2, max_value=255.0):
    """PSNR between two arrays (any shape) — ref: metrics.py:6-17."""
    mse = np.mean((np.array(img1, dtype=np.float32) - np.array(img2, dtype=np.float32)) ** 2)
    if mse == 0:
        return 100
    return 20 * np.log10(max_value / (np.sqrt(mse)))


def _ssim_single(im1, im2, data_range, sigma=1.5, truncate=3.5, k1=0.01, k2=0.03,
                 use_sample_covariance=False):
    """2D single-channel SSIM matching skimage.structural_similarity semantics."""
    im1 = np.asarray(im1, dtype=np.float64)
    im2 = np.asarray(im2, dtype=np.float64)
    r = int(truncate * sigma + 0.5)
    win_size = 2 * r + 1
    if np.any(np.asarray(im1.shape) < win_size):
        raise ValueError('Image is too small for an %d-tap SSIM window.' % win_size)

    filt = lambda x: gaussian_filter(x, sigma=sigma, truncate=truncate)  # mode='reflect'
    ux = filt(im1)
    uy = filt(im2)
    uxx = filt(im1 * im1)
    uyy = filt(im2 * im2)
    uxy = filt(im1 * im2)

    if use_sample_covariance:
        npts = win_size ** im1.ndim
        cov_norm = npts / (npts - 1)
    else:
        cov_norm = 1.0
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux ** 2 + uy ** 2 + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)

    pad = (win_size - 1) // 2
    return s[pad:-pad, pad:-pad].mean()


def structural_similarity(im1, im2, data_range=1.0, multichannel=False, gaussian_weights=True,
                          sigma=1.5, use_sample_covariance=False):
    """skimage-compatible SSIM (gaussian-weighted variant only).

    With ``multichannel=True`` the last axis is treated as channels and per-channel SSIM
    values are averaged, as skimage does.
    """
    if not gaussian_weights:
        raise NotImplementedError('Only the gaussian-weighted SSIM variant is implemented '
                                  '(the only one the framework uses).')
    if multichannel:
        vals = [_ssim_single(im1[..., ch], im2[..., ch], data_range, sigma=sigma,
                             use_sample_covariance=use_sample_covariance)
                for ch in range(im1.shape[-1])]
        return float(np.mean(vals))
    return float(_ssim_single(im1, im2, data_range, sigma=sigma,
                              use_sample_covariance=use_sample_covariance))


# --- device-side (jax, batched) ----------------------------------------------------------
def _gaussian_kernel1d(sigma=1.5, truncate=3.5):
    r = int(truncate * sigma + 0.5)
    x = np.arange(-r, r + 1)
    phi = np.exp(-0.5 / (sigma * sigma) * x ** 2)
    return (phi / phi.sum()).astype(np.float32), r


from collections import OrderedDict as _OrderedDict

_FILTER_MAT_CACHE = _OrderedDict()
_FILTER_MAT_CACHE_MAX = 16  # LRU cap: mixed-size eval sets would otherwise
# accumulate one dense (n, n) f32 matrix per distinct image dimension forever


def _reflect_filter_matrix(n, kern):
    """(n, n) matrix M with M[i, j] = summed gaussian taps mapping source j to output i
    under scipy 'reflect' (symmetric) boundary handling: filtering along an axis of
    length n becomes ONE dense matmul — 1-channel convs lower terribly on the TPU's
    128-lane vector unit, while this rides the MXU."""
    key = (n, kern.tobytes())
    if key not in _FILTER_MAT_CACHE:
        r = (len(kern) - 1) // 2
        m = np.zeros((n, n), np.float32)
        idx = np.arange(n)
        for t, kv in enumerate(kern):
            j = idx + (t - r)
            j = np.where(j < 0, -j - 1, j)
            j = np.where(j >= n, 2 * n - j - 1, j)
            np.add.at(m, (idx, j), kv)
        _FILTER_MAT_CACHE[key] = m
        while len(_FILTER_MAT_CACHE) > _FILTER_MAT_CACHE_MAX:
            _FILTER_MAT_CACHE.popitem(last=False)
    else:
        _FILTER_MAT_CACHE.move_to_end(key)
    return _FILTER_MAT_CACHE[key]


def _filt2d(img, kern, pad):
    """Separable gaussian filter over (N, H, W) with reflect padding, as two MXU
    matmuls (filter matrices are trace-time constants; full-f32 accumulation)."""
    del pad  # boundary handling is folded into the filter matrices
    n_h, n_w = img.shape[1], img.shape[2]
    mh = jnp.asarray(_reflect_filter_matrix(n_h, kern), img.dtype)
    mw = jnp.asarray(_reflect_filter_matrix(n_w, kern), img.dtype)
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum('ij,njw->niw', mh, img, precision=hi)
    return jnp.einsum('nhj,wj->nhw', x, mw, precision=hi)


def ssim_nhw(im1, im2, data_range=1.0, sigma=1.5, truncate=3.5, k1=0.01, k2=0.03):
    """Batched single-channel SSIM on device: (N, H, W) -> (N,).  jit/vmap friendly."""
    kern, r = _gaussian_kernel1d(sigma, truncate)
    win_size = 2 * r + 1
    if im1.shape[1] <= win_size - 1 or im1.shape[2] <= win_size - 1:
        # shapes are static at trace time: fail like the host path instead of
        # silently recording NaN from an empty crop slice
        raise ValueError('Image (%dx%d) is too small for the %d-tap SSIM window.'
                         % (im1.shape[1], im1.shape[2], win_size))
    filt = lambda x: _filt2d(x, kern, r)

    ux, uy = filt(im1), filt(im2)
    uxx, uyy, uxy = filt(im1 * im1), filt(im2 * im2), filt(im1 * im2)
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    pad = (win_size - 1) // 2
    return s[:, pad:-pad, pad:-pad].mean(axis=(1, 2))


def psnr_nhw(im1, im2, max_value=1.0):
    """Batched PSNR on device: (N, ...) -> (N,)."""
    axes = tuple(range(1, im1.ndim))
    mse = jnp.mean((im1.astype(jnp.float32) - im2.astype(jnp.float32)) ** 2, axis=axes)
    return jnp.where(mse == 0, 100.0, 20 * jnp.log10(max_value / jnp.sqrt(mse)))


class Metrics:
    """Metric hub mirroring the reference class (ref: metrics.py:20-121).

    Accepts N,H,W,C numpy batches (channel-last); metric semantics (Y-channel-only PSNR/SSIM,
    keyed output dict ``'{key}{delim}{metric}'``) match the reference.
    """

    def __init__(self, metrics, delimeter='-', device=False, face_extractor=None,
                 **kwargs):
        self.metrics = metrics
        self.delimeter = delimeter
        # (N,H,W,3)[0,1] -> (N,D) embedding fn enabling the FACE_SIM metric (cosine
        # similarity of face embeddings — identity preservation for face SR;
        # ref helpers: get_actual_issame, sr_tools/helper_functions.py:114-127)
        self.face_extractor = face_extractor
        # device=True computes PSNR/SSIM as one jitted batched program on the
        # accelerator (psnr_nhw/ssim_nhw) instead of per-image host numpy — on eval
        # runs the host SSIM (~50 ms/512^2 image) otherwise dominates wall-clock
        self.device = device
        self._dev_fns = None

    def _device_metric(self, metric, im_a, im_ref, max_value):
        if self._dev_fns is None:
            self._dev_fns = {
                'PSNR': jax.jit(lambda a, b, mv: psnr_nhw(a, b, mv)),
                'SSIM': jax.jit(lambda a, b, mv: ssim_nhw(a, b, mv)),
            }
        vals = self._dev_fns[metric](im_a[:, :, :, 0], im_ref[:, :, :, 0],
                                     float(max_value))
        return [float(v) for v in np.asarray(vals)]

    def run_image_metric(self, metric, im_a, im_ref=None, single_values=False, max_value=1,
                         multichannel=False):
        if len(im_a.shape) == 3:
            im_a = np.expand_dims(im_a, axis=0)
        if im_ref is not None and len(im_ref.shape) == 3:
            im_ref = np.expand_dims(im_ref, axis=0)

        if metric == 'FACE_SIM':
            if self.face_extractor is None:
                raise RuntimeError("FACE_SIM requires a face extractor — pass "
                                   "face_weights/face_model (eval CLI) or "
                                   "Metrics(face_extractor=...).")
            if im_ref is None:
                raise Exception('Need a reference to calculate FACE_SIM.')
            ea = np.asarray(self.face_extractor(jnp.asarray(im_a, jnp.float32)))
            eb = np.asarray(self.face_extractor(jnp.asarray(im_ref, jnp.float32)))
            num = np.sum(ea * eb, axis=-1)
            den = np.linalg.norm(ea, axis=-1) * np.linalg.norm(eb, axis=-1) + 1e-12
            sims = (num / den).tolist()
            return sims if single_values else float(np.mean(sims))

        if self.device and metric in ('PSNR', 'SSIM') and single_values \
                and im_ref is not None and not multichannel:
            return self._device_metric(metric, im_a, im_ref, max_value)

        if metric == 'PSNR':
            if im_ref is None:
                raise Exception('Need a reference to calculate PSNR.')
            if single_values:
                return [psnr(im_a[ind, :, :, 0], im_ref[ind, :, :, 0], max_value=max_value)
                        for ind in range(im_a.shape[0])]
            if multichannel:
                return psnr(im_a, im_ref, max_value=max_value)
            return psnr(im_a[:, :, :, 0], im_ref[:, :, :, 0], max_value=max_value)

        elif metric == 'SSIM':
            if im_ref is None:
                raise Exception('Need a reference to calculate SSIM.')
            if multichannel:
                vals = [structural_similarity(im_a[i], im_ref[i], data_range=max_value,
                                              multichannel=True) for i in range(im_a.shape[0])]
                return sum(vals) / len(vals)
            if single_values:
                return [structural_similarity(im_a[ind, :, :, 0], im_ref[ind, :, :, 0],
                                              data_range=max_value)
                        for ind in range(im_a.shape[0])]
            # batch treated as the channel axis, like the reference's (H, W, N) call
            stack_a = np.moveaxis(im_a[:, :, :, 0], 0, -1)
            stack_b = np.moveaxis(im_ref[:, :, :, 0], 0, -1)
            return structural_similarity(stack_a, stack_b, data_range=max_value, multichannel=True)
        else:
            raise ValueError('Unknown metric %s' % metric)

    def run_metrics(self, images, references=None, key='', metrics=None, probe_names=None,
                    max_value=1):
        """Run several metrics over a batch (ref: metrics.py:92-121)."""
        if metrics is None:
            metrics = self.metrics
        diag_string = ''
        output = defaultdict(list)
        for metric in metrics:
            value = self.run_image_metric(metric, images, references, max_value=max_value,
                                          single_values=True)
            if type(value) == dict:
                # NB: keyed by metric_KEY (the reference keys by the loop variable,
                # metrics.py:115, collapsing dict results to their last entry — no
                # shipped metric returns a dict, so behavior is unchanged)
                for metric_key in value.keys():
                    output['%s%s%s' % (key, self.delimeter, metric_key)] = \
                        value[metric_key]
            else:
                output['%s%s%s' % (key, self.delimeter, metric)] = value
            if metric.upper() == 'PSNR':
                diag_string = '{} {}: {:.4f}, '.format(key, metric, np.average(value))
        return output, diag_string
