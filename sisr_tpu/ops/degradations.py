"""Gaussian-blur degradation toolkit: kernel generation, PCA encoding, batch blur, noise.

Re-implements the reference's IKC-derived degradation utilities
(ref: Code/sr_tools/gaussian_utils.py:181-424) without torch:

* kernel generation uses the global numpy RNG with the *same draw order* as the reference,
  so seeded runs produce the same kernel sequences;
* PCA via numpy SVD (ref: gaussian_utils.py:196-201 used torch.svd — sign-ambiguous either way);
* blur is reflection-pad + per-image 2D convolution; the batched device path runs as a
  grouped ``lax.conv_general_dilated`` so a whole batch blurs in one XLA op.

Gaussian kernels are centro-symmetric, so correlation (torch ``F.conv2d``) and convolution
coincide — no flipping subtleties.
"""
import numpy as np

import jax
import jax.numpy as jnp


# --- kernel generation (numpy RNG, reference draw order) ---------------------------------
def cal_sigma(sig_x, sig_y, radians):
    """Covariance matrix from axis sigmas + rotation (ref: gaussian_utils.py:203-207)."""
    d = np.array([[sig_x ** 2, 0], [0, sig_y ** 2]])
    u = np.array([[np.cos(radians), -np.sin(radians)], [np.sin(radians), np.cos(radians)]])
    return np.dot(u, np.dot(d, u.T))


def anisotropic_gaussian_kernel(l, sigma_matrix):
    """(ref: gaussian_utils.py:210-216)"""
    ax = np.arange(-l // 2 + 1., l // 2 + 1.)
    xx, yy = np.meshgrid(ax, ax)
    xy = np.hstack((xx.reshape((l * l, 1)), yy.reshape(l * l, 1))).reshape(l, l, 2)
    inverse_sigma = np.linalg.inv(sigma_matrix)
    kernel = np.exp(-0.5 * np.sum(np.dot(xy, inverse_sigma) * xy, 2))
    return kernel / np.sum(kernel)


def isotropic_gaussian_kernel(l, sigma):
    """(ref: gaussian_utils.py:219-223)"""
    ax = np.arange(-l // 2 + 1., l // 2 + 1.)
    xx, yy = np.meshgrid(ax, ax)
    kernel = np.exp(-(xx ** 2 + yy ** 2) / (2. * sigma ** 2))
    return kernel / np.sum(kernel)


def random_anisotropic_gaussian_kernel(sig_min=0.2, sig_max=4.0, scaling=3, l=21):
    """(ref: gaussian_utils.py:226-232) — same np.random draw order."""
    pi = np.random.random() * np.pi * 2 - np.pi
    x = np.random.random() * (sig_max - sig_min) + sig_min
    y = np.clip(np.random.random() * scaling * x, sig_min, sig_max)
    sig = cal_sigma(x, y, pi)
    return anisotropic_gaussian_kernel(l, sig)


def random_isotropic_gaussian_kernel(sig_min=0.2, sig_max=4.0, l=21):
    """(ref: gaussian_utils.py:235-238)"""
    x = np.random.random() * (sig_max - sig_min) + sig_min
    return isotropic_gaussian_kernel(l, x)


def stable_gaussian_kernel(l=21, sig=2.6):
    """(ref: gaussian_utils.py:241-255)"""
    return isotropic_gaussian_kernel(l, sig)


def random_gaussian_kernel(l=21, sig_min=0.2, sig_max=4.0, rate_iso=1.0, scaling=3):
    """(ref: gaussian_utils.py:247-251)"""
    if np.random.random() < rate_iso:
        return random_isotropic_gaussian_kernel(l=l, sig_min=sig_min, sig_max=sig_max)
    return random_anisotropic_gaussian_kernel(l=l, sig_min=sig_min, sig_max=sig_max,
                                              scaling=scaling)


def random_batch_kernel(batch, l=21, sig_min=0.2, sig_max=4.0, rate_iso=1.0, scaling=3):
    """(ref: gaussian_utils.py:258-262)"""
    batch_kernel = np.zeros((batch, l, l))
    for i in range(batch):
        batch_kernel[i] = random_gaussian_kernel(l=l, sig_min=sig_min, sig_max=sig_max,
                                                 rate_iso=rate_iso, scaling=scaling)
    return batch_kernel


def stable_batch_kernel(batch, l=21, sig=2.6):
    """(ref: gaussian_utils.py:265-269)"""
    batch_kernel = np.zeros((batch, l, l))
    for i in range(batch):
        batch_kernel[i] = stable_gaussian_kernel(l=l, sig=sig)
    return batch_kernel


def set_random_seed(seed):
    """Seed all host RNGs (ref: gaussian_utils.py:20-24, minus CUDA)."""
    import random as _random
    _random.seed(seed)
    np.random.seed(seed)


# --- PCA encoding -------------------------------------------------------------------------
def pca_matrix(data, k=2):
    """PCA projection matrix from (N, D) samples -> (D, k) (ref: gaussian_utils.py:196-201)."""
    x = np.asarray(data, dtype=np.float64)
    x = x - x.mean(axis=0, keepdims=True)
    u, s, vt = np.linalg.svd(x.T, full_matrices=False)
    return u[:, :k].astype(np.float32)


# keep the reference's name available for callers expecting it
PCA = pca_matrix


class PCAEncoder:
    """Project (B, l, l) kernels to (B, k) codes (ref: gaussian_utils.py:332-343)."""

    def __init__(self, weight):
        self.weight = np.asarray(weight, dtype=np.float32)  # (l*l, k)
        self.size = self.weight.shape

    def __call__(self, batch_kernel):
        b = batch_kernel.shape[0]
        flat = np.asarray(batch_kernel, dtype=np.float32).reshape(b, -1)
        return flat @ self.weight


# --- blur ---------------------------------------------------------------------------------
def _reflect_pad_hw(img, l):
    """torch ReflectionPad2d-compatible padding on the leading two (H, W) axes."""
    if l % 2 == 1:
        pad = (l // 2, l // 2)
        pads = (pad, pad)
    else:
        pads = ((l // 2, l // 2 - 1), (l // 2, l // 2 - 1))
    widths = (pads[0], pads[1]) + ((0, 0),) * (img.ndim - 2)
    return np.pad(img, widths, mode='reflect')


def blur_image(img_hwc, kernel):
    """Blur a single H,W,C float image with one (l, l) kernel, reflection padding.

    Host-side equivalent of the reference BatchBlur for batch size 1
    (ref: gaussian_utils.py:346-368).
    """
    from scipy.signal import fftconvolve
    l = kernel.shape[-1]
    padded = _reflect_pad_hw(np.asarray(img_hwc, dtype=np.float32), l)
    # torch F.conv2d is CORRELATION: flip the kernel so fftconvolve matches it (for odd
    # l gaussian kernels the two coincide, but even-l sampling grids are asymmetric)
    kernel = np.ascontiguousarray(kernel[::-1, ::-1])
    out = np.stack([fftconvolve(padded[..., c], kernel, mode='valid')
                    for c in range(padded.shape[-1])], axis=-1)
    return out.astype(np.float32)


def batch_blur_nhwc(images, kernels):
    """Blur an NHWC batch with per-image kernels on device, one grouped conv.

    :param images: (N, H, W, C) jax array.
    :param kernels: (N, l, l) jax array.
    """
    n, h, w, c = images.shape
    l = kernels.shape[-1]
    if l % 2 == 1:
        pads = ((l // 2, l // 2), (l // 2, l // 2))
    else:
        pads = ((l // 2, l // 2 - 1), (l // 2, l // 2 - 1))
    x = jnp.pad(images, ((0, 0), pads[0], pads[1], (0, 0)), mode='reflect')
    # reshape to one image with N*C feature groups: (1, H, W, N*C)
    x = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, x.shape[1], x.shape[2], n * c)
    k = jnp.repeat(kernels[:, None, :, :], c, axis=1).reshape(n * c, l, l)
    k = jnp.transpose(k, (1, 2, 0))[:, :, None, :]  # HWIO with I=1, O=N*C
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ('NHWC', 'HWIO', 'NHWC'))
    out = jax.lax.conv_general_dilated(x, k, (1, 1), 'VALID', dimension_numbers=dn,
                                       feature_group_count=n * c)
    return jnp.transpose(out.reshape(h, w, n, c), (2, 0, 1, 3))


# --- noise --------------------------------------------------------------------------------
def random_batch_noise(batch, high, rate_cln=1.0):
    """(ref: gaussian_utils.py:299-304)"""
    noise_level = np.random.uniform(size=(batch, 1)) * high
    noise_mask = np.random.uniform(size=(batch, 1))
    noise_mask[noise_mask < rate_cln] = 0
    noise_mask[noise_mask >= rate_cln] = 1
    return noise_level * noise_mask


def gaussian_noising(arr, sigma, mean=0.0, min_val=0.0, max_val=1.0):
    """Additive gaussian noise with clamp (ref: gaussian_utils.py:307-313).

    NB: the noise field is drawn in H,W,C layout; the reference draws the same
    number of values in 1,C,H,W layout, so under a shared seed the RNG stays in
    lockstep (kernel-sequence parity holds) but the noised IMAGES differ by a
    transpose of the noise field — seeded image-level parity is not promised
    when noise is enabled."""
    noise = np.random.normal(loc=mean, scale=1.0, size=arr.shape) * np.reshape(
        sigma, np.shape(sigma) + (1,) * (arr.ndim - np.ndim(sigma)))
    return np.clip(arr + noise, min_val, max_val).astype(np.float32)


class BatchSRKernel:
    """(ref: gaussian_utils.py:315-329)"""

    def __init__(self, l=21, sig=2.6, sig_min=0.2, sig_max=4.0, rate_iso=1.0, scaling=3):
        self.l = l
        self.sig = sig
        self.sig_min = sig_min
        self.sig_max = sig_max
        self.rate = rate_iso
        self.scaling = scaling

    def __call__(self, random, batch):
        if random:
            return random_batch_kernel(batch, l=self.l, sig_min=self.sig_min,
                                       sig_max=self.sig_max, rate_iso=self.rate,
                                       scaling=self.scaling)
        return stable_batch_kernel(batch, l=self.l, sig=self.sig)


class OnlineDegrader:
    """Blur + PCA-encode (+ optional noise) one HR image — the SRMDPreprocessing equivalent.

    (ref: gaussian_utils.py:371-424).  Input/output are H,W,C float32 in [0, 1].
    Returns (blurred_image, kernel_code[para_input(+1 if noise)], raw_kernel[l, l]).
    """

    def __init__(self, pca, random, para_input=10, kernel=21, noise=True, sig=2.6,
                 sig_min=0.2, sig_max=4.0, rate_iso=1.0, scaling=3, rate_cln=0.2,
                 noise_high=0.08, **kwargs):
        self.encoder = PCAEncoder(pca)
        if sig is None:
            sig = 2.6
        self.kernel_gen = BatchSRKernel(l=kernel, sig=sig, sig_min=sig_min, sig_max=sig_max,
                                        rate_iso=rate_iso, scaling=scaling)
        self.para_in = para_input
        self.l = kernel
        self.noise = noise
        self.rate_cln = rate_cln
        self.noise_high = noise_high
        self.random = random

    def __call__(self, hr_image):
        hr_image = np.asarray(hr_image, dtype=np.float32)
        kernels = self.kernel_gen(self.random, 1)  # (1, l, l)
        blurred = blur_image(hr_image, kernels[0])
        kernel_code = self.encoder(kernels)  # (1, k)
        if self.noise:
            noise_level = random_batch_noise(1, self.noise_high, self.rate_cln)
            blurred = gaussian_noising(blurred, noise_level[0])
            code = np.concatenate([kernel_code, noise_level.astype(np.float32) * 10], axis=1)
        else:
            code = kernel_code
        return blurred, code[0], kernels[0].astype(np.float32)


# compat alias matching the reference class name (ref: gaussian_utils.py:371)
SRMDPreprocessing = OnlineDegrader


def degrade_batch_on_device(hr_batch, kernels, pca, scale, quantize=True):
    """Fully on-device batched degradation: blur -> (uint8 quantize) -> bicubic down.

    The jit-compiled, batched replacement for the host-side per-image
    blur -> ToPILImage -> PIL-bicubic chain (ref: data_handler.py:446-455): one grouped
    conv blurs the whole batch, the PIL uint8 quantization becomes a trunc-to-1/255
    (torchvision ToPILImage semantics), and the downscale runs as two MXU matmuls.
    Matches the host pipeline within 1 uint8 LSB (the PIL fixed-point rounding).

    :param hr_batch: (N, H, W, C) float [0,1]; H, W multiples of ``scale``.
    :param kernels: (N, l, l) blur kernels.
    :param pca: (l*l, k) PCA projection matrix.
    :returns: (lr (N, H/s, W/s, C), kernel codes (N, k), blurred HR (N, H, W, C)).
    """
    from .resize import resize_bicubic

    blurred = batch_blur_nhwc(hr_batch, kernels)
    if quantize:  # emulate the ToPILImage uint8 round trip (mul 255, trunc byte)
        blurred_q = jnp.clip(jnp.floor(blurred * 255.0), 0, 255) / 255.0
    else:
        blurred_q = blurred
    n, h, w, c = hr_batch.shape
    lr = resize_bicubic(blurred_q, h // scale, w // scale)
    codes = None if pca is None else \
        kernels.reshape(kernels.shape[0], -1).astype(jnp.float32) @ \
        jnp.asarray(pca, jnp.float32)
    return lr, codes, blurred
