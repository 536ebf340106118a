import numpy as np
import pytest

from sisr_tpu.ops import metrics as M


def test_psnr_golden():
    a = np.zeros((8, 8), dtype=np.float32)
    b = np.full((8, 8), 0.1, dtype=np.float32)
    # mse = 0.01 -> psnr = 20*log10(1/0.1) = 20
    assert abs(M.psnr(a, b, max_value=1.0) - 20.0) < 1e-4
    assert M.psnr(a, a) == 100


def test_ssim_identical_is_one(rng):
    img = rng.rand(32, 32).astype(np.float32)
    assert abs(M.structural_similarity(img, img, data_range=1.0) - 1.0) < 1e-9


def test_ssim_monotone_with_noise(rng):
    img = rng.rand(64, 64).astype(np.float32)
    s1 = M.structural_similarity(img, np.clip(img + rng.randn(64, 64) * 0.02, 0, 1), data_range=1.0)
    s2 = M.structural_similarity(img, np.clip(img + rng.randn(64, 64) * 0.2, 0, 1), data_range=1.0)
    assert 0 < s2 < s1 < 1


def test_ssim_scale_invariance(rng):
    """SSIM(x, y, range=1) == SSIM(255x, 255y, range=255)."""
    a = rng.rand(32, 32)
    b = np.clip(a + rng.randn(32, 32) * 0.05, 0, 1)
    s1 = M.structural_similarity(a, b, data_range=1.0)
    s255 = M.structural_similarity(a * 255, b * 255, data_range=255.0)
    assert abs(s1 - s255) < 1e-9


def test_ssim_known_constant_shift():
    """Uniform images: variances are 0, so SSIM = (2*ux*uy+C1)/(ux^2+uy^2+C1) exactly."""
    a = np.full((32, 32), 0.4)
    b = np.full((32, 32), 0.6)
    c1 = 0.01 ** 2
    expected = (2 * 0.4 * 0.6 + c1) / (0.4 ** 2 + 0.6 ** 2 + c1)
    assert abs(M.structural_similarity(a, b, data_range=1.0) - expected) < 1e-7


def test_device_ssim_matches_host(rng):
    a = rng.rand(3, 48, 40).astype(np.float32)
    b = np.clip(a + rng.randn(3, 48, 40).astype(np.float32) * 0.1, 0, 1).astype(np.float32)
    dev = np.asarray(M.ssim_nhw(a, b, data_range=1.0))
    host = np.array([M.structural_similarity(a[i], b[i], data_range=1.0) for i in range(3)])
    np.testing.assert_allclose(dev, host, atol=2e-4)


def test_device_psnr_matches_host(rng):
    a = rng.rand(3, 16, 16).astype(np.float32)
    b = rng.rand(3, 16, 16).astype(np.float32)
    dev = np.asarray(M.psnr_nhw(a, b, max_value=1.0))
    host = np.array([M.psnr(a[i], b[i], max_value=1.0) for i in range(3)])
    np.testing.assert_allclose(dev, host, rtol=1e-4)


def test_metrics_hub(rng):
    imgs = rng.rand(2, 20, 20, 3).astype(np.float32)
    refs = np.clip(imgs + 0.05 * rng.randn(2, 20, 20, 3).astype(np.float32), 0, 1)
    hub = M.Metrics(['PSNR', 'SSIM'], delimeter='>')
    out, diag = hub.run_metrics(imgs, refs, key='val')
    assert set(out) == {'val>PSNR', 'val>SSIM'}
    assert len(out['val>PSNR']) == 2
    assert 'val PSNR' in diag
    # single-value PSNR must be on channel 0 only
    expected = M.psnr(imgs[0, :, :, 0], refs[0, :, :, 0], max_value=1)
    assert abs(out['val>PSNR'][0] - expected) < 1e-6
