import numpy as np
import pytest

from sisr_tpu.ops import colorspace as cs


@pytest.fixture
def chw_image(rng):
    return rng.rand(3, 17, 23).astype(np.float32)


def test_jpg_forward_golden(chw_image):
    """Coefficients must match the reference formulas (image_manipulation.py:65-75)."""
    img = chw_image
    y, cb, cr = cs.rgb_to_ycbcr(img, y_only=False, max_val=1, im_type='jpg')
    bias_c = 128. / 255
    np.testing.assert_allclose(y, 0.299 * img[0] + 0.587 * img[1] + 0.114 * img[2], rtol=1e-6)
    np.testing.assert_allclose(cb, bias_c + (-0.168736 * img[0] - 0.331264 * img[1] + 0.5 * img[2]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(cr, bias_c + (0.5 * img[0] - 0.418688 * img[1] - 0.081312 * img[2]), rtol=1e-5, atol=1e-7)


def test_png_forward_golden(chw_image):
    img = chw_image
    y, cb, cr = cs.rgb_to_ycbcr(img, y_only=False, max_val=1, im_type='png')
    bias_y, bias_c = 16. / 255, 128. / 255
    np.testing.assert_allclose(y, bias_y + (65.481 * img[0] + 128.553 * img[1] + 24.966 * img[2]) / 255., rtol=1e-5)
    np.testing.assert_allclose(cb, bias_c + (-37.797 * img[0] - 74.203 * img[1] + 112.0 * img[2]) / 255., rtol=1e-4, atol=1e-7)


def test_jpg_roundtrip(chw_image):
    ycbcr = cs.ycbcr_convert(chw_image, y_only=False, im_type='jpg', input='rgb')
    rgb = cs.ycbcr_convert(ycbcr, im_type='jpg', input='ycbcr')
    np.testing.assert_allclose(rgb, chw_image, atol=1e-5)


def test_png_roundtrip(chw_image):
    ycbcr = cs.ycbcr_convert(chw_image, y_only=False, im_type='png', input='rgb')
    rgb = cs.ycbcr_convert(ycbcr, im_type='png', input='ycbcr')
    np.testing.assert_allclose(rgb, chw_image, atol=2e-3)  # studio-range matrix is not an exact inverse pair


def test_y_only_shape(chw_image):
    out = cs.ycbcr_convert(chw_image, y_only=True, im_type='jpg', input='rgb')
    assert out.shape == (1, 17, 23)


def test_nhwc_matches_numpy(chw_image):
    nhwc = np.transpose(chw_image, (1, 2, 0))[None]
    dev = np.asarray(cs.rgb_to_ycbcr_nhwc(nhwc.astype(np.float32), im_type='jpg'))
    host = cs.ycbcr_convert(chw_image, y_only=False, im_type='jpg', input='rgb')
    np.testing.assert_allclose(dev[0], np.transpose(host, (1, 2, 0)), atol=1e-5)

    back = np.asarray(cs.ycbcr_to_rgb_nhwc(dev.astype(np.float32), im_type='jpg'))
    np.testing.assert_allclose(back[0], nhwc[0], atol=1e-5)


def test_transform_class(chw_image):
    hwc = np.transpose(chw_image, (1, 2, 0))
    conv = cs.RGBtoYCbCrConverter(im_type='jpg', y_only=True)
    out = conv(hwc)
    assert out.shape == (17, 23, 1)
    np.testing.assert_allclose(out[..., 0], 0.299 * hwc[..., 0] + 0.587 * hwc[..., 1] + 0.114 * hwc[..., 2], rtol=1e-5)
