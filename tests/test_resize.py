import numpy as np
import pytest
from PIL import Image

from sisr_tpu.ops.resize import resize_uint8, resize_float, resize_bicubic


SIZES = [((64, 48), (16, 12)), ((17, 23), (68, 92)), ((128, 128), (32, 32)),
         ((33, 47), (132, 188)), ((100, 80), (25, 20)), ((56, 56), (224, 224))]


@pytest.mark.parametrize('in_size,out_size', SIZES)
def test_uint8_bit_exact_vs_pil(rng, in_size, out_size):
    """The fixed-point path must be bit-identical to Pillow BICUBIC."""
    img = rng.randint(0, 256, (*in_size, 3)).astype(np.uint8)
    pil = np.array(Image.fromarray(img).resize(out_size[::-1], resample=Image.BICUBIC))
    ours = resize_uint8(img, out_size[::-1])
    assert np.array_equal(pil, ours)


@pytest.mark.parametrize('in_size,out_size', SIZES[:3])
def test_float_path_close_to_pil(rng, in_size, out_size):
    img = rng.randint(0, 256, (*in_size, 3)).astype(np.uint8)
    pil = np.array(Image.fromarray(img).resize(out_size[::-1], resample=Image.BICUBIC)).astype(np.float64)
    ours = np.clip(np.round(resize_float(img.astype(np.float64), out_size[::-1])), 0, 255)
    # float path skips the intermediate-pass clamping; only ringing pixels can deviate
    assert np.mean(np.abs(pil - ours)) < 0.5


@pytest.mark.parametrize('in_size,out_size', SIZES[:4])
def test_jax_matches_float_path(rng, in_size, out_size):
    img = rng.rand(2, *in_size, 3).astype(np.float32)
    dev = np.asarray(resize_bicubic(img, out_size[0], out_size[1]))
    host = np.stack([resize_float(img[i], out_size[::-1]) for i in range(2)])
    np.testing.assert_allclose(dev, host, atol=2e-5)


def test_grayscale_and_identity(rng):
    img = rng.randint(0, 256, (40, 40)).astype(np.uint8)
    out = resize_uint8(img, (40, 40))
    assert np.array_equal(out, img)  # no resampling pass should run
    pil = np.array(Image.fromarray(img).resize((10, 10), resample=Image.BICUBIC))
    assert np.array_equal(pil, resize_uint8(img, (10, 10)))


def test_native_resampler_bit_exact(rng):
    """The C++ resampler must match both PIL and the numpy reference path exactly."""
    from sisr_tpu import native
    if native.get_library() is None:
        pytest.skip('no C++ toolchain available')
    for (h, w, oh, ow) in [(64, 48, 16, 12), (17, 23, 68, 92), (33, 47, 132, 188),
                           (100, 80, 25, 20), (7, 5, 1, 1)]:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        pil = np.array(Image.fromarray(img).resize((ow, oh), resample=Image.BICUBIC))
        ours = native.resize_bicubic_u8(img, oh, ow)
        assert np.array_equal(pil, ours), (h, w, oh, ow)
    # grayscale 2D path
    img = rng.randint(0, 256, (40, 30)).astype(np.uint8)
    pil = np.array(Image.fromarray(img).resize((10, 15), resample=Image.BICUBIC))
    assert np.array_equal(pil, native.resize_bicubic_u8(img, 15, 10))


def test_native_resampler_speed(rng):
    from sisr_tpu import native
    if native.get_library() is None:
        pytest.skip('no C++ toolchain available')
    import time
    img = rng.randint(0, 256, (256, 256, 3)).astype(np.uint8)
    t0 = time.perf_counter()
    for _ in range(5):
        native.resize_bicubic_u8(img, 1024, 1024)
    native_t = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    Image.fromarray(img).resize((1024, 1024), resample=Image.BICUBIC)
    pil_t = time.perf_counter() - t0
    # must be in PIL's league (within 4x), not numpy's (12x slower)
    assert native_t < pil_t * 4, (native_t, pil_t)


def test_torch_bicubic_interpolation_parity():
    """interpolate_bicubic_torch must match torch F.interpolate(mode='bicubic',
    align_corners=False) — the reference face-embedding preprocess kernel, which
    differs from PIL's antialiased filter on downscales."""
    import numpy as np
    import torch
    import torch.nn.functional as F
    from sisr_tpu.ops.resize import interpolate_bicubic_torch
    rng = np.random.RandomState(0)
    for (h, w), (oh, ow) in [((128, 128), (128, 128)), ((512, 512), (128, 128)),
                             ((100, 172), (128, 128)), ((64, 64), (224, 224))]:
        x = rng.rand(2, h, w, 3).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                            size=(oh, ow), mode='bicubic', align_corners=False)
        ref = ref.numpy().transpose(0, 2, 3, 1)
        out = np.asarray(interpolate_bicubic_torch(x, oh, ow))
        np.testing.assert_allclose(out, ref, atol=2e-5)
