"""Native libpng decoder: bit-exactness vs PIL + fallback behavior."""
import os
import tempfile

import numpy as np
import PIL.Image
import pytest

from sisr_tpu.native import decode_png_rgb8, get_image_library

SET5_HR = '/root/reference/Data/example_data/Set5/hr'

needs_native = pytest.mark.skipif(get_image_library() is None,
                                  reason='native image library unavailable')


@needs_native
@pytest.mark.skipif(not os.path.isdir(SET5_HR), reason='Set5 example data missing')
def test_set5_decode_bit_exact():
    for f in sorted(os.listdir(SET5_HR)):
        path = os.path.join(SET5_HR, f)
        ref = np.array(PIL.Image.open(path).convert('RGB'))
        arr = decode_png_rgb8(path)
        assert arr is not None and arr.dtype == np.uint8
        assert np.array_equal(arr, ref), f


@needs_native
def test_png_flavours_match_pil():
    rng = np.random.RandomState(0)
    cases = {
        'rgb': PIL.Image.fromarray(rng.randint(0, 256, (40, 30, 3), np.uint8), 'RGB'),
        'rgba': PIL.Image.fromarray(rng.randint(0, 256, (40, 30, 4), np.uint8), 'RGBA'),
        'gray': PIL.Image.fromarray(rng.randint(0, 256, (40, 30), np.uint8), 'L'),
        'la': PIL.Image.fromarray(rng.randint(0, 256, (40, 30, 2), np.uint8), 'LA'),
        'palette': PIL.Image.fromarray(rng.randint(0, 256, (40, 30), np.uint8), 'P'),
    }
    with tempfile.TemporaryDirectory() as d:
        for name, im in cases.items():
            path = os.path.join(d, name + '.png')
            im.save(path)
            ref = np.array(PIL.Image.open(path).convert('RGB'))
            arr = decode_png_rgb8(path)
            assert arr is not None and np.array_equal(arr, ref), name


@needs_native
def test_16bit_and_non_png_fall_back():
    with tempfile.TemporaryDirectory() as d:
        im16 = PIL.Image.new('I;16', (30, 40))
        im16.putdata(list(range(1200)))
        p16 = os.path.join(d, 'deep.png')
        im16.save(p16)
        assert decode_png_rgb8(p16) is None  # PIL's lossy I;16 path: punt to PIL

        pjpg = os.path.join(d, 'not_a.png')
        PIL.Image.new('RGB', (8, 8)).save(pjpg, format='JPEG')  # wrong signature
        assert decode_png_rgb8(pjpg) is None
        assert decode_png_rgb8(os.path.join(d, 'missing.png')) is None


def test_read_image_uses_decoder_and_falls_back():
    from sisr_tpu.data.datasets import SuperResImages
    with tempfile.TemporaryDirectory() as d:
        arr = np.arange(40 * 30 * 3, dtype=np.uint8).reshape(40, 30, 3) % 251
        path = os.path.join(d, 'im.png')
        PIL.Image.fromarray(arr).save(path)
        im = SuperResImages.read_image(path)
        assert im.dtype == np.uint8 and np.array_equal(im, arr)
        # non-PNG extension goes straight to PIL (returned as the same numpy contract)
        jpath = os.path.join(d, 'im.bmp')
        PIL.Image.fromarray(arr).save(jpath)
        im = SuperResImages.read_image(jpath)
        assert im.dtype == np.uint8 and np.array_equal(im, arr)
