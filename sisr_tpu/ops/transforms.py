"""Host-side image transforms used by the data pipeline.

Ports of the reference's PIL/torch transforms (ref: Code/sr_tools/image_manipulation.py)
operating on PIL images (file IO side) and H,W,C float32 numpy arrays (pipeline side).
Randomness uses the global ``random`` module with the reference's draw order so seeded
runs augment identically.
"""
import random

import numpy as np
import PIL.Image

from .resize import resize_uint8


def pil_to_float(img):
    """PIL -> H,W,C float32 in [0,1] (torchvision ToTensor semantics, channel-last)."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def float_to_pil(arr):
    """H,W,C float [0,1] -> PIL uint8 (torchvision ToPILImage semantics: mul 255, byte)."""
    arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[:, :, 0]
    return PIL.Image.fromarray(arr)


def center_crop(image, height, width):
    """Center crop a PIL image (ref: image_manipulation.py:197-208)."""
    res_w = image.width - width
    res_h = image.height - height
    l_crop, top_crop = res_w // 2, res_h // 2
    return image.crop((l_crop, top_crop, width + l_crop, top_crop + height))


def center_crop_np(arr, height, width):
    """Center crop an H,W,C numpy array with the same arithmetic — including PIL's
    behavior when the target EXCEEDS the image: out-of-bounds regions pad with
    zeros (a naive negative slice would wrap around instead)."""
    res_h = arr.shape[0] - height
    res_w = arr.shape[1] - width
    top, left = res_h // 2, res_w // 2
    if res_h >= 0 and res_w >= 0:
        return arr[top:top + height, left:left + width]
    out = np.zeros((height, width) + arr.shape[2:], arr.dtype)
    src_t, src_l = max(top, 0), max(left, 0)
    dst_t, dst_l = max(-top, 0), max(-left, 0)
    h = min(arr.shape[0] - src_t, height - dst_t)
    w = min(arr.shape[1] - src_l, width - dst_l)
    out[dst_t:dst_t + h, dst_l:dst_l + w] = arr[src_t:src_t + h, src_l:src_l + w]
    return out


class CenterCrop:
    def __init__(self, height, width):
        self.height = height
        self.width = width

    def __call__(self, image):
        return center_crop(image, self.height, self.width)


def downsample(image, scale, jm=False):
    """Center-crop to a multiple of scale + bicubic downscale
    (ref: image_manipulation.py:32-53).  Accepts a PIL image; bit-exact PIL BICUBIC.
    """
    if jm:
        corrected_width = ((image.width // scale) // 2) * 2  # JM needs even dims
        corrected_height = ((image.height // scale) // 2) * 2
    else:
        corrected_width = image.width // scale
        corrected_height = image.height // scale
    r_width = corrected_width * scale
    r_height = corrected_height * scale
    r_image = center_crop(image, height=r_height, width=r_width)
    if r_image.mode in ('RGB', 'L'):
        lr = resize_uint8(np.asarray(r_image), (r_width // scale, r_height // scale))
        return r_image, PIL.Image.fromarray(lr)
    # exotic modes (P, 1, RGBA, ...): defer to PIL itself, which resizes in the native
    # mode exactly like the reference (image_manipulation.py:52)
    return r_image, r_image.resize((r_width // scale, r_height // scale),
                                   resample=PIL.Image.BICUBIC)


def random_matched_crop(image_lr, image_hr, crop_size, scale):
    """Matched random LR/HR patch crop on H,W,C arrays
    (ref: image_manipulation.py:233-239, same random draw order)."""
    rnd_h = random.randint(0, max(0, image_lr.shape[0] - crop_size))
    rnd_w = random.randint(0, max(0, image_lr.shape[1] - crop_size))
    cropped_lr = image_lr[rnd_h:rnd_h + crop_size, rnd_w:rnd_w + crop_size, :]
    rnd_h_gt, rnd_w_gt = int(rnd_h * scale), int(rnd_w * scale)
    hs = int(crop_size * scale)
    cropped_hr = image_hr[rnd_h_gt:rnd_h_gt + hs, rnd_w_gt:rnd_w_gt + hs, :]
    return cropped_lr, cropped_hr


def random_flip_rotate(*img, hflip=True, rot=True):
    """Random h/v flips + 90-degree transpose on H,W,C arrays
    (ref: image_manipulation.py:242-257, same draw order; 'hflip' flips the width axis
    like the reference's torch.flip(img, [2]))."""
    hflip = hflip and random.random() < 0.5
    vflip = rot and random.random() < 0.5
    rot90 = rot and random.random() < 0.5

    def _augment(arr):
        if hflip:
            arr = arr[:, ::-1, :]
        if vflip:
            arr = arr[::-1, :, :]
        if rot90:
            arr = arr.transpose(1, 0, 2)
        return np.ascontiguousarray(arr)

    return [_augment(i) for i in img]


def landmark_crop(image, crop_size, landmarks):
    """Centroid crop around facial landmarks (ref: image_manipulation.py:7-22).

    ``image`` is a PIL image; ``landmarks`` an (N, 2) array or the string sentinel the
    reference uses for "no landmarks" (center crop).
    """
    if type(landmarks) == str:
        centroid = (image.width / 2, image.height / 2)
    else:
        centroid = (landmarks.max(0) + landmarks.min(0)) / 2
    l_pos = centroid[0] - (crop_size[0] / 2)
    t_pos = centroid[1] - (crop_size[1] / 2)
    cropped = image.crop((l_pos, t_pos, l_pos + crop_size[0], t_pos + crop_size[1]))
    if type(landmarks) == str:
        scaled = landmarks
    else:
        scaled = np.copy(landmarks)
        scaled[:, 0] = landmarks[:, 0] - l_pos
        scaled[:, 1] = landmarks[:, 1] - t_pos
    return cropped, scaled


def detect_negative_landmarks(landmarks):
    """(ref: image_manipulation.py:25-29)"""
    return bool((landmarks < 0).any())
