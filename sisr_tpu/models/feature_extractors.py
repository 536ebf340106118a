"""Feature extractors for perceptual losses / face metrics.

ref: Code/SISR/models/feature_extractors/{VGGNets.py,lightCNN.py,handlers.py}.

The reference downloads pretrained torchvision VGG19 weights at runtime; this environment
has no network egress and no torchvision, so the extractor loads weights from a file
(torch ``.pth`` state_dict or ``.npz``) if one is provided; otherwise construction fails
with a clear error (a randomly-initialized perceptual loss would silently train wrong).
"""
import os
from typing import Any

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from .blocks import conv

# VGG19 convolutional configuration (channels per conv, 'M' = maxpool)
_VGG19_CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
              512, 512, 512, 512, 'M', 512, 512, 512, 512, 'M']


class VGG19Features(nn.Module):
    """VGG19 feature trunk up to a chosen conv layer (default conv5_4 — 'VGG54',
    the reference's perceptual-loss tap, VGGNets.py:118-131)."""
    feature_layer: int = 35  # torchvision index of conv5_4 output pre-activation region
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torchvision normalization
        mean = jnp.asarray([0.485, 0.456, 0.406], dtype=x.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], dtype=x.dtype)
        x = (x - mean) / std

        layer_idx = 0
        in_ch = 3
        for v in _VGG19_CFG:
            if layer_idx >= self.feature_layer:
                break
            if v == 'M':
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                layer_idx += 1
            else:
                x = conv(v, 3, in_ch, dtype=self.dtype, name='conv_%d' % layer_idx)(x)
                layer_idx += 1
                if layer_idx >= self.feature_layer:
                    break
                x = nn.relu(x)
                layer_idx += 1
                in_ch = v
        return x


def _convert_torch_vgg(state_dict):
    """Map torchvision vgg19 ``features.N.weight`` (OIHW) to our conv params (HWIO)."""
    params = {}
    for key, value in state_dict.items():
        if not key.startswith('features.'):
            continue
        _, idx, kind = key.split('.')
        arr = np.asarray(value)
        name = 'conv_%s' % idx
        entry = params.setdefault(name, {})
        if kind == 'weight':
            entry['kernel'] = arr.transpose(2, 3, 1, 0)
        else:
            entry['bias'] = arr
    return params


def load_vgg_extractor(weights_path=None, feature_layer=35, dtype=jnp.float32):
    """Build a pure ``(N, H, W, 3) -> features`` fn, loading pretrained weights.

    Returns None (caller should gate the perceptual loss) when no weights file exists.
    """
    if weights_path is None or not os.path.isfile(weights_path):
        return None
    if weights_path.endswith('.npz'):
        raw = dict(np.load(weights_path))
        state_dict = raw
    else:
        import torch
        state_dict = {k: v.numpy() for k, v in
                      torch.load(weights_path, map_location='cpu', weights_only=True).items()}
    params = _convert_torch_vgg(state_dict)
    module = VGG19Features(feature_layer=feature_layer, dtype=dtype)

    def apply_fn(x):
        return module.apply({'params': params}, x)

    return apply_fn


def perceptual_loss_mechanism(name, mode='recognition', weights_path=None):
    """Dispatcher kept for reference-API parity (ref: feature_extractors/handlers.py:5-14)."""
    if name == 'vgg' and mode == 'p_loss':
        apply_fn = load_vgg_extractor(weights_path)
        if apply_fn is None:
            raise RuntimeError('VGG19 weights unavailable — supply weights_path '
                               '(torch .pth state_dict or .npz).')
        return apply_fn
    raise NotImplementedError('Feature extractor %s/%s not implemented' % (name, mode))
