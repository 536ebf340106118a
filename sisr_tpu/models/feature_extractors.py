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

from .blocks import conv, dense

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
    if name in ('vggface', 'lightcnn'):
        if mode not in ('recognition',):
            raise NotImplementedError(
                'Feature extractor %s/%s: only recognition-mode embeddings are '
                'wired to weights here (FACE_SIM); construct the module classes '
                'directly for other taps.' % (name, mode))
        # the reference dispatcher returns fully-LOADED networks; returning a
        # weightless module definition would silently hand callers a randomly-
        # initialized extractor
        return load_face_extractor(name, weights_path)
    raise NotImplementedError('Feature extractor %s/%s not implemented' % (name, mode))


# --- face feature extractors (ref: feature_extractors/{lightCNN,VGGNets}.py) -------------
def _mfm(x, features, kernel_size, in_features, name_prefix, dtype, padding=None):
    """Max-feature-map conv: conv to 2*features then channel-pair max
    (ref: lightCNN.py:8-20)."""
    y = conv(2 * features, kernel_size, in_features, padding=padding, dtype=dtype,
             name=name_prefix)(x)
    return jnp.maximum(y[..., :features], y[..., features:])


class LightCNN29(nn.Module):
    """LightCNN 29-layer face feature network (ref: lightCNN.py:52-122).

    Grayscale 128x128 input; ``extract_features=True`` returns the group4 feature pair
    the reference uses for face similarity; otherwise returns (logits, 256-d fc).
    """
    num_classes: int = 79077
    dtype: Any = jnp.float32

    def _block(self, x, channels, n_blocks, prefix):
        for i in range(n_blocks):
            res = x
            y = _mfm(x, channels, 3, channels, '%s_%d_conv1' % (prefix, i), self.dtype)
            y = _mfm(y, channels, 3, channels, '%s_%d_conv2' % (prefix, i), self.dtype)
            x = y + res
        return x

    def _group(self, x, in_ch, out_ch, prefix, return_pair=False):
        a = _mfm(x, in_ch, 1, in_ch, '%s_a' % prefix, self.dtype, padding=0)
        b = _mfm(a, out_ch, 3, in_ch, '%s_conv' % prefix, self.dtype)
        return (a, b) if return_pair else b

    @staticmethod
    def _pool(x):
        # torch MaxPool2d(2, 2, ceil_mode=True)
        pad_h = x.shape[1] % 2
        pad_w = x.shape[2] % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        constant_values=-jnp.inf)
        return nn.max_pool(x, (2, 2), strides=(2, 2))

    @nn.compact
    def __call__(self, x, extract_features=False, embedding_only=False):
        x = _mfm(x, 48, 5, 1, 'conv1', self.dtype)
        x = self._pool(x)
        x = self._block(x, 48, 1, 'block1')
        x = self._group(x, 48, 96, 'group1')
        x = self._pool(x)
        x = self._block(x, 96, 2, 'block2')
        x = self._group(x, 96, 192, 'group2')
        x = self._pool(x)
        x = self._block(x, 192, 3, 'block3')
        x = self._group(x, 192, 128, 'group3')
        x = self._block(x, 128, 4, 'block4')
        if extract_features:
            return self._group(x, 128, 128, 'group4', return_pair=True)
        x = self._group(x, 128, 128, 'group4')
        x = self._pool(x)
        x = x.reshape(x.shape[0], -1)
        # fc mfm (type=0): linear to 512, pairwise max -> 256 (ref: lightCNN.py:68)
        y = dense(512, x.shape[-1], dtype=self.dtype, name='fc')(x)
        fc = jnp.maximum(y[..., :256], y[..., 256:])
        if embedding_only:
            # FACE_SIM only needs the 256-d fc: the 79077-class fc2 is a 20M-param
            # matmul whose output would be thrown away
            return None, fc
        out = dense(self.num_classes, 256, dtype=self.dtype, name='fc2')(fc)
        return out, fc


def _conv_entry(sd, name):
    return {'kernel': np.asarray(sd['%s.weight' % name]).transpose(2, 3, 1, 0),
            'bias': np.asarray(sd['%s.bias' % name])}


def _dense_entry(sd, name, chw_in=None):
    """torch Linear -> flax Dense; ``chw_in=(C, H, W)`` permutes a flattened-conv input
    from torch's channel-major order to our NHWC flatten order."""
    w = np.asarray(sd['%s.weight' % name])
    if chw_in is not None:
        c, h, wd = chw_in
        w = w.reshape(w.shape[0], c, h, wd).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
    return {'kernel': w.T, 'bias': np.asarray(sd['%s.bias' % name])}


def convert_torch_lightcnn(state_dict):
    """LightCNN_29Layers checkpoint -> LightCNN29 flax params
    (ref: lightCNN.py:52-122 naming; checkpoints carry DataParallel 'module.'
    prefixes and live under a 'state_dict' key — both handled by the loader)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = {'conv1': _conv_entry(sd, 'conv1.filter')}
    for block, n in (('block1', 1), ('block2', 2), ('block3', 3), ('block4', 4)):
        for i in range(n):
            for conv_name in ('conv1', 'conv2'):
                params['%s_%d_%s' % (block, i, conv_name)] = _conv_entry(
                    sd, '%s.%d.%s.filter' % (block, i, conv_name))
    for g in range(1, 5):
        params['group%d_a' % g] = _conv_entry(sd, 'group%d.conv_a.filter' % g)
        params['group%d_conv' % g] = _conv_entry(sd, 'group%d.conv.filter' % g)
    # fc consumes the flattened (128, 8, 8) conv output: permute to our (H, W, C) order
    params['fc'] = _dense_entry(sd, 'fc.filter', chw_in=(128, 8, 8))
    params['fc2'] = _dense_entry(sd, 'fc2')
    return params


def convert_torch_vggface(state_dict):
    """vgg_face_dag.pth -> VggFace flax params (ref: VGGNets.py:9-114 naming)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = {}
    cfg = [(1, 2), (2, 2), (3, 3), (4, 3), (5, 3)]
    for block, n_convs in cfg:
        for i in range(1, n_convs + 1):
            name = 'conv%d_%d' % (block, i)
            params[name] = _conv_entry(sd, name)
    # fc6 consumes the flattened (512, 7, 7) conv output
    params['fc6'] = _dense_entry(sd, 'fc6', chw_in=(512, 7, 7))
    params['fc7'] = _dense_entry(sd, 'fc7')
    params['fc8'] = _dense_entry(sd, 'fc8')
    return params


def _strip_module_prefix(state_dict):
    return {(k[7:] if k.startswith('module.') else k): v
            for k, v in state_dict.items()}


def load_face_extractor(name, weights_path=None, dtype=jnp.float32):
    """Build a pure face-embedding fn ``(N, H, W, 3) float [0,1] -> (N, D)``.

    * ``'lightcnn'``: bicubic-resize to 128x128, BT.601 grayscale, LightCNN29 -> 256-d
      fc features (ref: lightCNN.py:117-121 preprocess + forward).
    * ``'vggface'``: bicubic-resize to 224x224, x255 - VGG-Face mean, fc7 4096-d
      ('recognition' mode, ref: VGGNets.py:110-111).

    Weights default to the reference's external-package paths
    (configuration/constants.py); returns the embedding fn or raises if missing.
    """
    from ..configuration import constants as sconst
    from ..ops.resize import interpolate_bicubic_torch
    if weights_path is None:
        weights_path = {'lightcnn': sconst.lightcnn_weights,
                        'vggface': sconst.vggface_weights}[name]
    if not os.path.isfile(weights_path):
        raise RuntimeError('No %s weights at %s — download the reference external '
                           'package or pass face_weights.' % (name, weights_path))
    import torch
    raw = torch.load(weights_path, map_location='cpu', weights_only=False)
    if isinstance(raw, dict) and 'state_dict' in raw:
        raw = raw['state_dict']
    sd = _strip_module_prefix({k: np.asarray(v) for k, v in raw.items()})

    if name == 'lightcnn':
        params = convert_torch_lightcnn(sd)
        module = LightCNN29(num_classes=params['fc2']['bias'].shape[0], dtype=dtype)

        params = {k: v for k, v in params.items() if k != 'fc2'}  # ~80 MB unused

        def embed(x):
            # torch-kernel bicubic (NOT PIL's antialiased filter): the reference
            # preprocess is F.interpolate(mode='bicubic') — lightCNN.py:119 —
            # and the two kernels differ materially on downscales
            x = interpolate_bicubic_torch(x.astype(jnp.float32), 128, 128,
                                          dtype=jnp.float32)
            luma = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
            _, fc = module.apply({'params': params}, luma[..., None],
                                 embedding_only=True)
            return fc
    elif name == 'vggface':
        params = convert_torch_vggface(sd)
        module = VggFace(mode='recognition', dtype=dtype)
        mean = jnp.asarray(VggFace.MEAN, jnp.float32)

        def embed(x):
            x = interpolate_bicubic_torch(x.astype(jnp.float32), 224, 224,
                                          dtype=jnp.float32)
            return module.apply({'params': params}, x * 255.0 - mean)
    else:
        raise NotImplementedError('Unknown face extractor %r' % name)
    return embed


class VggFace(nn.Module):
    """VGG-Face descriptor network (ref: VGGNets.py:9-114).

    modes: 'p_loss' (conv5_3 pre-activation features), 'recognition' (fc7 features),
    anything else -> class softmax.  Input: (N, H, W, 3), VGG-Face mean-subtracted.
    """
    mode: str = 'recognition'
    dtype: Any = jnp.float32

    MEAN = (129.186279296875, 104.76238250732422, 93.59396362304688)

    @nn.compact
    def __call__(self, x):
        cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        in_ch = 3
        block = 1
        for features, n_convs in cfg:
            for i in range(n_convs):
                x = conv(features, 3, in_ch, dtype=self.dtype,
                         name='conv%d_%d' % (block, i + 1))(x)
                in_ch = features
                last_conv = (block == 5 and i == n_convs - 1)
                if last_conv and self.mode == 'p_loss':
                    return x
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            block += 1
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(dense(4096, x.shape[-1], dtype=self.dtype, name='fc6')(x))
        x = nn.relu(dense(4096, 4096, dtype=self.dtype, name='fc7')(x))
        if self.mode == 'recognition':
            return x
        x = dense(2622, 4096, dtype=self.dtype, name='fc8')(x)
        return nn.softmax(x)
