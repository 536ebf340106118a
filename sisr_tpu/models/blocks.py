"""Shared Flax building blocks for the SR model zoo (NHWC layout).

Equivalents of the reference's shared torch modules
(ref: Code/SISR/models/advanced/common.py, advanced/architectures.py:13-122):
``default_conv`` / ``MeanShift`` / ``Upsampler`` (PixelShuffle) / ``ResBlock`` /
``CALayer`` / ``RCAB`` / ``ResidualGroup``.

Conventions:

* all feature maps are N,H,W,C;
* parameters are initialized with torch's Conv2d default scheme
  (uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias) so training
  dynamics match the reference;
* every module takes a ``dtype`` (compute dtype — pass ``jnp.bfloat16`` for MXU-friendly
  training) while parameters stay float32.
"""
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d/Linear default weight init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    ``shape`` is HWIO for convs / (I, O) for dense; fan_in = prod(shape[:-1]).
    """
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv(features, kernel_size, in_features, stride=1, use_bias=True, padding=None,
         dtype=jnp.float32, name=None, feature_group_count=1):
    """3x3-style conv with torch-default init and explicit k//2 padding.

    For stride 1 and odd kernels this equals torch's ``padding=k//2``
    (ref: common.py:5-8 ``default_conv``).
    """
    if features <= 0 or in_features <= 0:
        # fan_in=0 makes the 1/sqrt(fan_in) init bound inf -> NaN params that
        # silently poison the whole forward; fail loudly at build time instead
        raise ValueError('conv%r: zero-width layer (features=%d, in_features=%d)'
                         % (name, features, in_features))
    if padding is None:
        padding = kernel_size // 2
    return nn.Conv(features, (kernel_size, kernel_size), strides=(stride, stride),
                   padding=padding, use_bias=use_bias,
                   kernel_init=torch_kernel_init,
                   bias_init=torch_bias_init(in_features * kernel_size * kernel_size),
                   dtype=dtype, param_dtype=jnp.float32,
                   feature_group_count=feature_group_count, name=name)


def dense(features, in_features, use_bias=True, dtype=jnp.float32, name=None):
    """1x1-conv-on-a-vector equivalent (used for attention MLPs on pooled features)."""
    if features <= 0 or in_features <= 0:
        # same zero-fan_in NaN-poisoning guard as conv() — covers every attention
        # MLP (CALayer/QCALayer/PALayer/ParaCALayer/SOCA) at the root
        raise ValueError('dense%r: zero-width layer (features=%d, in_features=%d)'
                         % (name, features, in_features))
    return nn.Dense(features, use_bias=use_bias, kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(in_features), dtype=dtype,
                    param_dtype=jnp.float32, name=name)


def pixel_shuffle(x, factor):
    """Depth-to-space: (N, H, W, C*r^2) -> (N, H*r, W*r, C), torch PixelShuffle ordering.

    torch PixelShuffle on NCHW views channels as (C, r, r); with our NHWC weights laid out
    the same way the reshape below reproduces identical pixel placement.
    """
    n, h, w, c = x.shape
    r = factor
    c_out = c // (r * r)
    x = x.reshape(n, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, c_out
    return x.reshape(n, h * r, w * r, c_out)


def pixel_unshuffle(x, factor):
    """Space-to-depth inverse of :func:`pixel_shuffle` (ref: SRMD_blocks.py:76-117)."""
    n, h, w, c = x.shape
    r = factor
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, h // r, w // r, c * r * r)


class MeanShift(nn.Module):
    """Fixed (non-trainable) RGB mean/std shift (ref: common.py:10-18)."""
    rgb_range: float
    rgb_mean: Sequence[float]
    rgb_std: Sequence[float]
    sign: int = -1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        std = jnp.asarray(self.rgb_std, dtype=self.dtype)
        mean = jnp.asarray(self.rgb_mean, dtype=self.dtype)
        return x / std + self.sign * self.rgb_range * mean / std


class Upsampler(nn.Module):
    """conv + PixelShuffle chain for power-of-2 / x3 scales (ref: common.py:20-45)."""
    scale: int
    n_feat: int
    act: bool = False
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.scale
        if (scale & (scale - 1)) == 0:
            for i in range(int(np.log2(scale))):
                x = conv(4 * self.n_feat, 3, self.n_feat, use_bias=self.use_bias,
                         dtype=self.dtype, name='conv_%d' % i)(x)
                x = pixel_shuffle(x, 2)
                if self.act:
                    x = nn.relu(x)
        elif scale == 3:
            x = conv(9 * self.n_feat, 3, self.n_feat, use_bias=self.use_bias,
                     dtype=self.dtype, name='conv_0')(x)
            x = pixel_shuffle(x, 3)
            if self.act:
                x = nn.relu(x)
        else:
            raise NotImplementedError('Upsampler supports 2^n and 3 scales only')
        return x


class ResBlock(nn.Module):
    """conv-relu-conv residual block with res_scale (ref: common.py:48-72)."""
    n_feats: int
    kernel_size: int = 3
    res_scale: float = 1.0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = conv(self.n_feats, self.kernel_size, self.n_feats, use_bias=self.use_bias,
                   dtype=self.dtype, name='conv_0')(x)
        res = nn.relu(res)
        res = conv(self.n_feats, self.kernel_size, self.n_feats, use_bias=self.use_bias,
                   dtype=self.dtype, name='conv_1')(res)
        return res * self.res_scale + x


class CALayer(nn.Module):
    """Squeeze-and-excite channel attention (ref: advanced/architectures.py:13-44).

    GAP -> 1x1 reduce -> ReLU -> 1x1 expand -> sigmoid -> scale.  Implemented on the pooled
    vector with Dense layers (identical math to 1x1 convs on a 1x1 map); XLA fuses the
    whole excite into the surrounding convs.
    """
    channel: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_attention=False):
        from ..ops.masking import masked_global_mean
        if self.channel < self.reduction:
            # channel//reduction would be 0: a zero-width Dense whose 1/sqrt(fan_in)
            # init bound is inf, silently poisoning the whole forward with NaN
            raise ValueError('CALayer: channel (%d) < reduction (%d)'
                             % (self.channel, self.reduction))
        y = masked_global_mean(x)  # (N, C) global average pool (mask-aware)
        y = dense(self.channel // self.reduction, self.channel, dtype=self.dtype,
                  name='du_0')(y)
        y = nn.relu(y)
        # forensic probes (ref CALayer.forensic, advanced/architectures.py:34-44):
        # no-ops unless the 'intermediates' collection is made mutable
        self.sow('intermediates', 'inner_vector', y)
        y = dense(self.channel, self.channel // self.reduction, dtype=self.dtype,
                  name='du_1')(y)
        y = nn.sigmoid(y)
        self.sow('intermediates', 'mask_multiplier', y)
        out = x * y[:, None, None, :]
        if return_attention:
            return out, y
        return out


class RCAB(nn.Module):
    """Residual channel attention block (ref: advanced/architectures.py:48-71)."""
    n_feat: int
    kernel_size: int = 3
    reduction: int = 16
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = conv(self.n_feat, self.kernel_size, self.n_feat, dtype=self.dtype,
                   name='conv_0')(x)
        res = nn.relu(res)
        res = conv(self.n_feat, self.kernel_size, self.n_feat, dtype=self.dtype,
                   name='conv_1')(res)
        res = CALayer(self.n_feat, self.reduction, dtype=self.dtype, name='ca')(res)
        return res + x


class ResidualGroup(nn.Module):
    """Group of RCABs + trailing conv with group residual (ref: advanced/architectures.py:94-110)."""
    n_feat: int
    kernel_size: int = 3
    reduction: int = 16
    res_scale: float = 1.0
    n_resblocks: int = 20
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.n_resblocks):
            res = RCAB(self.n_feat, self.kernel_size, self.reduction, self.res_scale,
                       dtype=self.dtype, name='rcab_%d' % i)(res)
        res = conv(self.n_feat, self.kernel_size, self.n_feat, dtype=self.dtype,
                   name='conv_tail')(res)
        return res + x


def leaky_relu(x, negative_slope=0.2):
    return nn.leaky_relu(x, negative_slope=negative_slope)
