"""SRCNN and VDSR (ref: Code/SISR/models/basic/architectures.py).

Both are Y-channel, pre-upscaled-input models: they receive the bicubic-interpolated LR
luminance and predict the restored luminance at the same resolution.
"""
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import conv


class SRCNN(nn.Module):
    """Plain conv stack (ref: basic/architectures.py:6-60).

    Default pattern: kernels [9, 5, 5], channels [1, 64, 32, 1], 'same' padding.
    """
    kernel_pattern: Optional[Sequence[int]] = None
    channel_pattern: Optional[Sequence[int]] = None
    padding: str = 'same'
    dtype: Any = jnp.float32

    def _patterns(self):
        kernels = list(self.kernel_pattern or [9, 5, 5])
        channels = list(self.channel_pattern or [1, 64, 32, 1])
        pads = [k // 2 for k in kernels] if self.padding == 'same' else [0] * len(kernels)
        return kernels, channels, pads

    @nn.compact
    def __call__(self, x, metadata=None):
        kernels, channels, pads = self._patterns()
        for i, k in enumerate(kernels):
            x = conv(channels[i + 1], k, channels[i], padding=pads[i], dtype=self.dtype,
                     name='conv_%d' % i)(x)
            if i != len(kernels) - 1:
                x = nn.relu(x)
        return x


class VDSR(SRCNN):
    """Deeper SRCNN with a global residual (ref: basic/architectures.py:63-77).

    Default: 20 3x3 convs, 64 channels.
    """

    def _patterns(self):
        kernels = list(self.kernel_pattern or [3] * 20)
        channels = list(self.channel_pattern or ([1] + [64] * 19 + [1]))
        pads = [k // 2 for k in kernels] if self.padding == 'same' else [0] * len(kernels)
        return kernels, channels, pads

    @nn.compact
    def __call__(self, x, metadata=None):
        residual = x
        out = x
        kernels, channels, pads = self._patterns()
        for i, k in enumerate(kernels):
            out = conv(channels[i + 1], k, channels[i], padding=pads[i], dtype=self.dtype,
                       name='conv_%d' % i)(out)
            if i != len(kernels) - 1:
                out = nn.relu(out)
        return out + residual
