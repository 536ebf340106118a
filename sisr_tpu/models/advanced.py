"""EDSR, RCAN, HAN and SRMD architectures (ref: Code/SISR/models/advanced/architectures.py).

All NHWC Flax modules.  HAN's holistic-attention blocks (LAM / CSAM,
ref: advanced/HAN_blocks.py) live here too.
"""
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (ResBlock, ResidualGroup, Upsampler, conv, pixel_shuffle,
                     torch_kernel_init, torch_bias_init)


class EDSR(nn.Module):
    """(ref: advanced/architectures.py:183-241).  Paper-standard EDSR: 256 feats / 32 blocks
    / res_scale 0.1; framework default 64/16."""
    net_features: int = 64
    num_blocks: int = 16
    scale: int = 4
    res_scale: float = 0.1
    in_features: int = 3
    out_features: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata=None):
        n = self.net_features
        x = conv(n, 3, self.in_features, dtype=self.dtype, name='head')(x)
        res = x
        for i in range(self.num_blocks):
            res = ResBlock(n, 3, res_scale=self.res_scale, dtype=self.dtype,
                           name='block_%d' % i)(res)
        res = conv(n, 3, n, dtype=self.dtype, name='body_tail')(res)
        res = res + x
        out = Upsampler(self.scale, n, dtype=self.dtype, name='upsampler')(res)
        return conv(self.out_features, 3, n, dtype=self.dtype, name='tail')(out)


class RCAN(nn.Module):
    """(ref: advanced/architectures.py:126-180).  10 groups x 20 RCABs by default."""
    n_resblocks: int = 20
    n_resgroups: int = 10
    n_feats: int = 64
    in_feats: int = 3
    out_feats: int = 3
    scale: int = 4
    reduction: int = 16
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata=None):
        n = self.n_feats
        x = conv(n, 3, self.in_feats, dtype=self.dtype, name='head')(x)
        res = x
        for i in range(self.n_resgroups):
            res = ResidualGroup(n, 3, self.reduction, self.res_scale, self.n_resblocks,
                                dtype=self.dtype, name='group_%d' % i)(res)
        res = conv(n, 3, n, dtype=self.dtype, name='body_tail')(res)
        res = res + x
        out = Upsampler(self.scale, n, dtype=self.dtype, name='upsampler')(res)
        return conv(self.out_feats, 3, n, dtype=self.dtype, name='tail')(out)


class LAM(nn.Module):
    """Layer attention over stacked group outputs (ref: HAN_blocks.py:7-37).

    Input: (B, N, H, W, C) stack of the N residual-group outputs.
    Output: (B, H, W, N*C) with layer-major channel ordering (matches the reference's
    ``view(B, N*C, H, W)``).
    """
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, h, w, c = x.shape
        gamma = self.param('gamma', nn.initializers.zeros, (1,), jnp.float32)
        flat = x.reshape(b, n, -1)
        energy = jnp.einsum('bnd,bmd->bnm', flat, flat,
                            preferred_element_type=jnp.float32)
        energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
        attention = jax.nn.softmax(energy_new, axis=-1)
        out = jnp.einsum('bnm,bmd->bnd', attention.astype(flat.dtype), flat)
        out = out.reshape(b, n, h, w, c)
        out = gamma.astype(x.dtype) * out + x
        return out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)


class CSAM(nn.Module):
    """Channel-spatial attention via a 3x3x3 conv over (C, H, W) (ref: HAN_blocks.py:40-76)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        gamma = self.param('gamma', nn.initializers.zeros, (1,), jnp.float32)
        # treat channels as a third spatial dim: (B, C, H, W, 1) NDHWC
        vol = x.transpose(0, 3, 1, 2)[..., None]
        kernel = self.param('conv3d_kernel', torch_kernel_init, (3, 3, 3, 1, 1))
        bias = self.param('conv3d_bias', torch_bias_init(27), (1,))
        dn = jax.lax.conv_dimension_numbers(vol.shape, kernel.shape,
                                            ('NDHWC', 'DHWIO', 'NDHWC'))
        out = jax.lax.conv_general_dilated(vol.astype(self.dtype),
                                           kernel.astype(self.dtype), (1, 1, 1),
                                           'SAME', dimension_numbers=dn)
        out = nn.sigmoid(out + bias.astype(self.dtype))
        out = gamma.astype(x.dtype) * out[..., 0].transpose(0, 2, 3, 1)
        return x * out + x


class HAN(nn.Module):
    """RCAN body + layer attention + channel-spatial attention
    (ref: advanced/architectures.py:314-377)."""
    n_resgroups: int = 10
    n_resblocks: int = 20
    n_feats: int = 64
    reduction: int = 16
    scale: int = 4
    n_colors: int = 3
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata=None):
        n = self.n_feats
        x = conv(n, 3, self.n_colors, dtype=self.dtype, name='head')(x)
        res = x
        stack = []
        for i in range(self.n_resgroups):
            res = ResidualGroup(n, 3, self.reduction, self.res_scale, self.n_resblocks,
                                dtype=self.dtype, name='group_%d' % i)(res)
            stack.append(res)
        res = conv(n, 3, n, dtype=self.dtype, name='body_tail')(res)
        stack.append(res)
        # reference stacks newest first (torch.cat([new, old])) — HAN_blocks usage at
        # advanced/architectures.py:357-362
        res1 = jnp.stack(stack[::-1], axis=1)  # (B, N_groups+1, H, W, C)

        out1 = res
        la = LAM(dtype=self.dtype, name='la')(res1)  # (B, H, W, (n_resgroups+1)*C)
        out2 = conv(n, 3, n * (self.n_resgroups + 1), dtype=self.dtype, name='last_conv')(la)
        out1 = CSAM(dtype=self.dtype, name='csa')(out1)
        out = jnp.concatenate([out1, out2], axis=-1)
        res = conv(n, 3, n * 2, dtype=self.dtype, name='last')(out)
        res = res + x
        out = Upsampler(self.scale, n, dtype=self.dtype, name='upsampler')(res)
        return conv(self.n_colors, 3, n, dtype=self.dtype, name='tail')(out)


class SRMD(nn.Module):
    """Plain deep CNN over RGB concatenated with per-pixel degradation maps
    (ref: advanced/architectures.py:380-425 + SRMD_blocks.py).

    The metadata maps are concatenated by the handler before the call; this module sees a
    single (N, H, W, in_nc) input.  Default: 12 conv layers, nc=128, pixelshuffle tail.
    """
    in_nc: int = 18
    out_nc: int = 3
    nc: int = 128
    nb: int = 12
    scale: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata=None):
        x = conv(self.nc, 3, self.in_nc, dtype=self.dtype, name='conv_0')(x)
        x = nn.relu(x)
        for i in range(self.nb - 2):
            x = conv(self.nc, 3, self.nc, dtype=self.dtype, name='conv_%d' % (i + 1))(x)
            x = nn.relu(x)
        x = conv(self.out_nc * self.scale ** 2, 3, self.nc, dtype=self.dtype,
                 name='conv_tail')(x)
        return pixel_shuffle(x, self.scale)
