"""SPARNet / QSPARNet face-SR networks (ref: Code/SISR/models/SPARNet/{blocks,architectures}.py).

Encoder(stride-2 downs) -> residual body -> decoder(nearest-up) of residual blocks, each
gated by an hourglass spatial-attention map; QSPARNet adds a ParaCALayer after every
residual block.  These models take a pre-upscaled input (im_input='interp').

BatchNorm (the reference default) is stateful: modules take a ``train`` flag and running
stats live in the ``batch_stats`` collection.
"""
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import torch_kernel_init, torch_bias_init
from .q_layers import ParaCALayer


class NormLayer(nn.Module):
    """(ref: SPARNet/blocks.py:10-36)"""
    channels: int
    norm_type: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        nt = self.norm_type.lower()
        if nt == 'bn':
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                dtype=self.dtype, param_dtype=jnp.float32, name='norm')(x)
        if nt == 'in':
            # instance norm with affine params
            mean = x.mean(axis=(1, 2), keepdims=True)
            var = x.var(axis=(1, 2), keepdims=True)
            scale = self.param('scale', nn.initializers.ones, (self.channels,), jnp.float32)
            bias = self.param('bias', nn.initializers.zeros, (self.channels,), jnp.float32)
            y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
            return y * scale.astype(x.dtype) + bias.astype(x.dtype)
        if nt == 'gn':
            return nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                param_dtype=jnp.float32, name='norm')(x)
        if nt == 'pixel':
            return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
        if nt == 'layer':
            return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name='norm')(x)
        if nt == 'none':
            return x
        raise ValueError('Norm type %s not supported' % nt)


class ReluLayer(nn.Module):
    """(ref: SPARNet/blocks.py:39-67)"""
    channels: int
    relu_type: str = 'relu'

    @nn.compact
    def __call__(self, x):
        rt = self.relu_type.lower()
        if rt == 'relu':
            return nn.relu(x)
        if rt == 'leakyrelu':
            return nn.leaky_relu(x, 0.2)
        if rt == 'prelu':
            alpha = self.param('prelu', nn.initializers.constant(0.25),
                               (self.channels,), jnp.float32)
            return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)
        if rt == 'selu':
            return jax.nn.selu(x)
        if rt == 'none':
            return x
        raise ValueError('Relu type %s not supported' % rt)


def _reflect_pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode='reflect')


class ConvLayer(nn.Module):
    """Reflect-pad conv with optional 2x down (stride) / 2x nearest-up
    (ref: SPARNet/blocks.py:70-103)."""
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    scale: str = 'none'
    norm_type: str = 'none'
    relu_type: str = 'none'
    use_pad: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        use_bias = self.norm_type in ['pixel', 'none']
        stride = 2 if self.scale == 'down' else 1
        if self.scale == 'up':
            n, h, w, c = x.shape
            x = jax.image.resize(x, (n, h * 2, w * 2, c), method='nearest')
        if self.use_pad:
            x = _reflect_pad(x, self.kernel_size // 2)
        fan_in = self.in_channels * self.kernel_size ** 2
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    strides=(stride, stride), padding='VALID', use_bias=use_bias,
                    kernel_init=torch_kernel_init, bias_init=torch_bias_init(fan_in),
                    dtype=self.dtype, param_dtype=jnp.float32, name='conv2d')(x)
        x = NormLayer(self.out_channels, self.norm_type, dtype=self.dtype,
                      name='norm')(x, train=train)
        return ReluLayer(self.out_channels, self.relu_type, name='relu')(x)


class HourGlassBlock(nn.Module):
    """Simplified hourglass spatial attention (ref: SPARNet/blocks.py:181-240)."""
    depth: int
    c_in: int
    c_out: int
    c_mid: int = 64
    norm_type: str = 'bn'
    relu_type: str = 'prelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        if self.depth == 0:
            return x
        kw = dict(norm_type=self.norm_type, relu_type=self.relu_type, dtype=self.dtype)

        def level(lv, in_x):
            c1 = self.c_in if lv == self.depth else self.c_mid
            up1 = ConvLayer(c1, self.c_mid, 3, **kw, name='b1_%d' % lv)(in_x, train=train)
            low1 = ConvLayer(c1, self.c_mid, 3, scale='down', **kw,
                             name='b2_%d' % lv)(in_x, train=train)
            if lv > 1:
                low2 = level(lv - 1, low1)
            else:
                low2 = ConvLayer(self.c_mid, self.c_mid, 3, **kw,
                                 name='b2_plus_%d' % lv)(low1, train=train)
            up2 = ConvLayer(self.c_mid, self.c_mid, 3, scale='up', **kw,
                            name='b3_%d' % lv)(low2, train=train)
            if up1.shape[1:3] != up2.shape[1:3]:
                n, _, _, c = up2.shape
                up2 = jax.image.resize(up2, (n, up1.shape[1], up1.shape[2], c),
                                       method='nearest')
            return up1 + up2

        feat = level(self.depth, x)
        att = ConvLayer(self.c_mid, self.c_out, 3, norm_type='none', relu_type='none',
                        dtype=self.dtype, name='out_block')(feat, train=train)
        att_map = nn.sigmoid(att)
        return x * att_map


class ResidualBlock(nn.Module):
    """Pre-activation residual block with hourglass attention and optional metadata
    attention (ref: SPARNet/blocks.py:106-178)."""
    c_in: int
    c_out: int
    relu_type: str = 'prelu'
    norm_type: str = 'bn'
    scale: str = 'none'
    hg_depth: int = 2
    att_name: str = 'spar'
    include_metadata: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata=None, train=False):
        kw = dict(norm_type=self.norm_type, relu_type=self.relu_type, dtype=self.dtype)
        if self.scale == 'none' and self.c_in == self.c_out:
            identity = x
        else:
            identity = ConvLayer(self.c_in, self.c_out, 3, self.scale, dtype=self.dtype,
                                 name='shortcut')(x, train=train)

        out = NormLayer(self.c_in, self.norm_type, dtype=self.dtype,
                        name='preact_norm')(x, train=train)
        out = ReluLayer(self.c_in, self.relu_type, name='preact_relu')(out)

        scales = {'down': ['none', 'down'], 'up': ['up', 'none'],
                  'none': ['none', 'none']}[self.scale]
        out = ConvLayer(self.c_in, self.c_out, 3, scales[0], **kw,
                        name='conv1')(out, train=train)
        out = ConvLayer(self.c_out, self.c_out, 3, scales[1],
                        norm_type=self.norm_type, relu_type='none', dtype=self.dtype,
                        name='conv2')(out, train=train)

        c_attn = 1 if self.att_name.lower() == 'spar' else self.c_out
        out = identity + HourGlassBlock(self.hg_depth, self.c_out, c_attn,
                                        norm_type=self.norm_type,
                                        relu_type=self.relu_type, dtype=self.dtype,
                                        name='att_func')(out, train=train)
        if self.include_metadata is not None:
            out = ParaCALayer(self.c_out, self.include_metadata, nonlinearity=True,
                              dtype=self.dtype,
                              name='metadata_attention')(out, metadata)
        return out


class SPARNet(nn.Module):
    """(ref: SPARNet/architectures.py:7-75).  QSPARNet behaviour via ``metadata_count``."""
    min_ch: int = 32
    max_ch: int = 128
    in_size: int = 128
    out_size: int = 128
    min_feat_size: int = 16
    res_depth: int = 10
    relu_type: str = 'leakyrelu'
    norm_type: str = 'bn'
    att_name: str = 'spar'
    bottleneck_size: int = 4
    metadata_count: Optional[int] = None
    metadata_encoder_only: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata=None, train=False):
        ch_clip = lambda v: max(self.min_ch, min(v, self.max_ch))
        down_steps = int(np.log2(self.in_size // self.min_feat_size))
        up_steps = int(np.log2(self.out_size // self.min_feat_size))
        n_ch = ch_clip(self.max_ch // int(np.log2(self.in_size // self.min_feat_size) + 1))
        nr = dict(norm_type=self.norm_type, relu_type=self.relu_type,
                  att_name=self.att_name, dtype=self.dtype)
        body_meta = None if (self.metadata_encoder_only or self.metadata_count is None) \
            else self.metadata_count

        # encoder
        out = ConvLayer(3, n_ch, 3, dtype=self.dtype, name='encoder_0')(x, train=train)
        hg_depth = int(np.log2(64 / self.bottleneck_size))
        for i in range(down_steps):
            cin, cout = ch_clip(n_ch), ch_clip(n_ch * 2)
            out = ResidualBlock(cin, cout, scale='down', hg_depth=hg_depth,
                                include_metadata=self.metadata_count, **nr,
                                name='encoder_%d' % (i + 1))(out, metadata, train=train)
            n_ch = n_ch * 2
            hg_depth = hg_depth - 1
        hg_depth = hg_depth + 1

        # residual body
        for i in range(self.res_depth + 3 - down_steps):
            channels = ch_clip(n_ch)
            out = ResidualBlock(channels, channels, hg_depth=hg_depth,
                                include_metadata=body_meta, **nr,
                                name='res_%d' % i)(out, metadata, train=train)

        # decoder
        for i in range(up_steps):
            hg_depth = hg_depth + 1
            cin, cout = ch_clip(n_ch), ch_clip(n_ch // 2)
            out = ResidualBlock(cin, cout, scale='up', hg_depth=hg_depth,
                                include_metadata=body_meta, **nr,
                                name='decoder_%d' % i)(out, metadata, train=train)
            n_ch = n_ch // 2

        return ConvLayer(ch_clip(n_ch), 3, 3, dtype=self.dtype,
                         name='out_conv')(out, train=train)


# QSPARNet is SPARNet with metadata_count set (ref: SPARNet/architectures.py:78-154)
QSPARNet = SPARNet
