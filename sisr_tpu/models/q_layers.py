"""Meta-attention layers: ParaCALayer (the paper's core contribution), QCALayer, PALayer.

ref: Code/SISR/models/attention_manipulators/q_layer.py (ParaCALayer),
attention_manipulators/architectures.py:13-141 (PALayer, QCALayer styles).

Metadata enters as a flat (B, M) vector (the reference's (B, M, 1, 1) with the singleton
spatial dims dropped); 1x1 convs on 1x1 maps become Dense layers — identical math that XLA
fuses into the surrounding computation.
"""
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import conv, dense


class ParaCALayer(nn.Module):
    """Metadata -> channel-attention vector (ref: q_layer.py:4-49).

    ``num_layers`` Dense layers step the metadata size up to ``network_channels``; with
    >15 metadata entries the intermediate widths interpolate between the two sizes.
    """
    network_channels: int
    num_metadata: int
    nonlinearity: bool = False
    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attributes, return_attention=False):
        multiplier = self.num_layers
        sizes = [self.num_metadata]
        for _ in range(self.num_layers):
            if self.num_metadata > 15:
                sizes.append((self.network_channels - self.num_metadata) // multiplier
                             + self.num_metadata)
            else:
                sizes.append(self.network_channels // multiplier)
            multiplier -= 1

        # attributes may be a (B, M) vector (the usual case — the reference's
        # (B, M, 1, 1)) or a (B, H, W, M) spatial map (SFTMD q-injection feeds the SFT
        # para maps straight in, SFTMD_variants/architectures.py:95-104); the Dense
        # layers apply along the trailing axis either way, matching the 1x1 convs.
        y = attributes.astype(self.dtype)
        multiplier = self.num_layers
        for i in range(self.num_layers):
            y = dense(sizes[i + 1], sizes[i], dtype=self.dtype, name='fc_%d' % i)(y)
            if self.nonlinearity and multiplier != 1:
                y = nn.relu(y)
            multiplier -= 1
        y = nn.sigmoid(y)
        # forensic probe (ref ParaCALayer.forensic, q_layer.py:45-49)
        self.sow('intermediates', 'meta_attention_map', y)
        out = x * (y if y.ndim == x.ndim else y[:, None, None, :])
        if return_attention:
            return out, y
        return out


class PALayer(nn.Module):
    """Pixel attention (ref: attention_manipulators/architectures.py:13-30)."""
    channel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = conv(self.channel // 8, 1, self.channel, padding=0, dtype=self.dtype,
                 name='pa_0')(x)
        y = nn.relu(y)
        y = conv(1, 1, self.channel // 8, padding=0, dtype=self.dtype, name='pa_1')(y)
        y = nn.sigmoid(y)
        # forensic probe (ref PALayer.forensic, attention_manipulators/architectures.py:28-30)
        self.sow('intermediates', 'pixel_attention_map', y)
        return x * y


class QCALayer(nn.Module):
    """Channel attention fused with metadata, six styles
    (ref: attention_manipulators/architectures.py:34-127):

    * ``modulate``          — standard CA, final vector multiplied by the metadata vector
    * ``mini_concat``       — metadata concatenated onto the reduced inner vector
    * ``max_concat``        — metadata concatenated onto the pooled vector
    * ``softmax``           — max_concat + softmax after the final layer
    * ``extended_attention``— four-stage reduction, metadata re-injected at each stage
    * ``standard``          — plain channel attention, metadata ignored
    """
    channel: int
    style: str = 'modulate'
    reduction: int = 16
    num_metadata: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        # reference-parity guard, condition kept verbatim (ref: attention_
        # manipulators/architectures.py:58-59 rejects reduction < 16 — despite the
        # message, it guards SMALL values; large ones hit the channel<reduction
        # zero-width check instead)
        if self.reduction < 16:
            raise RuntimeError('Using an extreme channel attention reduction value')

    @nn.compact
    def __call__(self, x, attributes):
        c = self.channel
        if c < self.reduction:
            # a zero-width reduce Dense has an inf 1/sqrt(fan_in) init bound and
            # silently poisons the forward with NaN
            raise ValueError('QCALayer: channel (%d) < reduction (%d)'
                             % (c, self.reduction))
        c_red = c // self.reduction
        meta = None if attributes is None else attributes.astype(self.dtype)
        from ..ops.masking import masked_global_mean
        y = masked_global_mean(x).astype(self.dtype)  # GAP -> (B, C), mask-aware

        style = self.style
        if style in ('modulate', 'standard'):
            y = dense(c_red, c, dtype=self.dtype, name='du_0')(y)
            y = nn.relu(y)
            y = dense(c, c_red, dtype=self.dtype, name='du_1')(y)
            y = nn.sigmoid(y)
            if style == 'modulate':
                y = y * meta
        elif style in ('max_concat', 'softmax'):
            y = jnp.concatenate([y, meta], axis=-1)
            y = dense(c_red, c + self.num_metadata, dtype=self.dtype, name='du_0')(y)
            y = nn.relu(y)
            y = dense(c, c_red, dtype=self.dtype, name='du_1')(y)
            y = nn.sigmoid(y)
            if style == 'softmax':
                y = nn.softmax(y, axis=-1)
        elif style == 'mini_concat':
            # reference applies the ReLU to the concatenated [reduced | metadata] vector
            # (conv_du = Sequential(ReLU, Conv, Sigmoid) — architectures.py:76-81)
            y = dense(c_red, c, dtype=self.dtype, name='pre_concat')(y)
            y = nn.relu(jnp.concatenate([y, meta], axis=-1))
            y = dense(c, c_red + self.num_metadata, dtype=self.dtype, name='du_1')(y)
            y = nn.sigmoid(y)
        elif style == 'extended_attention':
            fractions = [(c + self.num_metadata, c // 2),
                         (c // 2 + self.num_metadata, c // 4),
                         (c // 4 + self.num_metadata, c_red)]
            for i, (inp, outp) in enumerate(fractions):
                y = jnp.concatenate([y, meta], axis=-1)
                y = dense(outp, inp, dtype=self.dtype, name='feature_%d' % i)(y)
                y = nn.relu(y)
            y = dense(c, c_red, dtype=self.dtype, name='final')(y)
            y = nn.sigmoid(y)
        else:
            raise NotImplementedError('Unknown QCALayer style %s' % style)

        # forensic probe (ref QCALayer.forensic, attention_manipulators/architectures.py:129-141)
        self.sow('intermediates', 'mask_multiplier', y)
        return x * y[:, None, None, :]
