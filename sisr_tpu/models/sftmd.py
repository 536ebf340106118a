"""SFTMD and its SFT-layer variants (ref: Code/SISR/models/SFTMD_variants/architectures.py).

The SFT (spatial feature transform) layers consume per-pixel metadata maps
(B, H, W, M); the optional q-injection ParaCALayers consume the flat (B, M) vector.
"""
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .blocks import conv, leaky_relu, pixel_shuffle
from .q_layers import ParaCALayer


class ConcatSft(nn.Module):
    """(ref: SFTMD_variants/architectures.py:8-14)"""
    nf: int = 64
    para: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_maps, para_maps):
        x = jnp.concatenate([feature_maps, para_maps.astype(feature_maps.dtype)], axis=-1)
        return conv(self.nf, 3, self.para + self.nf, dtype=self.dtype, name='conv')(x)


class StandardSft(nn.Module):
    """Multiplicative + additive branches (ref: SFTMD_variants/architectures.py:25-56)."""
    nf: int = 64
    para: int = 1
    mask_para: bool = False
    repeats: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_maps, para_maps):
        para = self.para
        if self.mask_para:
            para = 0
        if self.repeats is not None:
            para = para * self.repeats
            para_maps = jnp.tile(para_maps, (1, 1, 1, self.repeats))
        if self.mask_para:
            cat_input = feature_maps
        else:
            cat_input = jnp.concatenate(
                [feature_maps, para_maps.astype(feature_maps.dtype)], axis=-1)
        cin = self.nf + para

        mul = conv(32, 3, cin, dtype=self.dtype, name='mul_conv1')(cat_input)
        mul = leaky_relu(mul, 0.2)
        mul = nn.sigmoid(conv(self.nf, 3, 32, dtype=self.dtype, name='mul_conv2')(mul))

        add = conv(32, 3, cin, dtype=self.dtype, name='add_conv1')(cat_input)
        add = leaky_relu(add, 0.2)
        add = conv(self.nf, 3, 32, dtype=self.dtype, name='add_conv2')(add)

        return feature_maps * mul + add


class SFTLayer(nn.Module):
    """Dispatcher over SFT types (ref: SFTMD_variants/architectures.py:59-76)."""
    sft_type: str = 'standard'
    nf: int = 64
    para: int = 1
    mask_para: bool = False
    repeats: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_maps, para_maps):
        if self.sft_type == 'none':
            return feature_maps
        if self.sft_type == 'weak':
            return feature_maps * para_maps.astype(feature_maps.dtype)
        if self.sft_type == 'concat':
            return ConcatSft(self.nf, self.para, dtype=self.dtype,
                             name='sft_module')(feature_maps, para_maps)
        if self.sft_type == 'standard':
            return StandardSft(self.nf, self.para, self.mask_para, self.repeats,
                               dtype=self.dtype, name='sft_module')(feature_maps, para_maps)
        raise NotImplementedError('Unknown SFT type %s' % self.sft_type)


class SFTResidualBlock(nn.Module):
    """(ref: SFTMD_variants/architectures.py:79-104)"""
    nf: int = 64
    para: int = 1
    sft_type: str = 'standard'
    mask_para: bool = False
    repeats: Optional[int] = None
    q_injection: bool = False
    q_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_maps, para_maps, q_meta=None):
        # the reference feeds its q layers the same SPATIAL para maps as the SFT
        # layers (SFTMD_variants/architectures.py:95-104), running the attention
        # MLP redundantly at every pixel when the metadata is a constant-broadcast
        # vector; ``q_meta`` lets the caller pass the original vector instead —
        # identical math (the MLP is pointwise), one evaluation per image
        kw = dict(nf=self.nf, para=self.para, mask_para=self.mask_para,
                  repeats=self.repeats, sft_type=self.sft_type, dtype=self.dtype)
        q_meta = para_maps if q_meta is None else q_meta
        fea1 = nn.relu(SFTLayer(**kw, name='sft1')(feature_maps, para_maps))
        if self.q_injection:
            fea1 = ParaCALayer(self.nf, self.para, nonlinearity=True,
                               num_layers=self.q_layers, dtype=self.dtype,
                               name='q_1')(fea1, q_meta)
        fea1 = conv(self.nf, 3, self.nf, dtype=self.dtype, name='conv1')(fea1)
        fea2 = nn.relu(SFTLayer(**kw, name='sft2')(fea1, para_maps))
        if self.q_injection:
            fea2 = ParaCALayer(self.nf, self.para, nonlinearity=True,
                               num_layers=self.q_layers, dtype=self.dtype,
                               name='q_2')(fea2, q_meta)
        fea3 = conv(self.nf, 3, self.nf, dtype=self.dtype, name='conv2')(fea2)
        return feature_maps + fea3


class SFTMD(nn.Module):
    """(ref: SFTMD_variants/architectures.py:107-176).

    ``metadata`` is a (B, M) vector when ``q_injection`` is on (the handler also expands
    it to spatial maps for the SFT layers), otherwise a (B, H, W, M) spatial map.
    Output is clamped to [0, 1] like the reference (architectures.py:176).
    """
    in_nc: int = 3
    out_nc: int = 3
    num_features: int = 64
    num_blocks: int = 16
    scale: int = 4
    input_para: int = 1
    sft_type: str = 'standard'
    mask_para: bool = False
    repeats: Optional[int] = None
    q_injection: bool = False
    q_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata):
        nf = self.num_features
        # vector metadata broadcasts to spatial maps for the SFT layers; spatial maps
        # pass straight through (q layers consume the same form, like the reference)
        if metadata.ndim == 2:
            para_maps = jnp.broadcast_to(metadata[:, None, None, :],
                                         (x.shape[0], x.shape[1], x.shape[2],
                                          metadata.shape[-1]))
        else:
            para_maps = metadata

        fea = conv(nf, 3, self.in_nc, dtype=self.dtype, name='conv1')(x)
        fea = leaky_relu(fea, 0.2)
        fea = conv(nf, 3, nf, dtype=self.dtype, name='conv2')(fea)
        fea = leaky_relu(fea, 0.2)
        fea_bef = conv(nf, 3, nf, dtype=self.dtype, name='conv3')(fea)

        q_meta = metadata if metadata.ndim == 2 else para_maps
        fea_in = fea_bef
        for i in range(self.num_blocks):
            fea_in = SFTResidualBlock(nf, self.input_para, self.sft_type, self.mask_para,
                                      self.repeats, self.q_injection, self.q_layers,
                                      dtype=self.dtype,
                                      name='sft_residual_%d' % (i + 1))(
                fea_in, para_maps, q_meta)
        fea_add = fea_in + fea_bef
        fea_fin = SFTLayer(self.sft_type, nf, self.input_para, self.mask_para,
                           self.repeats, dtype=self.dtype, name='sft')(fea_add, para_maps)
        if self.q_injection:
            fea_fin = ParaCALayer(nf, self.input_para, nonlinearity=True,
                                  num_layers=self.q_layers, dtype=self.dtype,
                                  name='final_injection')(fea_fin, q_meta)
        fea = conv(nf, 3, nf, dtype=self.dtype, name='conv_mid')(fea_fin)

        if self.scale == 4:  # two conv+PixelShuffle(2) stages (ref: :141-151)
            fea = conv(nf * self.scale, 3, nf, dtype=self.dtype, name='up_conv1')(fea)
            fea = leaky_relu(pixel_shuffle(fea, 2), 0.2)
            fea = conv(nf * self.scale, 3, nf, dtype=self.dtype, name='up_conv2')(fea)
            fea = leaky_relu(pixel_shuffle(fea, 2), 0.2)
        else:
            fea = conv(nf * self.scale ** 2, 3, nf, dtype=self.dtype, name='up_conv1')(fea)
            fea = leaky_relu(pixel_shuffle(fea, self.scale), 0.2)

        out = conv(self.out_nc, 9, nf, dtype=self.dtype, name='conv_output')(fea)
        return jnp.clip(out, 0.0, 1.0)
