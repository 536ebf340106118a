"""Meta-attention model family: QRCAN, QEDSR, QSAN, QHAN
(ref: Code/SISR/models/attention_manipulators/architectures.py, qsan_blocks.py).

Every module takes ``(x, metadata)`` explicitly instead of the reference's tuple-threading
through ``nn.Sequential``.
"""
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Upsampler, conv
from .advanced import LAM, CSAM
from .san import SOCA, NonlocalCA
from .q_layers import ParaCALayer, PALayer, QCALayer


class QRCAB(nn.Module):
    """Residual channel attention block with metadata fusion
    (ref: attention_manipulators/architectures.py:145-204)."""
    n_feat: int
    kernel_size: int = 3
    reduction: int = 16
    style: str = 'modulate'
    pa: bool = False
    q_layer: bool = False
    num_metadata: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata):
        res = conv(self.n_feat, self.kernel_size, self.n_feat, dtype=self.dtype,
                   name='conv_0')(x)
        res = nn.relu(res)
        res = conv(self.n_feat, self.kernel_size, self.n_feat, dtype=self.dtype,
                   name='conv_1')(res)
        res = QCALayer(self.n_feat, self.style, self.reduction, self.num_metadata,
                       dtype=self.dtype, name='qca')(res, metadata)
        if self.pa:
            res = PALayer(self.n_feat, dtype=self.dtype, name='pa_node')(res)
        if self.q_layer:
            # 'modulate' metadata arrives scale_qpi-EXPANDED to n_feat (handler
            # contract): sizing the MLP from the declared count would silently
            # build a 1->.. ladder with a wrong bias init.  (No parity constraint:
            # the torch reference CRASHES on this combo — its conv in_channels is
            # fixed at num_metadata.)
            q_meta_width = self.n_feat if self.style == 'modulate' \
                else self.num_metadata
            res = ParaCALayer(self.n_feat, q_meta_width, nonlinearity=True,
                              dtype=self.dtype, name='q_node')(res, metadata)
        return res + x


class QResidualGroup(nn.Module):
    """(ref: attention_manipulators/architectures.py:208-243).

    ``num_q_layers`` limits how many leading blocks get a ParaCALayer (None = all).
    """
    n_feat: int
    kernel_size: int = 3
    reduction: int = 16
    n_resblocks: int = 20
    style: str = 'modulate'
    num_metadata: int = 1
    pa: bool = False
    q_layer: bool = False
    num_q_layers: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata):
        res = x
        for index in range(self.n_resblocks):
            q_in = self.q_layer if (self.num_q_layers is None or index < self.num_q_layers) \
                else False
            res = QRCAB(self.n_feat, self.kernel_size, self.reduction, self.style,
                        self.pa, q_in, self.num_metadata, dtype=self.dtype,
                        name='qrcab_%d' % index)(res, metadata)
        res = conv(self.n_feat, self.kernel_size, self.n_feat, dtype=self.dtype,
                   name='final_body')(res)
        return res + x


class QRCAN(nn.Module):
    """RCAN with metadata-fused channel attention
    (ref: attention_manipulators/architectures.py:246-329)."""
    n_resblocks: int = 20
    n_resgroups: int = 10
    n_feats: int = 64
    in_feats: int = 3
    out_feats: int = 3
    scale: int = 4
    reduction: int = 16
    res_scale: float = 1.0
    style: str = 'modulate'
    num_metadata: int = 1
    include_pixel_attention: bool = False
    include_q_layer: bool = False
    selective_meta_blocks: Optional[Sequence[bool]] = None
    num_q_layers_inner_residual: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata):
        n = self.n_feats
        if self.selective_meta_blocks is not None \
                and len(self.selective_meta_blocks) != self.n_resgroups:
            raise ValueError('selective_meta_blocks needs one entry per residual '
                             'group (%d given, n_resgroups=%d).'
                             % (len(self.selective_meta_blocks), self.n_resgroups))
        x = conv(n, 3, self.in_feats, dtype=self.dtype, name='head')(x)
        res = x
        for i in range(self.n_resgroups):
            include_q = self.include_q_layer if (self.selective_meta_blocks is None
                                                 or self.selective_meta_blocks[i]) else False
            res = QResidualGroup(n, 3, self.reduction, self.n_resblocks, self.style,
                                 self.num_metadata, self.include_pixel_attention,
                                 include_q, self.num_q_layers_inner_residual,
                                 dtype=self.dtype, name='group_%d' % i)(res, metadata)
        res = conv(n, 3, n, dtype=self.dtype, name='final_body')(res)
        res = res + x
        out = Upsampler(self.scale, n, dtype=self.dtype, name='upsampler')(res)
        return conv(self.out_feats, 3, n, dtype=self.dtype, name='tail')(out)


class ParamResBlock(nn.Module):
    """EDSR ResBlock + ParaCALayer (ref: attention_manipulators/architectures.py:332-356)."""
    n_feats: int
    n_params: int
    kernel_size: int = 3
    res_scale: float = 1.0
    q_layer_nonlinearity: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata):
        res = conv(self.n_feats, self.kernel_size, self.n_feats, dtype=self.dtype,
                   name='conv_0')(x)
        res = nn.relu(res)
        res = conv(self.n_feats, self.kernel_size, self.n_feats, dtype=self.dtype,
                   name='conv_1')(res)
        res = res * self.res_scale
        res = ParaCALayer(self.n_feats, self.n_params,
                          nonlinearity=self.q_layer_nonlinearity, dtype=self.dtype,
                          name='attention')(res, metadata)
        return res + x


class QEDSR(nn.Module):
    """(ref: attention_manipulators/architectures.py:359-399)."""
    num_features: int = 64
    num_blocks: int = 16
    scale: int = 4
    res_scale: float = 0.1
    in_features: int = 3
    out_features: int = 3
    input_para: int = 1
    q_layer_nonlinearity: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata):
        n = self.num_features
        x = conv(n, 3, self.in_features, dtype=self.dtype, name='head')(x)
        res = x
        for i in range(self.num_blocks):
            res = ParamResBlock(n, self.input_para, 3, self.res_scale,
                                self.q_layer_nonlinearity, dtype=self.dtype,
                                name='block_%d' % i)(res, metadata)
        res = conv(n, 3, n, dtype=self.dtype, name='final_body')(res)
        res = res + x
        out = Upsampler(self.scale, n, dtype=self.dtype, name='upsampler')(res)
        return conv(self.out_features, 3, n, dtype=self.dtype, name='tail')(out)


class QRB(nn.Module):
    """SAN residual block + ParaCALayer (ref: qsan_blocks.py:9-34)."""
    n_feat: int
    kernel_size: int = 3
    num_metadata: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata):
        y = conv(self.n_feat, self.kernel_size, self.n_feat, dtype=self.dtype,
                 name='conv_0')(x)
        y = nn.relu(y)
        y = conv(self.n_feat, self.kernel_size, self.n_feat, dtype=self.dtype,
                 name='conv_1')(y)
        y = ParaCALayer(self.n_feat, self.num_metadata, nonlinearity=True, num_layers=2,
                        dtype=self.dtype, name='q_layer')(y, metadata)
        return y + x


class QLSRAG(nn.Module):
    """Meta-enhanced LSRAG (ref: qsan_blocks.py:37-85)."""
    n_feat: int
    kernel_size: int = 3
    reduction: int = 16
    n_resblocks: int = 10
    num_metadata: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata):
        flow = x
        for i in range(self.n_resblocks):
            flow = QRB(self.n_feat, self.kernel_size, self.num_metadata,
                       dtype=self.dtype, name='qrb_%d' % i)(flow, metadata)
        flow = SOCA(self.n_feat, self.reduction, dtype=self.dtype, name='soca')(flow)
        flow = conv(self.n_feat, self.kernel_size, self.n_feat, dtype=self.dtype,
                    name='conv_last')(flow)
        return x + flow


class QSAN(nn.Module):
    """(ref: attention_manipulators/architectures.py:402-467)."""
    n_resgroups: int = 20
    n_resblocks: int = 10
    n_feats: int = 64
    reduction: int = 16
    scale: int = 4
    n_colors: int = 3
    input_para: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata):
        n = self.n_feats
        gamma = self.param('gamma', nn.initializers.zeros, (1,), jnp.float32)
        x = conv(n, 3, self.n_colors, dtype=self.dtype, name='head')(x)
        non_local = NonlocalCA(in_feat=n, inter_feat=n // 8, dtype=self.dtype,
                               name='non_local')
        xx = non_local(x)
        residual = xx
        for i in range(self.n_resgroups):
            xx = QLSRAG(n, 3, self.reduction, self.n_resblocks, self.input_para,
                        dtype=self.dtype, name='rg_%d' % i)(xx, metadata) \
                + gamma.astype(xx.dtype) * residual
        res = non_local(xx)
        res = res + x
        out = Upsampler(self.scale, n, dtype=self.dtype, name='upsampler')(res)
        return conv(self.n_colors, 3, n, dtype=self.dtype, name='tail')(out)


class QHAN(nn.Module):
    """HAN with meta-attention residual groups
    (ref: attention_manipulators/architectures.py:470-540)."""
    n_resgroups: int = 10
    n_resblocks: int = 20
    n_feats: int = 64
    reduction: int = 16
    num_metadata: int = 0
    scale: int = 4
    n_colors: int = 3
    res_scale: float = 1.0
    num_q_layers_inner_residual: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata):
        n = self.n_feats
        x = conv(n, 3, self.n_colors, dtype=self.dtype, name='head')(x)
        res = x
        stack = []
        for i in range(self.n_resgroups):
            res = QResidualGroup(n, 3, self.reduction, self.n_resblocks, 'standard',
                                 self.num_metadata, False, True,
                                 self.num_q_layers_inner_residual, dtype=self.dtype,
                                 name='group_%d' % i)(res, metadata)
            stack.append(res)
        res = conv(n, 3, n, dtype=self.dtype, name='body_tail')(res)
        stack.append(res)
        res1 = jnp.stack(stack[::-1], axis=1)

        out1 = res
        la = LAM(dtype=self.dtype, name='la')(res1)
        out2 = conv(n, 3, n * (self.n_resgroups + 1), dtype=self.dtype, name='last_conv')(la)
        out1 = CSAM(dtype=self.dtype, name='csa')(out1)
        out = jnp.concatenate([out1, out2], axis=-1)
        res = conv(n, 3, n * 2, dtype=self.dtype, name='last')(out)
        res = res + x
        out = Upsampler(self.scale, n, dtype=self.dtype, name='upsampler')(res)
        return conv(self.n_colors, 3, n, dtype=self.dtype, name='tail')(out)
