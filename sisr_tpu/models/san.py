"""SAN: second-order attention network (ref: Code/SISR/models/advanced/SAN_blocks.py,
advanced/architectures.py:244-311).

Components: embedded-gaussian non-local block (quadrant-split wrapper ``NonlocalCA``),
second-order channel attention (``SOCA`` = covariance pooling + Newton-Schulz matrix
square root, ref: advanced/mpncov.py), local-source residual attention groups (``LSRAG``).

The covariance pool is computed directly as E[xx^T] - mean mean^T (two matmuls) instead of
materializing the reference's M x M centering matrix (ref: mpncov.py:24-30) — identical
math, O(M*C^2) instead of O(M^2*C) and MXU-friendly.  The matrix square root uses plain
autodiff through the 5 Newton-Schulz iterations (the reference's hand-written backward,
mpncov.py:77-112, exists only to save torch graph memory; ``jax.checkpoint`` covers that).

Note: the reference registers torch parameters that its forward never uses (an extra SOCA
inside Nonlocal_CA, SAN_blocks.py:309; a ``gamma`` inside LSRAG, SAN_blocks.py:377).  These
are deliberately not instantiated here, so total parameter counts differ from the torch
printout by exactly those dead parameters.
"""
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Upsampler, conv, dense


def covariance_pool(x):
    """(B, H, W, C) -> (B, C, C) population covariance over spatial positions."""
    b, h, w, c = x.shape
    m = h * w
    flat = x.reshape(b, m, c).astype(jnp.float32)
    mean = flat.mean(axis=1)  # (B, C)
    second = jnp.einsum('bmc,bmd->bcd', flat, flat,
                        preferred_element_type=jnp.float32) / m
    return second - mean[:, :, None] * mean[:, None, :]


def newton_schulz_sqrt(a, num_iters=5):
    """Matrix square root via Newton-Schulz iteration (ref: mpncov.py:49-76).

    Pre-normalizes by trace, iterates, post-compensates by sqrt(trace).  float32.
    """
    b, dim, _ = a.shape
    eye = jnp.eye(dim, dtype=a.dtype)
    i3 = 3.0 * eye
    norm_a = jnp.trace(a, axis1=1, axis2=2)
    a_n = a / norm_a[:, None, None]

    def mm(p, q):
        return jnp.einsum('bij,bjk->bik', p, q, preferred_element_type=jnp.float32)

    zy = 0.5 * (i3 - a_n)
    y = mm(a_n, zy)
    z = zy
    for _ in range(num_iters - 2):
        zy = 0.5 * (i3 - mm(z, y))
        y, z = mm(y, zy), mm(zy, z)
    zy = 0.5 * mm(y, i3 - mm(z, y))
    return zy * jnp.sqrt(norm_a)[:, None, None]


class SOCA(nn.Module):
    """Second-order channel attention (ref: SAN_blocks.py:244-302).

    Center-crops spatial extent at 1000x1000 (static shapes, so a python-level branch),
    covariance pool -> matrix sqrt -> row mean -> reduce/expand MLP -> sigmoid scale.
    """
    channel: int
    reduction: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        h1 = w1 = 1000
        hs = 0 if h < h1 else (h - h1) // 2
        ws = 0 if w < w1 else (w - w1) // 2
        x_sub = x[:, hs:hs + min(h, h1), ws:ws + min(w, w1), :]

        cov = covariance_pool(x_sub)
        cov_sqrt = jax.checkpoint(newton_schulz_sqrt)(cov)
        pooled = cov_sqrt.mean(axis=1).astype(self.dtype)  # (B, C)

        if self.channel < self.reduction:
            raise ValueError('SOCA: channel (%d) < reduction (%d)'
                             % (self.channel, self.reduction))
        y = dense(self.channel // self.reduction, self.channel, dtype=self.dtype,
                  name='du_0')(pooled)
        y = nn.relu(y)
        y = dense(self.channel, self.channel // self.reduction, dtype=self.dtype,
                  name='du_1')(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class NonLocalBlock2D(nn.Module):
    """Embedded-gaussian non-local block (ref: SAN_blocks.py:11-148, mode used by SAN).

    The output projection W is zero-initialized so the block starts as identity,
    exactly like the reference (SAN_blocks.py:58-61).

    NB: the reference's 2-D branch rebinds its ``sub_sample`` local to the Upsample
    class (SAN_blocks.py:39), which is truthy — so its 2-D non-local ALWAYS max-pools
    the g/phi branches by 2 regardless of the ``sub_sample=False`` argument.  That
    behavior (and its memory saving) is reproduced here.
    """
    in_channels: int
    inter_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        m = h * w
        g = conv(self.inter_channels, 1, c, padding=0, dtype=self.dtype, name='g')(x)
        theta = conv(self.inter_channels, 1, c, padding=0, dtype=self.dtype, name='theta')(x)
        phi = conv(self.inter_channels, 1, c, padding=0, dtype=self.dtype, name='phi')(x)
        # g/phi 2x2 max-pool (see class docstring)
        g = nn.max_pool(g, (2, 2), strides=(2, 2))
        phi = nn.max_pool(phi, (2, 2), strides=(2, 2))
        m_sub = g.shape[1] * g.shape[2]

        g = g.reshape(b, m_sub, self.inter_channels)
        theta = theta.reshape(b, m, self.inter_channels)
        phi = phi.reshape(b, m_sub, self.inter_channels)

        f = jnp.einsum('bmc,bnc->bmn', theta, phi, preferred_element_type=jnp.float32)
        f = jax.nn.softmax(f, axis=-1).astype(g.dtype)
        y = jnp.einsum('bmn,bnc->bmc', f, g).reshape(b, h, w, self.inter_channels)

        wy = nn.Conv(self.in_channels, (1, 1), use_bias=True,
                     kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                     dtype=self.dtype, param_dtype=jnp.float32, name='w')(y)
        return wy + x


class NonlocalCA(nn.Module):
    """Quadrant-split non-local wrapper (ref: SAN_blocks.py:305-336).

    Runs one shared non-local block on each image quadrant — the reference's memory
    workaround for the O((HW)^2) attention, kept for output parity.
    """
    in_feat: int = 64
    inter_feat: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        h1, w1 = h // 2, w // 2
        block = NonLocalBlock2D(self.in_feat, self.inter_feat, dtype=self.dtype,
                                name='non_local')
        lu = block(x[:, :h1, :w1, :])
        ld = block(x[:, h1:, :w1, :])
        ru = block(x[:, :h1, w1:, :])
        rd = block(x[:, h1:, w1:, :])
        top = jnp.concatenate([lu, ru], axis=2)
        bot = jnp.concatenate([ld, rd], axis=2)
        return jnp.concatenate([top, bot], axis=1)


class RB(nn.Module):
    """conv-relu-conv + x residual block (ref: SAN_blocks.py:339-363)."""
    n_feat: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = conv(self.n_feat, self.kernel_size, self.n_feat, dtype=self.dtype,
                 name='conv_0')(x)
        y = nn.relu(y)
        y = conv(self.n_feat, self.kernel_size, self.n_feat, dtype=self.dtype,
                 name='conv_1')(y)
        return y + x


class LSRAG(nn.Module):
    """Local-source residual attention group (ref: SAN_blocks.py:366-411)."""
    n_feat: int
    kernel_size: int = 3
    reduction: int = 8
    n_resblocks: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        for i in range(self.n_resblocks):
            x = RB(self.n_feat, self.kernel_size, dtype=self.dtype, name='rb_%d' % i)(x)
        x = SOCA(self.n_feat, self.reduction, dtype=self.dtype, name='soca')(x)
        x = conv(self.n_feat, self.kernel_size, self.n_feat, dtype=self.dtype,
                 name='conv_last')(x)
        return x + residual


class SAN(nn.Module):
    """(ref: advanced/architectures.py:244-311).  20 LSRAG x 10 RB by default."""
    n_resgroups: int = 20
    n_resblocks: int = 10
    n_feats: int = 64
    reduction: int = 16
    scale: int = 4
    n_colors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata=None):
        n = self.n_feats
        gamma = self.param('gamma', nn.initializers.zeros, (1,), jnp.float32)
        x = conv(n, 3, self.n_colors, dtype=self.dtype, name='head')(x)
        non_local = NonlocalCA(in_feat=n, inter_feat=n // 8, dtype=self.dtype,
                               name='non_local')
        xx = non_local(x)
        residual = xx
        for i in range(self.n_resgroups):
            xx = LSRAG(n, 3, self.reduction, self.n_resblocks, dtype=self.dtype,
                       name='rg_%d' % i)(xx) + gamma.astype(xx.dtype) * residual
        res = non_local(xx)
        res = res + x
        out = Upsampler(self.scale, n, dtype=self.dtype, name='upsampler')(res)
        return conv(self.n_colors, 3, n, dtype=self.dtype, name='tail')(out)


def triuvec(a):
    """Upper-triangular vectorization of (B, D, D) matrices (ref: mpncov.py:114-141;
    defined by the reference's MPN-COV port, unused by SAN's forward — provided for
    completeness)."""
    b, d, _ = a.shape
    rows, cols = jnp.triu_indices(d)
    return a[:, rows, cols]
